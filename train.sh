#!/bin/bash
# Launch-command catalog (mirrors reference train.sh).
# Paths assume Slakh2100-redux prepared with:
#   python -m mr_mt3_tpu.scripts.resample_slakh /data/slakh2100_flac_redux
#   python -m mr_mt3_tpu.scripts.generate_inst_names /data/slakh2100_flac_redux/{train,validation,test}
#   python -m mr_mt3_tpu.scripts.merge_slakh_midi /data/slakh2100_flac_redux/test

#  ======= train MT3 baseline, long-run config ======= #
#  (the reference's FIRST launch command — reference train.sh:5)
python train.py \
    --config-name="config_slakh_f1_0.65" \
    model="MT3Net" \
    dataset="Slakh"

#  ======= train MT3 baseline ======= #
python train.py \
    model="MT3Net" \
    dataset="Slakh" \
    split_frame_length=2000 \
    num_epochs=400

#  ======= train segmem with prev_frame and context = N  ======= #
#  For each segment, the previous segment's tokens are re-encoded as memory,
#  truncated at length `model_segmem_length` and attended via cross-attention.
python train.py \
    --config-name="config_slakh_segmem" \
    model="MT3NetSegMemV2WithPrev" \
    dataset="SlakhPrev" \
    split_frame_length=2000 \
    model_segmem_length=64 \
    num_epochs=800

#  ======= train segmem with prev_frame, prev_augment, context = N  ======= #
#  The memory segment is drawn 1..prev_augment_frames segments back.
python train.py \
    --config-name="config_slakh_segmem" \
    model="MT3NetSegMemV2WithPrev" \
    dataset="SlakhPrevAugment" \
    split_frame_length=2000 \
    model_segmem_length=64 \
    dataset_prev_augment_frames=8 \
    num_epochs=800

#  ======= continual finetune from the official MT3 checkpoint ======= #
#  (same overrides as the reference's launch: train.sh:64-84 — the base
#  config deliberately mirrors the reference's, so the experiment values
#  ride the CLI exactly like upstream)
python train.py \
    --config-name="config_slakh_segmem_finetune" \
    model="MT3NetSegMemV2WithPrevFineTune" \
    dataset="SlakhPrevAugment" \
    dataset_use_tf_spectral_ops=True \
    dataset_is_randomize_tokens=True \
    split_frame_length=2000 \
    model_segmem_length=64 \
    dataset_prev_augment_frames=3 \
    trainer.check_val_every_n_epoch=20 \
    optim.lr=1e-5 \
    num_epochs=100 \
    path="pretrained/mt3.pth" \
    eval.eval_after_num_epoch=400 \
    eval.eval_first_n_examples=3 \
    eval.eval_per_epoch=10 \
    eval.contiguous_inference=True
