#!/bin/bash
# Evaluation-command catalog (mirrors reference test.sh).

#  ======= evaluate the MT3 baseline (long-run config) ======= #
#  (the reference's FIRST eval command — reference test.sh:4; it points
#  path= at the official checkpoint via Hydra's chdir'd relative path,
#  here the plain repo path)
python test.py \
    --config-name="config_slakh_f1_0.65" \
    model="MT3Net" \
    path="pretrained/mt3.pth" \
    eval.eval_dataset="Slakh" \
    'eval.audio_dir=/data/slakh2100_flac_redux/test/*/mix_16k.wav' \
    eval.midi_dir="/data/slakh2100_flac_redux/test/" \
    eval.exp_tag_name="outputs/slakh_test_baseline" \
    +eval.load_weights_strict=False \
    eval.use_tf_spectral_ops=true

#  ======= evaluate on Slakh test split ======= #
python test.py \
    --config-name="config_slakh_segmem" \
    model="MT3NetSegMemV2WithPrev" \
    model_segmem_length=64 \
    path="runs/MT3NetSegMemV2WithPrev_SlakhPrev/checkpoints/last" \
    eval.eval_dataset="Slakh" \
    'eval.audio_dir=/data/slakh2100_flac_redux/test/*/mix_16k.wav' \
    eval.midi_dir="/data/slakh2100_flac_redux/test/" \
    eval.exp_tag_name="outputs/slakh_test" \
    eval.contiguous_inference=true

#  ======= sanity check: one song ======= #
python test.py \
    --config-name="config_slakh_segmem" \
    path="runs/MT3Net_Slakh/checkpoints/last" \
    eval.eval_dataset="Slakh" \
    'eval.audio_dir=/data/slakh2100_flac_redux/test/*/mix_16k.wav' \
    eval.midi_dir="/data/slakh2100_flac_redux/test/" \
    eval.exp_tag_name="outputs/sanity" \
    eval.eval_first_n_examples=1

#  ======= official MT3 checkpoint (torch .pth import, TF mel, no norm) ======= #
python test.py \
    --config-name="config_slakh_segmem" \
    model="MT3Net" \
    path="pretrained/mt3.pth" \
    eval.eval_dataset="Slakh" \
    'eval.audio_dir=/data/slakh2100_flac_redux/test/*/mix_16k.wav' \
    eval.midi_dir="/data/slakh2100_flac_redux/test/" \
    eval.exp_tag_name="outputs/mt3_official" \
    eval.use_tf_spectral_ops=true

#  ======= NSynth instrument-leakage eval ======= #
python test.py \
    --config-name="config_slakh_segmem" \
    path="runs/MT3Net_Slakh/checkpoints/last" \
    eval.eval_dataset="NSynth" \
    'eval.audio_dir=/data/nsynth-valid/audio/*.wav' \
    eval.midi_dir="/data/nsynth-valid/midi/" \
    eval.exp_tag_name="outputs/nsynth"

#  ======= fast eval through the whole-decoder megakernel ======= #
#  ~3x decode speed on TPU (int8 weights+KV, 32 tokens/launch); zero token
#  flips on the parity model, but quantized — use the default bf16 path for
#  strict reference-parity runs. See PERF.md.
python test.py \
    --config-name="config_slakh_segmem" \
    model="MT3NetSegMemV2WithPrev" \
    path="runs/MT3NetSegMemV2WithPrev_SlakhPrev/checkpoints/last" \
    eval.eval_dataset="Slakh" \
    'eval.audio_dir=/data/slakh2100_flac_redux/test/*/mix_16k.wav' \
    eval.midi_dir="/data/slakh2100_flac_redux/test/" \
    eval.exp_tag_name="outputs/slakh_fused" \
    eval.contiguous_inference=true \
    +eval.quantize=fused
