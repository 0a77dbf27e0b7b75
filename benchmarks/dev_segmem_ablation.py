"""Segment-memory mechanism diagnosis on a trained checkpoint (r4 #1).

Rounds 3-4 measured the segmem flagship BELOW vanilla on held-out F1 and
could not pin why. Round 5 found and fixed the biggest cause in the
training driver (with-prev items never saw a real previous segment —
commit 669aca2); this script pins what remains, by decoding the same
held-out audio under a factorial of memory CONTENT x memory FORMAT and
by probing the teacher-forced loss:

Decode legs (onset F1 each):
  * chained          — production: segment i's memory is segment i-1's
                       decoded tokens INCLUDING the leading start id
                       (reference decode behavior:
                       models/t5_segmem_v2_with_prev.py:241-294).
  * chained_aligned  — same chain, start id dropped so the memory matches
                       training's targets_prev layout exactly (the
                       reference shifts decode memory one position right
                       vs training — models/t5_segmem_v2_with_prev.py:74
                       feeds targets_prev with no start id).
  * ablated          — chain off: every segment sees the initial seed.
  * oracle_train     — memory = GROUND-TRUTH previous-segment tokens in
                       training layout (the exposure-bias upper bound:
                       content perfect, format as trained).
  * oracle_reffmt    — ground-truth content in the reference's decode
                       layout ([start, tok...]) — separates content from
                       format.

Readout matrix:
  * oracle_train >> chained, oracle_reffmt ~= chained
        -> the FORMAT shift is the dominant residual; chained_aligned is
           the deployable fix (serving-side, no retrain).
  * oracle_train ~= oracle_reffmt >> chained
        -> CONTENT (decode errors compounding down the chain) dominates:
           classic exposure bias; train-side mitigation needed.
  * all legs ~= -> the memory contributes nothing at decode.

Teacher-forced loss probes (held-out, deterministic items):
  * loss with real vs empty-seed vs batch-shuffled targets_prev. A
    healthy memory path: real < empty ~= shuffled. real ~= shuffled
    would indicate the memory input is ignored or harmful (the round-4
    1.42-vs-1.12 val-loss gap came from the driver bug: 64 positions of
    constant never-varying memory appended to every encoder output).

Run after a generalization leg has saved a checkpoint:
  python benchmarks/dev_segmem_ablation.py --workdir .genrun_easy
"""

import argparse
import glob
import json
import math
import os
import sys

sys.path.insert(0, '.')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ground_truth_memories(heldout_root, files, max_length, seg_counts):
    """Per-song (S, max_length) ground-truth PREVIOUS-segment tokens.

    Segment s's row holds segment s-1's target tokens in TRAINING layout
    (+3 offset, EOS, pads as 0 — compute_segmem maps -100 to pad anyway);
    row 0 holds the decode seed. Tokenization mirrors the deterministic
    val dataset (is_train=True, ties on, no augmentation). seg_counts is
    the HANDLER's per-song segment count, which can exceed the
    tokenizer's by one (the handler pads a full extra hop on hop-aligned
    audio, matching the reference's _audio_to_frames); rows past the
    tokenized range stay all-pad."""
    from mr_mt3_tpu.data import SlakhDataset, transforms

    ds = SlakhDataset(heldout_root, shuffle=False, is_deterministic=True,
                      is_randomize_tokens=False, num_rows_per_batch=1,
                      event_length=max_length, split_frame_length=2048)
    by_audio = {row['audio_path']: i for i, row in enumerate(ds.df)}
    out = []
    for f, n_segs in zip(files, seg_counts):
        song = ds._load_song(by_audio[f])
        mem = np.zeros((n_segs, max_length), np.int64)
        # segment 0: the tie+EOS decode seed (model space 1134, 1)
        mem[0, 0], mem[0, 1] = 1134, 1
        for s in range(1, n_segs):
            start = (s - 1) * ds.mel_length
            if start >= song.num_frames:
                continue
            window = transforms.FrameWindow(
                start, min(ds.mel_length, song.num_frames - start))
            mem[s] = ds._segment_targets(song, window, rng=None)
        out.append(np.where(mem == -100, 0, mem))
    return out


def run_decode_legs(args, model, params, files, heldout_root):
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.infer import InferenceHandler
    from mr_mt3_tpu.infer.scores import get_scores
    from mr_mt3_tpu.ops.decode import segmem_greedy_decode

    out = {}
    handler_legs = (
        ('chained', dict(segmem_chain=True)),
        ('chained_aligned', dict(segmem_memory_format='train_aligned')),
        ('ablated', dict(segmem_chain=False)),
    )
    for leg, kw in handler_legs:
        handler = InferenceHandler(
            model=model, variables={'params': params},
            max_length=args.max_length, contiguous_inference=True, **kw)
        scores = get_scores(
            handler=handler, eval_audio_dir=files, eval_dataset='Slakh',
            exp_tag_name=os.path.join(args.workdir,
                                      f'ablation_{leg}_midis'),
            ground_truth_midi_dir=heldout_root,
            max_length=args.max_length, verbose=False)
        out[f'{leg}_onset_f1'] = round(scores.get('Onset F1', 0.0), 4)
        print(f'  {leg}: onset F1 {out[f"{leg}_onset_f1"]}', flush=True)

    # ---- oracle legs: handler preprocessing + direct oracle decode ----
    handler = InferenceHandler(model=model, variables={'params': params},
                               max_length=args.max_length,
                               contiguous_inference=True)
    pre = []
    for f in files:
        from mr_mt3_tpu.infer.scores import load_eval_audio
        audio = load_eval_audio(f, 'Slakh')
        segments, seg_times, valid = handler._audio_to_segments(audio)
        pre.append((handler._compute_mel(segments, valid), seg_times))
    seg_counts = {m.shape[0] for m, _ in pre}
    assert len(seg_counts) == 1, \
        f'oracle legs assume equal segment counts, got {seg_counts}'
    gt_mems = ground_truth_memories(heldout_root, files, args.max_length,
                                    [m.shape[0] for m, _ in pre])
    mel = jnp.stack([m for m, _ in pre])          # (B, S, 256, 512)
    max_length = args.max_length

    decode = jax.jit(lambda v, m, o: segmem_greedy_decode(
        model, v, m, max_length, oracle_memory=o))

    for leg, fmt in (('oracle_train', 'train'), ('oracle_reffmt', 'ref')):
        oracle = np.stack(gt_mems)                # (B, S, L) train layout
        if fmt == 'ref':
            # decode layout: leading start id, content shifted right
            shifted = np.zeros_like(oracle)
            shifted[:, :, 1:] = oracle[:, :, :-1]
            # segment 0 keeps the true seed (the chain also seeds
            # unshifted: reference segmem_ids[0]=1134 with no start id)
            shifted[:, 0] = oracle[:, 0]
            oracle = shifted
        tokens = np.asarray(decode({'params': params}, mel,
                                   jnp.asarray(oracle, jnp.int32)))
        midi_dir = os.path.join(args.workdir, f'ablation_{leg}_midis')
        for f, tok, (_, seg_times) in zip(files, tokens, pre):
            codec_tokens = handler._postprocess(tok)
            ns = handler._to_note_sequence(codec_tokens, seg_times)
            song = str(f).split(os.sep)[-2]
            os.makedirs(os.path.join(midi_dir, song), exist_ok=True)
            from mr_mt3_tpu.midi import note_sequence_to_midi_file
            note_sequence_to_midi_file(
                ns, os.path.join(midi_dir, song, 'mix.mid'))
        from mr_mt3_tpu.eval.evaluate import evaluate_main
        scores = evaluate_main(dataset_name='Slakh', test_midi_dir=midi_dir,
                               ground_truth_midi_dir=heldout_root)
        out[f'{leg}_onset_f1'] = round(scores.get('Onset F1', 0.0), 4)
        print(f'  {leg}: onset F1 {out[f"{leg}_onset_f1"]}', flush=True)
    return out


def run_loss_probes(args, model, params, heldout_root):
    """Held-out teacher-forced loss with real / empty / shuffled memory."""
    import jax.numpy as jnp

    from mr_mt3_tpu.data import DataLoader, SlakhDatasetWithPrevSegmem
    from mr_mt3_tpu.data import transforms
    from mr_mt3_tpu.train.trainer import make_eval_step

    ds = SlakhDatasetWithPrevSegmem(
        heldout_root, shuffle=False, is_deterministic=True,
        is_randomize_tokens=False, num_rows_per_batch=1,
        event_length=args.max_length, split_frame_length=2048)
    loader = DataLoader(ds, batch_size=len(ds.df), shuffle=False)
    eval_step = make_eval_step(model)
    empty = transforms.finalize_targets(
        transforms.EMPTY_PREV_TOKENS, ds.codec, args.max_length)

    out = {}
    for variant in ('real', 'empty', 'shuffled'):
        tot_loss, tot_tokens = 0.0, 0
        for batch in loader:
            b = dict(batch)
            if variant == 'empty':
                b['targets_prev'] = np.tile(
                    empty, (b['targets_prev'].shape[0], 1))
            elif variant == 'shuffled':
                b['targets_prev'] = np.roll(b['targets_prev'], 1, axis=0)
            m = eval_step(params, {k: jnp.asarray(v) for k, v in b.items()})
            n = int(m['num_tokens'])
            tot_loss += float(m['loss']) * n
            tot_tokens += n
        out[f'val_loss_{variant}_memory'] = round(tot_loss / tot_tokens, 4)
        print(f'  teacher-forced loss, {variant} memory: '
              f'{out[f"val_loss_{variant}_memory"]}', flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', required=True,
                    help='dev_generalization_e2e.py workdir (expects '
                         '<workdir>/<model>/checkpoints/<ckpt> and '
                         '<workdir>/heldout/)')
    ap.add_argument('--model', default='withprev')
    ap.add_argument('--ckpt', default='best')
    ap.add_argument('--max-length', type=int, default=1024)
    ap.add_argument('--skip-decode', action='store_true')
    ap.add_argument('--skip-loss', action='store_true')
    args = ap.parse_args()

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import orbax.checkpoint as ocp

    from mr_mt3_tpu.models import MT3, MT3Config

    path = os.path.join(os.path.abspath(args.workdir), args.model,
                        'checkpoints', args.ckpt)
    restored = ocp.StandardCheckpointer().restore(path)
    print(f'restored step {int(restored["step"])} from {path}', flush=True)
    cfg = MT3Config(dtype='bfloat16', segmem_variant='encoder_append',
                    segmem_length=64)
    model = MT3(cfg)

    heldout_root = os.path.join(args.workdir, 'heldout')
    files = sorted(glob.glob(os.path.join(heldout_root, '*', 'mix_16k.wav')))
    assert files, f'no held-out songs under {heldout_root}'

    out = {'model': args.model, 'ckpt_step': int(restored['step']),
           'n_songs': len(files)}
    if not args.skip_loss:
        out.update(run_loss_probes(args, model, restored['params'],
                                   heldout_root))
    if not args.skip_decode:
        out.update(run_decode_legs(args, model, restored['params'], files,
                                   heldout_root))
        out['delta_ablated_minus_chained'] = round(
            out['ablated_onset_f1'] - out['chained_onset_f1'], 4)
        out['delta_oracle_minus_chained'] = round(
            out['oracle_train_onset_f1'] - out['chained_onset_f1'], 4)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
