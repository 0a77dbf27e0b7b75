"""Converged-checkpoint generalization run (TPU; VERDICT round-4 #2/#3).

Round-3's full-scale e2e overfit a 2-song corpus — pipeline health, not
quality. This run answers the two open quality questions on a corpus the
model has NOT memorized (benchmarks/synth_corpus.py; train/held-out
split, multi-instrument additive synthesis, cross-segment sustains):

  1. Which quantize tier does a CONVERGED checkpoint actually keep?
     (The only prior trained checkpoint — overfit, 2 songs — demoted
     int4 -> int8 -> fused_bf16. Overfit margins are atypically small;
     a converged model's logit margins may differ either way.)
  2. Does segmem v2-with-prev beat vanilla when cross-segment sustained
     notes are present and eval is on held-out data? (Round 3 measured
     segmem 0.757 < vanilla 0.875 on the memorized corpus and blamed
     exposure bias — untested. The paper claims segmem helps:
     reference models/t5_segmem_v2_with_prev.py:38-42.)

Run: python benchmarks/dev_generalization_e2e.py [--steps N] [--songs N]
Outputs JSON lines per model {heldout/train F1, tier walk}.
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, '.')

import numpy as np


def build_corpora(tmp: str, n_train: int, n_heldout: int,
                  preset: str = 'standard'):
    from benchmarks.synth_corpus import write_corpus
    train_root = os.path.join(tmp, 'train')
    heldout_root = os.path.join(tmp, 'heldout')
    # reuse a corpus already rendered into this workdir (legs run as
    # separate processes; song count must match)
    if (os.path.isdir(train_root) and
            len(os.listdir(train_root)) == n_train and
            os.path.isdir(heldout_root) and
            len(os.listdir(heldout_root)) == n_heldout):
        print(f'corpora: reusing {n_train}+{n_heldout} songs in {tmp}',
              flush=True)
        return train_root, heldout_root
    t0 = time.time()
    write_corpus(train_root, n_train, seed=100, preset=preset)
    write_corpus(heldout_root, n_heldout, seed=900, preset=preset)
    print(f'corpora: {n_train} train + {n_heldout} heldout songs '
          f'({time.time() - t0:.0f}s)', flush=True)
    from mr_mt3_tpu.scripts.merge_slakh_midi import merge_song_midis
    for root in (train_root, heldout_root):
        for song in sorted(os.listdir(root)):
            merge_song_midis(os.path.join(root, song))
    return train_root, heldout_root


def run_model(name, model, train_root, heldout_root, tmp, max_steps,
              songs_per_batch=96, rows_per_song=1, lr=4e-4,
              min_steps=6000, with_tier=True, split_frames=2048,
              chunk_steps=None, val_steps=500):
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.data import (
        DataLoader,
        SlakhDataset,
        SlakhDatasetWithPrevSegmem,
    )
    from mr_mt3_tpu.parallel import make_mesh
    from mr_mt3_tpu.train.optim import make_optimizer
    from mr_mt3_tpu.train.trainer import (
        CheckpointPolicy,
        Trainer,
        create_train_state,
    )

    cfg = model.cfg
    ds_cls = (SlakhDatasetWithPrevSegmem if cfg.has_segmem
              else SlakhDataset)
    # production shapes: event_length 1024 (bucketing trims per batch).
    # split_frames MUST exceed mel_length (256): the sampling window needs
    # slack for (a) the reference's random-offset augmentation and (b) the
    # with-prev memory segment, which sits one mel_length BEFORE the chunk
    # inside the same window (data/slakh.py::_chunk_with_prev). Rounds 3-4
    # ran this driver with split_frame_length=256 == mel_length — zero
    # slack, so every training item had prev=None and the memory model
    # trained on the constant empty seed, never a real previous segment;
    # chained decode then fed it real token memories it had never seen
    # (heldout F1 0.30 vs vanilla 0.62, genrun_easy_r4.log). 2048 = one
    # whole 8-segment synth song per window (~86% of chunks get a real
    # prev, like the reference's 2000-frame windows on full Slakh songs).
    common = dict(num_rows_per_batch=rows_per_song, event_length=1024,
                  split_frame_length=split_frames)
    train_ds = ds_cls(train_root, shuffle=True, **common)
    val_ds = ds_cls(heldout_root, shuffle=False, is_deterministic=True,
                    is_randomize_tokens=False, **common)
    songs_per_batch = min(songs_per_batch, len(train_ds.df))
    train_loader = DataLoader(train_ds, batch_size=songs_per_batch,
                              shuffle=True, drop_last=True, seed=7)
    val_loader = DataLoader(val_ds, batch_size=songs_per_batch,
                            shuffle=False)

    init_kwargs = {}
    if cfg.has_segmem:
        init_kwargs['targets_prev'] = jnp.zeros((1, 4), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 512)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
                           **init_kwargs)
    # peak LR matters: 1e-3 DIVERGES on non-memorizable data at B=96,
    # and 4e-4 WITHOUT gradient clipping showed the same signature one
    # notch later (train loss fell smoothly to 2.45 by step 1.6k, one
    # gradient spike at ~1.7k threw it to 3.0+ and AdamW never
    # recovered — metrics.jsonl of the 6144-song run). Global-norm
    # clip 1.0 is the fix; reference trains at 2e-4 and never hits it.
    # warmup scales down for short comparison legs (a fixed 1000-step
    # warmup would spend half of a 2000-step budget ramping)
    optimizer = make_optimizer(lr, warmup_steps=min(1000, max_steps // 5),
                               total_steps=max_steps, min_lr=0.02,
                               use_schedule=True, weight_decay=0.0,
                               clip_norm=1.0)
    state = create_train_state(variables['params'], optimizer)
    # epochs here are ~8 steps; per-epoch Orbax 'last' saves would swamp
    # the step time, so checkpointing is manual (one save at the end)
    trainer = Trainer(model, optimizer, out_dir=os.path.join(tmp, name),
                      mesh=make_mesh(data=1, model=1),
                      log_every_n_steps=200,
                      checkpoint_policy=CheckpointPolicy(
                          save_last=False, save_top_k=0))

    steps_per_epoch = len(train_loader)
    num_epochs = max(1, max_steps // steps_per_epoch)
    t0 = time.time()
    # epoch loop with val each ~val_steps steps; manual for early-stop
    val_every = max(1, val_steps // steps_per_epoch)
    history = []
    best = float('inf')
    prior_seconds = 0.0
    start_epoch = 0
    # ---- cross-process resume (the axon plugin leaks host RSS at the
    # batch-upload rate — PERF.md "Platform quirks" — so a 12k-step leg
    # cannot live in one process; chunk_steps bounds a process's step
    # budget and the leg resumes exactly, opt state included, in a
    # fresh one. sys.exit(3) tells the relaunch loop "not done yet".)
    meta_path = os.path.join(tmp, name, 'resume_meta.json')
    resume_dir = os.path.join(tmp, name, 'checkpoints', 'resume')
    if os.path.isdir(resume_dir) and os.path.exists(meta_path):
        state = trainer.restore_state('resume', like_state=state)
        with open(meta_path) as f:
            meta = json.load(f)
        history = meta['history']
        best = meta['best']
        start_epoch = meta['epochs_done']
        prior_seconds = meta.get('train_seconds', 0.0)
        print(f'  [{name}] resumed step {int(state.step)} '
              f'(epoch {start_epoch}, best val {best:.4f})', flush=True)
    steps_at_entry = int(state.step)
    stop_file = os.path.join(tmp, name, 'STOP')
    for epoch in range(start_epoch, num_epochs):
        state = trainer.fit(state, train_loader, val_loader=None,
                            num_epochs=epoch + 1, start_epoch=epoch)
        if (epoch + 1) % val_every == 0 or epoch == num_epochs - 1:
            vl = trainer.validate(state, val_loader)
            history.append(vl)
            marker = ''
            if vl < best:
                best = vl
                # eval the BEST-val checkpoint, not wherever training
                # stopped — a 46M model can overfit this corpus late
                trainer.save_checkpoint(state, 'best',
                                        with_opt_state=False)
                marker = ' *best'
            print(f'  [{name}] epoch {epoch + 1}/{num_epochs} '
                  f'step {int(state.step)} val_loss {vl:.4f} '
                  f'({prior_seconds + time.time() - t0:.0f}s){marker}',
                  flush=True)
            trainer.save_checkpoint(state, 'resume', with_opt_state=True)
            meta = {'history': history, 'best': best,
                    'epochs_done': epoch + 1,
                    'train_seconds': prior_seconds + time.time() - t0}
            with open(meta_path + '.tmp', 'w') as f:
                json.dump(meta, f)
            os.replace(meta_path + '.tmp', meta_path)
            # stop when the last 4 val points show no 1% improvement
            # over the best before them (overfit guard included: a
            # worsening tail also trips this) — but never before
            # min_steps: transcription learning curves improve slowly
            # and early val plateaus are routine (first runs stopped at
            # ~3.5k steps with the model still improving)
            if int(state.step) >= min_steps and \
                    len(history) >= 6 and min(history[-4:]) > 0.99 * min(
                    history[:-4]):
                print(f'  [{name}] val plateau — stopping', flush=True)
                break
            if os.path.exists(stop_file):
                print(f'  [{name}] STOP file — ending training, '
                      'proceeding to eval', flush=True)
                break
            if epoch < num_epochs - 1 and chunk_steps and \
                    int(state.step) - steps_at_entry >= chunk_steps:
                print(f'  [{name}] chunk budget '
                      f'({int(state.step) - steps_at_entry} steps this '
                      'process) — exiting for relaunch', flush=True)
                sys.exit(3)
    train_s = prior_seconds + time.time() - t0
    trainer.save_checkpoint(state, 'final', with_opt_state=False)
    best_params, best_step = trainer.restore_params('best')
    state = state.replace(params=jax.device_put(best_params))
    print(f'  [{name}] eval uses best-val checkpoint (step {best_step}, '
          f'val_loss {best:.4f})', flush=True)

    # ---- held-out + train-subset F1 through the product path ----
    from mr_mt3_tpu.infer.scores import get_scores
    heldout_files = sorted(
        glob.glob(os.path.join(heldout_root, '*', 'mix_16k.wav')))
    train_files = sorted(
        glob.glob(os.path.join(train_root, '*', 'mix_16k.wav')))[:8]
    results = {'model': name, 'train_steps': int(state.step),
               'train_seconds': round(train_s, 1),
               'final_val_loss': round(history[-1], 4),
               'best_val_loss': round(best, 4),
               'eval_checkpoint_step': int(best_step)}
    for split, files, gt_root in (
            ('heldout', heldout_files, heldout_root),
            ('train', train_files, train_root)):
        scores = get_scores(
            model=model, variables={'params': state.params},
            eval_audio_dir=files, eval_dataset='Slakh',
            exp_tag_name=os.path.join(tmp, f'{name}_{split}_midis'),
            ground_truth_midi_dir=gt_root,
            contiguous_inference=cfg.has_segmem,
            max_length=1024, verbose=False)
        results[f'{split}_onset_f1'] = round(scores.get('Onset F1', 0.0), 4)
        results[f'{split}_onset_prog_f1'] = round(
            scores.get('Onset + program F1 (midi_class)',
                       scores.get('Onset + program F1', 0.0)), 4)
    print(json.dumps(results), flush=True)

    if not with_tier:
        return results, None
    tier = run_tier(name, model, state.params, heldout_files,
                    heldout_root, tmp,
                    exact_f1=results['heldout_onset_f1'])
    return results, tier


def run_tier(name, model, params, heldout_files, heldout_root, tmp,
             exact_f1=None):
    """Probe-ladder walk + resolved-tier F1 for a trained checkpoint.

    Split out of run_model so the (compile-heavy) tier evaluation can
    run as its own process against a checkpoint saved by an earlier
    training leg (--tier-only)."""
    from mr_mt3_tpu.infer import InferenceHandler
    from mr_mt3_tpu.infer.probe import resolve_auto_quantize
    from mr_mt3_tpu.infer.scores import get_scores

    def fresh_handler():
        return InferenceHandler(
            model=model, variables={'params': params},
            max_length=1024, quantize='fused_int4',
            contiguous_inference=model.cfg.has_segmem)

    # strict (round-2 'any flip demotes') resolution first, for the
    # policy comparison the margin-aware default is judged against
    strict_handler = fresh_handler()
    pinfo_strict = resolve_auto_quantize(strict_handler, verbose=True,
                                         demote_on='any')
    handler = fresh_handler()
    pinfo = resolve_auto_quantize(handler, verbose=True,
                                  with_margins=True)
    tier_scores = get_scores(
        handler=handler, eval_audio_dir=heldout_files,
        eval_dataset='Slakh',
        exp_tag_name=os.path.join(tmp, f'{name}_tier_midis'),
        ground_truth_midi_dir=heldout_root,
        max_length=1024, verbose=False)
    tier = {'model': name, 'resolved_tier': pinfo['quantize'],
            'strict_resolved_tier': pinfo_strict['quantize'],
            'strict_demotions': pinfo_strict.get('demotions', []),
            'probe_flips': pinfo.get('probe_flips'),
            'probe_material_rows': pinfo.get('probe_material_rows'),
            'probe_benign_rows': pinfo.get('probe_benign_rows'),
            'material_margin': pinfo.get('material_margin'),
            'margin_noise': pinfo.get('margin_noise'),
            'first_flip_margins': pinfo.get('first_flip_margins'),
            'confirm_flips': pinfo.get('confirm_flips'),
            'demotions': pinfo.get('demotions', []),
            'exact_margins': pinfo.get('exact_margins'),
            'tier_heldout_onset_f1': round(
                tier_scores.get('Onset F1', 0.0), 4),
            'exact_heldout_onset_f1': exact_f1}
    print(json.dumps(tier), flush=True)
    return tier


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=12000)
    ap.add_argument('--songs', type=int, default=96)
    ap.add_argument('--heldout', type=int, default=8)
    ap.add_argument('--lr', type=float, default=4e-4)
    ap.add_argument('--min-steps', type=int, default=6000)
    ap.add_argument('--split-frames', type=int, default=2048,
                    help='sampling window in frames; must exceed 256 '
                         'or with-prev training never sees a real '
                         'previous segment (the round-3/4 bug)')
    ap.add_argument('--songs-per-batch', type=int, default=96)
    ap.add_argument('--rows-per-song', type=int, default=1)
    ap.add_argument('--models', nargs='*',
                    default=['vanilla', 'withprev'])
    ap.add_argument('--preset', default='standard',
                    choices=('standard', 'easy'),
                    help='corpus difficulty (synth_corpus.PRESETS)')
    ap.add_argument('--workdir', default=None,
                    help='reuse/create this workdir instead of a fresh '
                         'tempdir (lets legs run as separate processes '
                         'against one corpus)')
    ap.add_argument('--chunk-steps', type=int, default=None,
                    help='max optimizer steps per PROCESS; on reaching '
                         'it the leg saves a full resume checkpoint and '
                         'exits with code 3 (relaunch the same command '
                         'to continue) — works around the dev '
                         'platform\'s host-RSS upload leak on long runs')
    ap.add_argument('--no-tier', action='store_true',
                    help='skip the probe-ladder tier walk (run it later '
                         'with --tier-only against the saved checkpoint)')
    ap.add_argument('--tier-only', action='store_true',
                    help='no training: load <workdir>/<model>/checkpoints/'
                         'best and run just the tier walk + tier F1')
    args = ap.parse_args()

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from mr_mt3_tpu.models import MT3, MT3Config

    if args.workdir:
        tmp = args.workdir
        os.makedirs(tmp, exist_ok=True)
    else:
        tmp = tempfile.mkdtemp(prefix='gen_e2e_')
    print('workdir:', tmp, flush=True)
    train_root, heldout_root = build_corpora(
        tmp, args.songs, args.heldout, preset=args.preset)

    for name in args.models:
        if name == 'vanilla':
            cfg = MT3Config(dtype='bfloat16')
        else:
            cfg = MT3Config(dtype='bfloat16',
                            segmem_variant='encoder_append',
                            segmem_length=64)
        if args.tier_only:
            import orbax.checkpoint as ocp
            path = os.path.join(os.path.abspath(tmp), name,
                                'checkpoints', 'best')
            restored = ocp.StandardCheckpointer().restore(path)
            print(f'[{name}] tier-only: restored step '
                  f'{int(restored["step"])} from {path}', flush=True)
            heldout_files = sorted(
                glob.glob(os.path.join(heldout_root, '*', 'mix_16k.wav')))
            run_tier(name, MT3(cfg), restored['params'], heldout_files,
                     heldout_root, tmp)
            continue
        # one leg's failure (the dev tunnel throws transient
        # remote_compile errors) must not take down the legs after it
        try:
            run_model(name, MT3(cfg), train_root, heldout_root, tmp,
                      max_steps=args.steps, lr=args.lr,
                      min_steps=args.min_steps,
                      with_tier=not args.no_tier,
                      split_frames=args.split_frames,
                      songs_per_batch=args.songs_per_batch,
                      rows_per_song=args.rows_per_song,
                      chunk_steps=args.chunk_steps)
        except Exception:
            import traceback
            traceback.print_exc()
            print(json.dumps({'model': name, 'error': 'leg crashed'}),
                  flush=True)


if __name__ == '__main__':
    main()
