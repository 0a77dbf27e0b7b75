"""Standalone F1 + tier evaluation of a saved generalization checkpoint.

dev_generalization_e2e.py evaluates only AFTER a leg's training loop
finishes inside the same process — but the axon plugin's host-RSS
upload leak (PERF.md "Platform quirks") makes a 12k-step leg's process
mortal, and a second leg started in the same process inherits the
leaked budget. This script re-runs the exact eval block (held-out +
train-subset onset F1 through the product path, then the probe-ladder
tier walk) against <workdir>/<model>/checkpoints/<ckpt> in a FRESH
process, so training legs can be run one-per-process and evaluated
even if their parent died after the last 'best' save.

Run: python benchmarks/eval_checkpoint.py --workdir .genrun_easy \
         [--model vanilla] [--ckpt best] [--no-tier]
Output: the same JSON lines run_model/run_tier print.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, '.')
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', required=True)
    ap.add_argument('--model', default='vanilla')
    ap.add_argument('--ckpt', default='best')
    ap.add_argument('--max-length', type=int, default=1024)
    ap.add_argument('--no-tier', action='store_true')
    ap.add_argument('--train-songs', type=int, default=8)
    ap.add_argument('--config-json', default=None,
                    help='MT3Config field overrides as JSON (smoke '
                         'checkpoints trained at toy dims); also '
                         '--cpu to force the CPU backend')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import orbax.checkpoint as ocp

    from benchmarks.dev_generalization_e2e import run_tier
    from mr_mt3_tpu.infer.scores import get_scores
    from mr_mt3_tpu.models import MT3, MT3Config

    workdir = os.path.abspath(args.workdir)
    kw = {} if args.model == 'vanilla' else dict(
        segmem_variant='encoder_append', segmem_length=64)
    if args.config_json:
        kw.update(json.loads(args.config_json))
    cfg = MT3Config(dtype=kw.pop('dtype', 'bfloat16'), **kw)
    model = MT3(cfg)

    path = os.path.join(workdir, args.model, 'checkpoints', args.ckpt)
    restored = ocp.StandardCheckpointer().restore(path)
    params, step = restored['params'], int(restored['step'])
    print(f'checkpoint: {path} (step {step})', flush=True)

    train_root = os.path.join(workdir, 'train')
    heldout_root = os.path.join(workdir, 'heldout')
    heldout_files = sorted(
        glob.glob(os.path.join(heldout_root, '*', 'mix_16k.wav')))
    train_files = sorted(
        glob.glob(os.path.join(train_root, '*', 'mix_16k.wav')))
    train_files = train_files[:args.train_songs]

    results = {'model': args.model, 'eval_checkpoint_step': step}
    for split, files, gt_root in (
            ('heldout', heldout_files, heldout_root),
            ('train', train_files, train_root)):
        scores = get_scores(
            model=model, variables={'params': params},
            eval_audio_dir=files, eval_dataset='Slakh',
            exp_tag_name=os.path.join(workdir,
                                      f'{args.model}_{split}_midis'),
            ground_truth_midi_dir=gt_root,
            contiguous_inference=cfg.has_segmem,
            max_length=args.max_length, verbose=False)
        results[f'{split}_onset_f1'] = round(scores.get('Onset F1', 0.0), 4)
        results[f'{split}_onset_prog_f1'] = round(
            scores.get('Onset + program F1 (midi_class)',
                       scores.get('Onset + program F1', 0.0)), 4)
    print(json.dumps(results), flush=True)

    if not args.no_tier:
        run_tier(args.model, model, params, heldout_files, heldout_root,
                 workdir, exact_f1=results['heldout_onset_f1'])


if __name__ == '__main__':
    main()
