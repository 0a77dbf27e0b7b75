"""Decode-time memory-chain ablation for segmem models (VERDICT r3 #3).

Round 3 measured the segmem flagship BELOW vanilla on e2e F1 and waved
at "exposure bias" without evidence. This script pins the mechanism on
a trained checkpoint by decoding the same held-out audio three ways:

  * chained   — production contiguous decode: segment i's memory is
                segment i-1's own (possibly wrong) decoded tokens.
  * ablated   — chain_memory=False: every segment sees the initial seed
                memory (ops/decode.segmem_greedy_decode diagnostic).
  * (the vanilla comparator comes from the paired generalization leg)

Readout:
  * ablated > chained  -> the chain actively propagates decode errors:
    exposure bias is REAL (train feeds ground-truth targets_prev —
    reference models/t5_segmem_v2_with_prev.py:61-116 — decode feeds
    the model's own outputs; the mismatch compounds down the chain).
  * ablated == chained (token-identical) -> the memory contributes
    nothing at decode; the F1 gap vs vanilla must come from elsewhere
    (e.g. the Lenc+64 encoder shape — see dev_lockstep_gap.py).
  * ablated < chained  -> the carried memory genuinely helps; the gap
    story would need revisiting.
The carry MECHANISM itself is pinned separately by cross-implementation
token parity (tests/test_parity_e2e.py::test_withprev_contiguous_tokens
vs a torch oracle that computes its own chain), so this measures the
VALUE of the chain, not its plumbing.

Run after a generalization leg has saved a checkpoint:
  python benchmarks/dev_segmem_ablation.py --workdir /path/to/gen_workdir
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', required=True,
                    help='dev_generalization_e2e.py workdir (expects '
                         '<workdir>/<model>/checkpoints/<ckpt> and '
                         '<workdir>/heldout/)')
    ap.add_argument('--model', default='withprev')
    ap.add_argument('--ckpt', default='best')
    ap.add_argument('--max-length', type=int, default=1024)
    args = ap.parse_args()

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import orbax.checkpoint as ocp

    from mr_mt3_tpu.infer import InferenceHandler
    from mr_mt3_tpu.infer.scores import get_scores
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
    for leg, chain in (('chained', True), ('ablated', False)):
        handler = InferenceHandler(
            model=model, variables={'params': restored['params']},
            max_length=args.max_length, contiguous_inference=True,
            segmem_chain=chain)
        scores = get_scores(
            handler=handler, eval_audio_dir=files, eval_dataset='Slakh',
            exp_tag_name=os.path.join(args.workdir,
                                      f'ablation_{leg}_midis'),
            ground_truth_midi_dir=heldout_root,
            max_length=args.max_length, verbose=False)
        out[f'{leg}_onset_f1'] = round(scores.get('Onset F1', 0.0), 4)
    out['delta_ablated_minus_chained'] = round(
        out['ablated_onset_f1'] - out['chained_onset_f1'], 4)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
