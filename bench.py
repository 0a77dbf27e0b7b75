"""Headline benchmark: Slakh transcription real-time factor on one chip.

Two workloads, both worst-case full-1024-step greedy decodes (trained
models emit EOS far earlier, so real RTF is higher):

  1. headline — the 46M MT3 model decoding 128 segments (262 s of 16 kHz
     audio) per batch, the best sustainable serving batch;
  2. segmem_lockstep — the paper's flagship configuration: segmem
     v2-with-prev contiguous decode, 16 songs x 8 segments in lockstep
     (per-song sequential memory chains; the reference can only loop one
     segment at a time — reference: models/t5_segmem_v2_with_prev.py:241-294).

Baseline: the reference's PyTorch-CPU decode (full decoder re-run per
token, no KV cache — reference models/t5.py:267-295), measured on this
machine by tools/measure_torch_baseline.py and cached in
benchmarks/baseline_torch_cpu.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.ops.decode import greedy_decode, segmem_greedy_decode
    from mr_mt3_tpu.utils.bench_helpers import time_best, zero_variables

    max_length = 1024
    rng = np.random.default_rng(0)

    # ---- headline: vanilla decode at the best sustainable batch ----
    batch = 128
    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    variables = zero_variables(model)
    fn = jax.jit(lambda v, m: greedy_decode(model, v, m, max_length))

    def make_mel():
        return (variables, jnp.asarray(
            rng.normal(size=(batch, 256, 512)).astype(np.float32)))

    # the shared tunnel adds large run-to-run variance; min over more reps
    # gets closer to the true device time
    best = time_best(fn, make_mel, reps=6)
    audio_sec = batch * 256 * 128 / 16000
    rtf = audio_sec / best

    # ---- flagship: segmem with-prev contiguous, multi-song lockstep ----
    songs, segs = 16, 8
    scfg = MT3Config(dtype='bfloat16', segmem_variant='encoder_append',
                     segmem_length=64)
    smodel = MT3(scfg)
    svariables = zero_variables(smodel)
    sfn = jax.jit(lambda v, m: segmem_greedy_decode(smodel, v, m, max_length))

    def make_seg():
        return (svariables, jnp.asarray(
            rng.normal(size=(songs, segs, 256, 512)).astype(np.float32)))

    sbest = time_best(sfn, make_seg, reps=4)
    seg_audio_sec = songs * segs * 256 * 128 / 16000
    segmem_rtf = seg_audio_sec / sbest

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 'benchmarks', 'baseline_torch_cpu.json')
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        if baseline.get('rtf'):
            vs_baseline = rtf / baseline['rtf']

    print(json.dumps({
        'metric': 'slakh_transcription_rtf_worst_case',
        'value': round(rtf, 3),
        'unit': 'audio-sec/sec/chip (1024-step greedy decode, batch 128)',
        'vs_baseline': round(vs_baseline, 1) if vs_baseline else None,
        'extra': {
            'segmem_lockstep_rtf': round(segmem_rtf, 3),
            'segmem_lockstep_config': '16 songs x 8 segments, '
                                      'with-prev contiguous chains',
            'segmem_vs_vanilla': round(segmem_rtf / rtf, 3),
        },
    }))


if __name__ == '__main__':
    main()
