"""Decode-step timing decomposition on the real TPU.

Answers, with wall timings (host-transfer sync — block_until_ready can
return early on this platform):
  1. ms/step vs batch size (weights amortization)
  2. ms/step vs phase schedule (self-KV traffic)
  3. segmem lockstep decode throughput vs vanilla at equal segments

Usage: python benchmarks/dev_decode_timing.py [case ...]
Cases: batch phases segmem fused all
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.ops.decode import segmem_greedy_decode
    from mr_mt3_tpu.ops.fast_decode import (
        greedy_loop_fast,
        stack_decode_params,
    )

    from mr_mt3_tpu.utils.bench_helpers import zero_variables

    cases = set(sys.argv[1:]) or {'batch', 'phases'}
    if 'all' in cases:
        cases = {'batch', 'phases', 'segmem', 'fused'}

    max_length = 1024
    rng = np.random.default_rng(0)

    def time_fn(fn, *args, reps=3):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])  # compile+first exec
        times = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0])
            times.append(time.time() - t0)
        return min(times)

    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    variables = zero_variables(model)

    if 'batch' in cases:
        print('== batch scaling (phases 256/512, full 1024 steps) ==',
              flush=True)
        for b in (8, 16, 32, 64):
            mel = jnp.asarray(rng.normal(size=(b, 256, 512)),
                              jnp.float32)

            fn = jax.jit(lambda v, m: greedy_loop_fast(
                cfg, stack_decode_params(v['params'], cfg), m, max_length))
            # encoder included; subtract nothing — report both
            t = time_fn(fn, variables, mel)
            ms_step = t / max_length * 1e3
            rtf = b * 2.048 / t
            print(f'B={b:3d}: total {t:.3f}s  {ms_step:.3f} ms/step  '
                  f'{ms_step / b * 1e3:.1f} us/row-step  RTF {rtf:.1f}',
                  flush=True)

    if 'phases' in cases:
        print('== phase schedules (B=8) ==', flush=True)
        mel = jnp.asarray(rng.normal(size=(8, 256, 512)), jnp.float32)
        for phases in ((), (512,), (256, 512),
                       (128, 256, 384, 512, 640, 768, 896)):
            fn = jax.jit(lambda v, m, ph=phases: greedy_loop_fast(
                cfg, stack_decode_params(v['params'], cfg), m, max_length,
                phases=ph))
            t = time_fn(fn, variables, mel)
            print(f'phases={phases}: total {t:.3f}s '
                  f'{t / max_length * 1e3:.3f} ms/step', flush=True)

    if 'fused' in cases and jax.default_backend() != 'tpu':
        print('== fused case skipped: the megakernel runs interpreted '
              'off-TPU ==', flush=True)
        cases.discard('fused')
    if 'fused' in cases:
        print('== whole-decoder megakernel vs bf16 XLA body '
              '(full 1024 steps, encoder included) ==', flush=True)
        from mr_mt3_tpu.ops.decode import greedy_decode
        for b in (1, 8):
            mel = jnp.asarray(rng.normal(size=(b, 256, 512)), jnp.float32)
            for quant in ('none', 'fused'):
                fn = jax.jit(lambda v, m, q=quant: greedy_decode(
                    model, v, m, max_length, quantize=q))
                t = time_fn(fn, variables, mel)
                print(f'B={b} quantize={quant}: total {t:.3f}s  '
                      f'{t / max_length * 1e3:.3f} ms/step  '
                      f'RTF {b * 2.048 / t:.1f}', flush=True)

    if 'segmem' in cases:
        print('== segmem lockstep (with-prev contiguous) ==', flush=True)
        scfg = MT3Config(dtype='bfloat16', segmem_variant='encoder_append',
                         segmem_length=64)
        smodel = MT3(scfg)
        svars = zero_variables(smodel)
        for songs, segs in ((8, 8), (16, 4)):
            mel = jnp.asarray(
                rng.normal(size=(songs, segs, 256, 512)), jnp.float32)
            fn = jax.jit(lambda v, m: segmem_greedy_decode(
                smodel, v, m, max_length))
            t = time_fn(fn, svars, mel)
            total_segments = songs * segs
            rtf = total_segments * 2.048 / t
            print(f'{songs} songs x {segs} segs: total {t:.3f}s  '
                  f'RTF {rtf:.2f}  '
                  f'({t / (segs * max_length) * 1e3:.3f} ms/step at '
                  f'B={songs})', flush=True)


if __name__ == '__main__':
    main()
