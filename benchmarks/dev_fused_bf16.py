"""The unquantized (bf16) megakernel on TPU: does it compile, and how
close does it run to the int8 kernel?

quantize='fused_bf16' doubles the weight / KV-cache / cross-KV bytes the
kernel streams (bf16 vs int8) and swaps the int8 MXU contractions for
bf16 ones. Per the decode roofline (PERF.md) the window kernel is NOT
HBM-bound at B=8 (weights stream once per (token, layer) and revisit
across chunks), so the expected cost is the MXU's bf16-vs-int8 rate on
the tiny attention dots plus the doubled VMEM footprint (which the
raised FUSED_VMEM_LIMIT absorbs).

Each config runs in its OWN process (Mosaic failures can be fatal):
    python benchmarks/dev_fused_bf16.py <case>
with case one of: b8, b64, segmem, b8_int8, b64_int8, segmem_int8,
b128_xla (the exact-numerics XLA body's best batch, the incumbent the
bf16 kernel must beat), and the int4 tier (b8_int4, b64_int4,
segmem_int4 — the decode roofline says the int8 kernel is
HBM-bandwidth-saturated, so halving the streamed bytes is the one
remaining lever). Prints one JSON line; compile failure prints an
error line, exit 0.
"""

import json
import sys

import numpy as np

sys.path.insert(0, '.')


def _measure_vanilla(batch, quantize, reps=6):
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.ops.decode import greedy_decode
    from mr_mt3_tpu.utils.bench_helpers import time_stats, zero_variables

    max_length = 1024
    rng = np.random.default_rng(0)
    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    variables = zero_variables(model)

    def decode(v, m):
        return greedy_decode(model, v, m, max_length, quantize=quantize)

    fn = jax.jit(decode)
    mel = jnp.asarray(rng.normal(size=(batch, 256, 512)).astype(np.float32))
    stats = time_stats(fn, lambda: (variables, mel), reps=reps)
    return {'rtf': round(batch * 256 * 128 / 16000 / stats['median'], 1),
            'ms': round(stats['median'] * 1000, 1),
            'spread': round(stats['spread'], 3)}


def _measure_segmem(quantize, reps=6, batch=8):
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.ops.decode import segmem_greedy_decode
    from mr_mt3_tpu.utils.bench_helpers import time_stats, zero_variables

    n_segments, max_length = 8, 1024
    rng = np.random.default_rng(0)
    cfg = MT3Config(dtype='bfloat16', segmem_variant='encoder_append',
                    segmem_length=64)
    model = MT3(cfg)
    variables = zero_variables(model)

    def decode(v, m):
        return segmem_greedy_decode(model, v, m, max_length,
                                    quantize=quantize)[0]

    fn = jax.jit(decode)
    mel = jnp.asarray(rng.normal(
        size=(batch, n_segments, 256, 512)).astype(np.float32))
    stats = time_stats(fn, lambda: (variables, mel), reps=reps)
    audio = batch * n_segments * 256 * 128 / 16000
    return {'rtf': round(audio / stats['median'], 1),
            'ms': round(stats['median'] * 1000, 1),
            'spread': round(stats['spread'], 3)}


def main(case: str):
    import jax

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    assert jax.default_backend() == 'tpu'

    if case == 'b8':
        out = _measure_vanilla(8, 'fused_bf16')
    elif case == 'b64':
        out = _measure_vanilla(64, 'fused_bf16')
    elif case == 'segmem':
        out = _measure_segmem('fused_bf16')
    elif case == 'b8_int8':
        out = _measure_vanilla(8, 'fused')
    elif case == 'b64_int8':
        out = _measure_vanilla(64, 'fused')
    elif case == 'segmem_int8':
        out = _measure_segmem('fused')
    elif case == 'b8_int4':
        out = _measure_vanilla(8, 'fused_int4')
    elif case == 'b64_int4':
        out = _measure_vanilla(64, 'fused_int4')
    elif case == 'segmem_int4':
        out = _measure_segmem('fused_int4')
    elif case == 'segmem_int4_b32':
        # does the segmem grouping inversion (PERF.md: grouping loses at
        # the chunk-512 shape under int8) still hold with int4's halved
        # VMEM blocks? Bypass the handler cap by calling the decode
        # directly at a grouped batch.
        out = _measure_segmem('fused_int4', batch=32)
    elif case == 'b128_xla':
        out = _measure_vanilla(128, 'none', reps=4)
    else:
        raise SystemExit(f'unknown case {case}')
    print(json.dumps({'case': f'fused_bf16_{case}', **out}), flush=True)


if __name__ == '__main__':
    try:
        main(sys.argv[1])
    except Exception as e:  # compile failures are data, not crashes
        print(json.dumps({'case': f'fused_bf16_{sys.argv[1]}',
                          'error': repr(e)[:300]}), flush=True)
