"""Which previously-uncompilable fused configs does the raised VMEM cap
unlock, and do any beat the landed defaults?

Round-3 context: every "fails to compile" edge in the fused design map
(PERF.md) was measured under Mosaic's DEFAULT 16 MiB scoped-VMEM cap.
`FUSED_VMEM_LIMIT` raises the cap to 64 MiB (v5e has 128 MiB physical),
which re-opens the rejected configs:

    chunk512_groups   B=64 as 8 in-trace groups with the 512-pos chunk
                      (previously single-group-only; groups kept 256)
    window64          B=64 groups with FUSED_WINDOW=64 (previously
                      "fails at every chunk size")
    segmem_chunk256   Lenc=320 with chunk 256 instead of the halved 128
                      (previously failed even single-group)
    b8_window64       single B=8 call, window 64, chunk 512

Each config runs in its OWN process (Mosaic failures can be fatal):
    python benchmarks/dev_fused_vmem_unlock.py <case>
Prints one JSON line; compile failure prints an error line, exit 0.
"""

import json
import sys

import numpy as np

sys.path.insert(0, '.')


def _measure_vanilla(batch, reps=6):
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
        return greedy_decode(model, v, m, max_length, quantize='fused')

    fn = jax.jit(decode)
    mel = jnp.asarray(rng.normal(size=(batch, 256, 512)).astype(np.float32))
    stats = time_stats(fn, lambda: (variables, mel), reps=reps)
    return {'rtf': round(batch * 256 * 128 / 16000 / stats['median'], 1),
            'ms': round(stats['median'] * 1000, 1),
            'spread': round(stats['spread'], 3)}


def _measure_segmem(reps=4, batch=8):
    """Lockstep segmem decode at Lenc=320 (the shape whose chunk the
    default cap forced down to 128)."""
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
                                    quantize='fused')[0]

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
    import mr_mt3_tpu.ops.fused_decode as fd

    assert jax.default_backend() == 'tpu'

    if case == 'chunk512_groups':
        fd.chunk_base_for = lambda lenc, single_group=False: 512
        out = _measure_vanilla(64)
    elif case == 'window64':
        fd.FUSED_WINDOW = 64
        out = _measure_vanilla(64)
    elif case == 'b8_window64':
        fd.FUSED_WINDOW = 64
        out = _measure_vanilla(8)
    elif case == 'segmem_chunk256':
        base = fd.chunk_base_for
        fd.chunk_base_for = (
            lambda lenc, single_group=False:
            256 if lenc > 256 else base(lenc, single_group))
        out = _measure_segmem(reps=10)
    elif case == 'segmem_chunk256_b32':
        # grouped segmem calls (4 groups-of-8) at the bigger chunk: does
        # the unrolled bigger-VMEM kernel compile, and does it still win?
        base = fd.chunk_base_for
        fd.chunk_base_for = (
            lambda lenc, single_group=False:
            256 if lenc > 256 else base(lenc, single_group))
        out = _measure_segmem(reps=6, batch=32)
    elif case == 'segmem_chunk512':
        base = fd.chunk_base_for
        fd.chunk_base_for = (
            lambda lenc, single_group=False:
            512 if lenc > 256 else base(lenc, single_group))
        out = _measure_segmem(reps=10)
    elif case == 'segmem_chunk512_b32':
        base = fd.chunk_base_for
        fd.chunk_base_for = (
            lambda lenc, single_group=False:
            512 if lenc > 256 else base(lenc, single_group))
        out = _measure_segmem(reps=6, batch=32)
    elif case == 'segmem_control':
        out = _measure_segmem(reps=10)
    elif case == 'segmem_control_b32':
        out = _measure_segmem(reps=6, batch=32)
    elif case == 'b8_chunk1024':
        # one whole-decode chunk: zero dead-chunk grid steps but every
        # step attends all 1024 columns from position 0
        fd.chunk_base_for = lambda lenc, single_group=False: 1024
        out = _measure_vanilla(8)
    elif case == 'segmem_chunk1024':
        fd.chunk_base_for = lambda lenc, single_group=False: 1024
        out = _measure_segmem(reps=8)
    elif case == 'segmem_b64':
        # the landed rule (chunk 512 at Lenc>256) at the eval path's
        # 8-group device cap
        out = _measure_segmem(reps=4, batch=64)
    else:
        raise SystemExit(f'unknown case {case}')
    print(json.dumps({'case': f'vmem_unlock_{case}', **out}), flush=True)


if __name__ == '__main__':
    try:
        main(sys.argv[1])
    except Exception as e:  # compile failures are data, not crashes
        print(json.dumps({'case': f'vmem_unlock_{sys.argv[1]}',
                          'error': repr(e)[:300]}), flush=True)
