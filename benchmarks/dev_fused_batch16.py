"""Probe the megakernel's batch ceiling (dev tool, run on the TPU).

Today FUSED_MAX_BATCH=8: larger workloads run as SEQUENTIAL groups of 8,
freezing fused aggregate throughput at the B=8 number. This measures
whether B=16 with a halved cache CHUNK (to stay under the VMEM stage
budget: weights ~2.8 MB + cross-KV ~0.39 MB/row + chunk ~0.39 MB/row at
CHUNK=256) beats two sequential groups of 8, and how B=16/CHUNK=128
compiles at all. Results go to PERF.md.
"""

import json
import sys

import numpy as np

sys.path.insert(0, '.')


def main():
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.ops import fused_decode
    from mr_mt3_tpu.ops.decode import greedy_decode
    from mr_mt3_tpu.utils.bench_helpers import time_stats, zero_variables

    assert jax.default_backend() == 'tpu', 'TPU-only probe'
    max_length = 1024
    rng = np.random.default_rng(0)
    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    variables = zero_variables(model)

    def measure(batch, chunk, fused_cap, reps=6):
        fused_decode.CHUNK = chunk
        fused_decode.FUSED_MAX_BATCH = fused_cap
        # pin the chunk to the case label: since round 3,
        # chunk_base_for doubles for single-group calls — that batch-
        # aware logic is exactly what this probe must NOT apply, or every
        # case measures a different chunk than it claims
        fused_decode.chunk_base_for = \
            lambda lenc, single_group=False: chunk if lenc <= 256 \
            else chunk // 2

        def decode(v, m):
            if batch > fused_cap:  # sequential groups (handler behavior)
                outs = []
                for s in range(0, batch, fused_cap):
                    outs.append(greedy_decode(model, v, m[s:s + fused_cap],
                                              max_length,
                                              quantize='fused'))
                return jnp.concatenate(outs)
            return greedy_decode(model, v, m, max_length, quantize='fused')

        fn = jax.jit(decode)
        mel = jnp.asarray(rng.normal(size=(batch, 256, 512)
                                     ).astype(np.float32))
        stats = time_stats(fn, lambda: (variables, mel), reps=reps)
        return {
            'rtf': round(batch * 256 * 128 / 16000 / stats['median'], 1),
            'ms': round(stats['median'] * 1000, 1),
            'spread': round(stats['spread'], 3),
        }

    orig_chunk_base_for = fused_decode.chunk_base_for
    cases = [
        ('b8_chunk256_baseline', 8, 256, 8),
        ('b16_sequential_groups_of_8', 16, 256, 8),
        ('b16_chunk128_single_kernel', 16, 128, 16),
        ('b16_chunk256_single_kernel', 16, 256, 16),  # may OOM VMEM
    ]
    for name, batch, chunk, cap in cases:
        try:
            result = measure(batch, chunk, cap)
            print(json.dumps({'case': name, **result}), flush=True)
        except Exception as e:
            print(json.dumps({'case': name,
                              'error': repr(e)[:300]}), flush=True)
    fused_decode.CHUNK = 256
    fused_decode.FUSED_MAX_BATCH = 8
    fused_decode.chunk_base_for = orig_chunk_base_for


if __name__ == '__main__':
    main()
