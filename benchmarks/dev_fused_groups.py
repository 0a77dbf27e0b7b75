"""How does fused groups-of-8 aggregate throughput scale with batch?

Follow-up to dev_fused_batch16.py: B=16 in ONE kernel does not compile
(VMEM), but two groups-of-8 inside one jit measured BETTER aggregate RTF
than one B=8 call (161 vs 148). This sweeps group counts to find the best
fused eval batch and compares against the bf16 XLA path's best (B=128).
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
    from mr_mt3_tpu.ops.decode import greedy_decode
    from mr_mt3_tpu.utils.bench_helpers import time_stats, zero_variables

    assert jax.default_backend() == 'tpu'
    max_length = 1024
    rng = np.random.default_rng(0)
    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    variables = zero_variables(model)

    def measure(batch, reps=6):
        def decode(v, m):
            outs = []
            for s in range(0, batch, 8):
                outs.append(greedy_decode(model, v, m[s:s + 8],
                                          max_length, quantize='fused'))
            return jnp.concatenate(outs)

        fn = jax.jit(decode)
        mel = jnp.asarray(rng.normal(size=(batch, 256, 512)
                                     ).astype(np.float32))
        stats = time_stats(fn, lambda: (variables, mel), reps=reps)
        print(json.dumps({
            'case': f'fused_groups_b{batch}',
            'rtf': round(batch * 256 * 128 / 16000 / stats['median'], 1),
            'ms': round(stats['median'] * 1000, 1),
            'spread': round(stats['spread'], 3)}), flush=True)

    for batch in (32, 64):
        try:
            measure(batch)
        except Exception as e:
            print(json.dumps({'case': f'fused_groups_b{batch}',
                              'error': repr(e)[:300]}), flush=True)


if __name__ == '__main__':
    main()
