"""Train-step MFU benchmark (run on the TPU; dev tool, not CI).

Round-4 MFU work: the round-3 roofline left the production step at
~60 TFLOP/s (96 x 98 GFLOP / 156 ms ~= 31% of v5e bf16 peak with the
hardware RNG; 23% before it). The named residuals are the fp32
softmax sections, unfused attention (materialized (B,H,T,T) scores),
and d_kv=64 padding the 128-lane MXU. This measures the production
step (rbg dropout keys, in-step mel, bucketed 256-token targets,
donation) with attention variants so each change lands with a number:

    python benchmarks/dev_train_mfu.py [attn_variant ...]

attn_variant in {'einsum', 'fused'}; default runs both. The stock
streaming flash kernel and its length-gated hybrid both measured SLOWER
than einsum here (332/202 vs 154 ms) -- recorded in PERF.md; 'fused' is
the single-tile VMEM kernel (ops/train_attention.py). JSON lines output.
"""

import json
import sys

import numpy as np

sys.path.insert(0, '.')

FWD_GFLOP_PER_SEG = 32.7     # PERF.md round-3 FLOP budget (T_dec=256)
TRAIN_GFLOP_PER_SEG = 98.0   # fwd + bwd
V5E_BF16_PEAK_TFLOPS = 197.0


def main(variants):
    import jax
    import jax.numpy as jnp
    import optax

    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.train.trainer import TrainState, make_train_step
    from mr_mt3_tpu.utils.bench_helpers import time_stats, zero_variables
    from mr_mt3_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    b, t_dec = 96, 256
    targets = np.concatenate([
        rng.integers(3, 1391, (b, t_dec - 1)),
        np.ones((b, 1), np.int64)], axis=1)
    batch = {
        'audio': (rng.normal(size=(b, 256 * 128)) * 0.1).astype(np.float32),
        'valid_frames': np.full((b,), 256, np.int32),
        'targets': targets,
        'targets_prev': np.concatenate(
            [targets, np.full((b, 1024 - t_dec), -100)], axis=1),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.key(0, impl='rbg')   # production trainer default

    for variant in variants:
        cfg = MT3Config(dtype='bfloat16', segmem_variant='encoder_append',
                        segmem_length=64, attention_kernel=variant)
        model = MT3(cfg)
        optimizer = optax.adamw(1e-4)
        variables = zero_variables(model)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables['params'],
                           opt_state=optimizer.init(variables['params']))
        fn = make_train_step(model, optimizer)

        def call():
            nonlocal state
            state, metrics = fn(state, jb, key)
            return metrics

        stats = time_stats(lambda: call(), lambda: (), reps=8)
        ms = stats['median'] * 1000
        tflops = b * TRAIN_GFLOP_PER_SEG / stats['median'] / 1000
        print(json.dumps({
            'variant': variant, 'batch': b, 't_dec': t_dec,
            'ms_median': round(ms, 1),
            'ms_min': round(stats['min'] * 1000, 1),
            'spread': round(stats['spread'], 3),
            'seg_per_s': round(b / stats['median'], 1),
            'tflops': round(tflops, 1),
            'mfu_pct': round(100 * tflops / V5E_BF16_PEAK_TFLOPS, 1),
        }), flush=True)


if __name__ == '__main__':
    main(sys.argv[1:] or ['einsum', 'fused'])
