"""Probe the group-axis megakernel: weights DMA'd once per (token, layer).

The in-trace groups-of-8 path (PERF.md) re-streams the int8 layer weights
once PER GROUP per token step — ~176 MB of the ~550 MB/step HBM traffic
at B=64. fused_decode_window_grouped puts the groups on a grid axis
between layers and cache chunks so consecutive group steps revisit the
same weight block (Mosaic skips the copy). Roofline ceiling ~1.4x.

Each config runs in its OWN process (Mosaic VMEM failures are fatal):
    python benchmarks/dev_fused_group_axis.py <groups> <t_window> <chunk> \
        [phased]
Prints one JSON line; compile failure = nonzero exit.

`phased` grows the cache chunk-by-chunk like greedy_loop_fused: the DMA
elision for frontier-dead chunks does NOT remove their ~3 us grid-step
overhead, and at G=6 c256 the full-length cache pays 8 x 6 x 4 = 192 grid
steps per token where the production path's phased growth averages 2.5
chunk steps — grid-iteration overhead, not HBM bytes, dominates here.
"""

import json
import sys

import numpy as np

sys.path.insert(0, '.')


def main(n_groups: int, t_window: int, chunk: int, phased: bool = False):
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.ops.fast_decode import stack_decode_params
    from benchmarks.group_axis_kernel import (
        fused_decode_window_grouped,
        init_fused_cache_grouped,
        regroup_cross_kv,
    )
    from mr_mt3_tpu.ops.fused_decode import (
        pack_fused_params,
        precompute_cross_kv_fused,
    )
    from mr_mt3_tpu.utils.bench_helpers import time_stats, zero_variables

    assert jax.default_backend() == 'tpu', 'TPU-only probe'
    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    variables = zero_variables(model)
    params = variables['params']
    dp = stack_decode_params(params, cfg, quantize='fused')
    fp = pack_fused_params(params, cfg)

    batch = n_groups * 8
    max_length = 1024
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(size=(batch, 256, cfg.d_model)
                                 ).astype(np.float32))

    def decode(enc):
        cross = regroup_cross_kv(
            precompute_cross_kv_fused(dp, cfg, enc), n_groups)
        # phased: grow the cache chunk-by-chunk (the production pattern) so
        # early phases run fewer chunk grid steps; unphased: one full-length
        # cache (dead chunks elide DMA but still pay their grid step)
        bounds = ([p for p in range(chunk, max_length, chunk)]
                  + [max_length]) if phased else [max_length]
        cache = init_fused_cache_grouped(cfg, n_groups, bounds[0])
        tokens = jnp.full((batch, max_length + 1), cfg.pad_token_id,
                          jnp.int32)
        tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
        finished = jnp.zeros((batch,), bool)

        def body(state):
            i, tokens, cache, finished = state
            cur = jax.lax.dynamic_slice(tokens, (0, i), (batch, 1))[:, 0]
            toks_w, finished, cache = fused_decode_window_grouped(
                cfg, fp, dp, cur, finished, i, cache, cross,
                t_window=t_window, chunk_base=chunk)
            tokens = jax.lax.dynamic_update_slice(tokens, toks_w, (0, i + 1))
            return i + t_window, tokens, cache, finished

        state = (jnp.int32(0), tokens, cache, finished)
        cache_len = bounds[0]
        for bound in bounds:
            if bound > cache_len:
                delta = bound - cache_len
                i, tokens, cache, finished = state
                cache = jax.tree.map(
                    lambda a: jnp.pad(
                        a, [(0, 0)] * (a.ndim - 1) + [(0, delta)]),
                    cache)
                state = (i, tokens, cache, finished)
                cache_len = bound

            def cond(state, bound=bound):
                i, _, _, finished = state
                return (i < bound) & jnp.logical_not(jnp.all(finished))

            state = jax.lax.while_loop(cond, body, state)
        return state[1]

    fn = jax.jit(decode)
    stats = time_stats(fn, lambda: (enc,), reps=6)
    print(json.dumps({
        'case': (f'group_axis_g{n_groups}_t{t_window}_c{chunk}'
                 + ('_phased' if phased else '')),
        'rtf': round(batch * 256 * 128 / 16000 / stats['median'], 1),
        'ms': round(stats['median'] * 1000, 1),
        'spread': round(stats['spread'], 3)}), flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
         phased='phased' in sys.argv[4:])
