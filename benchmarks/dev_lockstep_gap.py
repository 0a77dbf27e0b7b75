"""Explain the segmem-lockstep vs vanilla megakernel RTF gap (dev tool).

BENCH r02/r03: vanilla fused B=8 ~148 RTF, segmem lockstep (8 songs x 8
segments, Lenc=320) ~131 RTF = 0.88x. Candidate causes, isolated here:

  A vanilla fused, Lenc=256       — the baseline
  B vanilla fused, Lenc=320       — adds ONLY the longer encoder: +25%
    cross-KV traffic, halved decode window (t_win 16, 2x invocation
    overhead), halved cache chunk (2x grid steps)
  B2 like B but t_win forced 32   — does the window halving matter / fit?
  C segmem lockstep (the real thing) — B->C adds the memory encoder
    (1-layer over 1024-token memories) + the segment-axis scan structure

Prints JSON lines; medians with spread.
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
    from mr_mt3_tpu.ops import fast_decode, fused_decode
    from mr_mt3_tpu.ops.decode import segmem_greedy_decode
    from mr_mt3_tpu.utils.bench_helpers import time_stats, zero_variables

    assert jax.default_backend() == 'tpu'
    max_length = 1024
    rng = np.random.default_rng(0)

    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    variables = zero_variables(model)
    dp = fast_decode.stack_decode_params(variables['params'], cfg,
                                         quantize='fused')

    def measure_enc_len(lenc, label, reps=8, force_win=None):
        if force_win is not None:
            orig = fused_decode.FUSED_WINDOW
            # t_win halving now keys off Lenc > 320 (fast_decode round
            # 3); force by doubling only beyond that threshold
            fused_decode.FUSED_WINDOW = force_win * 2 if lenc > 320 \
                else force_win

        def fn(dp_, enc):
            return fast_decode.greedy_loop_fused(cfg, dp_, enc, max_length)

        jfn = jax.jit(fn)
        enc = jnp.asarray(rng.normal(size=(8, lenc, 512)) * 0.5,
                          jnp.bfloat16)
        try:
            stats = time_stats(jfn, lambda: (dp, enc), reps=reps)
            audio_s = 8 * 256 * 128 / 16000  # audio content is 256 frames
            print(json.dumps({
                'case': label,
                'rtf': round(audio_s / stats['median'], 1),
                'ms': round(stats['median'] * 1000, 1),
                'spread': round(stats['spread'], 3)}), flush=True)
        except Exception as e:
            print(json.dumps({'case': label, 'error': repr(e)[:300]}),
                  flush=True)
        finally:
            if force_win is not None:
                fused_decode.FUSED_WINDOW = orig

    measure_enc_len(256, 'A_vanilla_lenc256')
    # since round 3 the DEFAULT window at Lenc=320 is the full 32
    measure_enc_len(320, 'B_vanilla_lenc320_win32_default')
    measure_enc_len(320, 'B2_vanilla_lenc320_win16', force_win=16)

    scfg = MT3Config(dtype='bfloat16', segmem_variant='encoder_append',
                     segmem_length=64)
    smodel = MT3(scfg)
    svars = zero_variables(smodel)
    sfn = jax.jit(lambda v, m: segmem_greedy_decode(
        smodel, v, m, max_length, quantize='fused'))
    mel = jnp.asarray(rng.normal(size=(8, 8, 256, 512)).astype(np.float32))
    stats = time_stats(sfn, lambda: (svars, mel), reps=6)
    print(json.dumps({
        'case': 'C_segmem_lockstep',
        'rtf': round(8 * 8 * 256 * 128 / 16000 / stats['median'], 1),
        'ms': round(stats['median'] * 1000, 1),
        'spread': round(stats['spread'], 3)}), flush=True)


if __name__ == '__main__':
    main()
