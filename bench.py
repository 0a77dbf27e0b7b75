"""Headline benchmark: Slakh transcription real-time factor on one chip.

Three workloads, all worst-case full-1024-step greedy decodes (trained
models emit EOS far earlier, so real RTF is higher):

  1. headline — the 46M MT3 model decoding through the whole-decoder
     Pallas megakernel at the SERVING DEFAULT tier (quantize='fused_int4':
     int4 weights + int4 KV + 32-token windows, ops/fused_decode.py —
     the kernel is HBM-bandwidth-saturated, so int4's halved bytes are
     the fastest tier; zero token flips on the parity model, probe-ladder
     guarded on real weights) at batch 64 = eight groups-of-8 unrolled in
     one trace. The B=8 latency configuration is reported in extra.
     Falls back to int8 ('fused'), then the bf16 XLA path at batch 128,
     if a kernel fails to compile on the target.
  (extras also record the int8 tier at B=64 — round-over-round
  continuity with the pre-int4 headline — and fused_bf16 at B=8, the
  probe ladder's exact-numerics megakernel tier.)
  2. bf16_b128 — the exact-numerics bf16 XLA path at its best batch; this
     is the PARITY-BEARING path (what eval uses by default), reported
     first-class with its own stats.
  3. segmem_lockstep — the paper's flagship configuration: segmem
     v2-with-prev contiguous decode, 8 songs x 8 segments in lockstep
     through the megakernel (per-song sequential memory chains; the
     reference can only loop one segment at a time — reference:
     models/t5_segmem_v2_with_prev.py:241-294).

All numbers are MEDIANS over `reps` runs with the (max-min)/median spread
recorded, so rounds stay comparable across the shared TPU tunnel's ~15%
run-to-run variance (PERF.md). Two volatility guards on top:
  * any tier whose first sample shows >5% in-run spread is re-measured
    once with double the reps (time_stats_stable);
  * the output self-describes CROSS-DAY volatility: 'band' carries the
    recorded round-over-round headline range (BENCH_r03/r04 int4 medians
    199.2 / 179.7) so a single round's value is read against the tunnel
    swing, not as a point estimate.

Baseline: the reference's PyTorch-CPU decode (full decoder re-run per
token, no KV cache — reference models/t5.py:267-295), measured on this
machine by tools/measure_torch_baseline.py and cached in
benchmarks/baseline_torch_cpu.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os

import numpy as np


def decode_ladder(on_tpu):
    """Quantize-tier fallback ladder for the headline measurement.

    Off-TPU the megakernel tiers would silently run INTERPRETED (hours,
    not minutes) rather than fail, so they only enter the ladder on a
    real TPU backend; the bf16 XLA path is always the last rung.
    Returns (quantize, batch, mode_label) tuples."""
    return ([
        ('fused_int4', 64,
         "megakernel quantize='fused_int4', batch 64 (groups of 8)"),
        ('fused', 64,
         "megakernel quantize='fused' int8, batch 64 (groups of 8)"),
    ] if on_tpu else []) + [('none', 128, 'bf16 XLA, batch 128')]


def main():
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.ops.decode import greedy_decode, segmem_greedy_decode
    from mr_mt3_tpu.utils.bench_helpers import (
        time_stats_stable,
        zero_variables,
    )

    max_length = 1024
    rng = np.random.default_rng(0)

    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    variables = zero_variables(model)

    def rtf_of(stats, audio_seconds):
        return {
            'rtf': round(audio_seconds / stats['median'], 3),
            'rtf_best': round(audio_seconds / stats['min'], 3),
            'spread': round(stats['spread'], 3),
            'reps': stats['reps'],
            'total_reps': stats.get('total_reps', stats['reps']),
        }

    def measure_vanilla(batch, quantize, reps):
        fn = jax.jit(lambda v, m: greedy_decode(model, v, m, max_length,
                                                quantize=quantize))
        mel = jnp.asarray(
            rng.normal(size=(batch, 256, 512)).astype(np.float32))
        stats = time_stats_stable(fn, lambda: (variables, mel), reps=reps)
        return rtf_of(stats, batch * 256 * 128 / 16000)

    # ---- headline: fused megakernel, 8 groups-of-8 in one trace ----
    # ops/_backend.on_tpu is the one place the backend check lives; see
    # decode_ladder for why megakernel tiers are TPU-only.
    from mr_mt3_tpu.ops._backend import on_tpu
    ladder = decode_ladder(on_tpu())
    fused_b8 = None
    int8_b64 = None
    for i, (quant, batch, tier_mode) in enumerate(ladder):
        try:
            headline = measure_vanilla(batch, quant, reps=8)
            mode = tier_mode
            break
        except Exception as err:  # pragma: no cover - target-specific
            if i == len(ladder) - 1:
                raise
            print(f'# {quant} tier unavailable ({err!r}); falling back')
    # diagnostic extras in their own trys: a failure here must not
    # discard an already-successful headline
    if mode.startswith('megakernel'):
        tier = 'fused_int4' if 'int4' in mode else 'fused'
        try:  # the small-batch latency configuration
            fused_b8 = measure_vanilla(8, tier, reps=12)
        except Exception:  # pragma: no cover - target-specific
            pass
        if tier == 'fused_int4':
            try:  # the int8 tier at the headline batch (continuity)
                int8_b64 = measure_vanilla(64, 'fused', reps=6)
            except Exception:  # pragma: no cover - target-specific
                pass

    # ---- first-class: the exact-numerics (parity-bearing) bf16 path ----
    if mode.startswith('bf16'):
        bf16_b128 = headline  # fallback already measured this config
    else:
        try:
            bf16_b128 = measure_vanilla(128, 'none', reps=8)
        except Exception:  # pragma: no cover
            bf16_b128 = None

    # ---- flagship: segmem with-prev contiguous, multi-song lockstep ----
    songs, segs = 8, 8
    scfg = MT3Config(dtype='bfloat16', segmem_variant='encoder_append',
                     segmem_length=64)
    smodel = MT3(scfg)
    svariables = zero_variables(smodel)

    def measure_segmem(quantize, reps=8):
        sfn = jax.jit(lambda v, m: segmem_greedy_decode(
            smodel, v, m, max_length, quantize=quantize))
        mel = jnp.asarray(
            rng.normal(size=(songs, segs, 256, 512)).astype(np.float32))
        stats = time_stats_stable(sfn, lambda: (svariables, mel), reps=reps)
        return rtf_of(stats, songs * segs * 256 * 128 / 16000)

    # Same tier ladder as the headline, but every rung guarded: a segmem
    # failure must not discard the already-measured headline.
    segmem, segmem_mode = None, 'unavailable'
    for quant, _, _ in decode_ladder(on_tpu()):
        try:
            segmem = measure_segmem(quant)
            segmem_mode = 'bf16' if quant == 'none' else quant
            break
        except Exception as err:  # pragma: no cover - target-specific
            print(f'# segmem {quant} tier unavailable ({err!r})')

    # the probe ladder's middle tier (quantize='fused_bf16'): the
    # unquantized megakernel at the serving latency batch — recorded per
    # round so a regression in the exact-numerics fallback is visible
    fused_bf16_b8 = None
    if mode.startswith('megakernel'):
        try:
            fused_bf16_b8 = measure_vanilla(8, 'fused_bf16', reps=6)
        except Exception:  # pragma: no cover
            pass

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 'benchmarks', 'baseline_torch_cpu.json')
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        if baseline.get('rtf'):
            vs_baseline = headline['rtf'] / baseline['rtf']

    print(json.dumps({
        'metric': 'slakh_transcription_rtf_worst_case',
        'value': headline['rtf'],
        'unit': f'audio-sec/sec/chip, median of {headline["reps"]} '
                f'(1024-step greedy decode, {mode})',
        'vs_baseline': round(vs_baseline, 1) if vs_baseline else None,
        # cross-DAY volatility: the shared tunnel swings round-over-round
        # medians ~15% even when in-run spread is <2% (PERF.md); the
        # recorded int4-headline medians from rounds 3-4 bound the band.
        # Read any single round's value against this, not as a point.
        'band': {'headline_prior_rounds': [179.7, 199.2],
                 'source': 'BENCH_r03/BENCH_r04 int4 medians',
                 'tunnel_swing': '~15% day-to-day (PERF.md)'},
        'extra': {
            'headline': headline,
            'fused_b8_latency': fused_b8,
            'fused_int8_b64': int8_b64,
            'fused_bf16_b8': fused_bf16_b8,
            'bf16_exact_b128': bf16_b128,
            'segmem_lockstep': segmem,
            'segmem_lockstep_config': f'{songs} songs x {segs} segments, '
                                      f'with-prev contiguous chains '
                                      f'({segmem_mode})',
        },
    }))


if __name__ == '__main__':
    main()
