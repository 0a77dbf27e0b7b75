"""Time-to-ready of the serving probe ladder: short vs full-length probes.

prepare_handler's quantize guard decodes a probe batch through each
ladder tier AND an exact twin. Probing at the full serving max_length
(1024) makes every tier pay a full-size program's startup (the dominant
cost on this platform); the short probe (infer/probe.PROBE_MAX_LENGTH)
compiles small programs for the ladder and leaves the one full-length
compile to the winner's prewarm.

Measures, on the real TPU with the 46M model and RANDOM weights (the
worst case: the ladder walks every tier down to 'none'):

  probe ladder seconds + prewarm seconds = time-to-ready

A third arm, `winner`, uses ZERO weights instead: every tier quantizes
zeros exactly, so fused_int4 probes clean at the short length, passes
the full-length confirm (quant + exact twin at max_length=1024 — the
two full-size programs the old all-full-length ladder paid for the
first tier anyway), and is kept. This times the OTHER boundary of the
short-probe design: a checkpoint that wins its first tier, where the
confirm means time-to-ready is ~the pre-short-probe cost rather than
the 1.9x-faster walk.

Run each arm in a FRESH process (program startup is per process):
  python benchmarks/dev_probe_startup.py short [fresh_cache]
  python benchmarks/dev_probe_startup.py full [fresh_cache]
  python benchmarks/dev_probe_startup.py winner [fresh_cache]

`fresh_cache` points the persistent XLA compilation cache at an empty
temp dir — the first-launch scenario the prewarm design targets (the
shared dev cache already holds every full-length 46M program this round
has ever compiled, which would bias the full arm).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else 'short'
    assert arm in ('short', 'full', 'winner')
    fresh = len(sys.argv) > 2 and sys.argv[2] == 'fresh_cache'

    import tempfile

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache(
        tempfile.mkdtemp(prefix='xla_cache_') if fresh else None)
    import mr_mt3_tpu.infer.probe as probe_mod
    from mr_mt3_tpu.infer import InferenceHandler
    from mr_mt3_tpu.models import MT3, MT3Config
    import serve

    if arm == 'full':
        # the pre-round-3 behavior: probe at the serving length
        probe_mod.PROBE_MAX_LENGTH = 1024

    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    # RANDOM weights (host-generated; device init costs ~60 s) so logits
    # are near-uniform and every quantized tier flips -> full ladder walk
    import jax
    import jax.numpy as jnp
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, cfg.mel_bins)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32)))
    rng = np.random.default_rng(0)
    if arm == 'winner':
        # zero weights quantize exactly at every tier -> int4 wins and
        # the full-length confirm fires (see module docstring)
        variables = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    else:
        variables = jax.tree.map(
            lambda s: jnp.asarray(
                (rng.standard_normal(s.shape) * 0.05).astype(s.dtype)),
            shapes)
    handler = InferenceHandler(model=model, variables=variables,
                               batch_size=8, quantize='fused_int4')
    t0 = time.monotonic()
    info = serve.prepare_handler(handler)
    ready = time.monotonic() - t0
    print(f'arm={arm} quantize={info["quantize"]} '
          f'probe={info.get("probe_seconds")}s '
          f'confirm_flips={info.get("confirm_flips")} '
          f'prewarm={info.get("prewarm_seconds")}s '
          f'time_to_ready={ready:.1f}s '
          f'demotions={len(info.get("demotions", []))}')


if __name__ == '__main__':
    main()
