"""Headline benchmark: Slakh transcription real-time factor on one chip.

Workload: the flagship 46M MT3 model greedy-decoding 8 audio segments
(16.4 s of 16 kHz audio) for the full 1024 steps with a KV cache —
worst-case decode length (trained models stop at EOS much earlier, so real
RTF is higher). Baseline: the reference's PyTorch-CPU decode (full decoder
re-run per token, no KV cache — reference models/t5.py:267-295), measured
on this machine by tools/measure_torch_baseline.py and cached in
benchmarks/baseline_torch_cpu.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.ops.decode import greedy_decode

    max_length = 1024
    batch = 8
    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    rng = np.random.default_rng(0)
    # zero-init via eval_shape: avoids compiling+running the init program on
    # device (tens of seconds on this platform); zero weights make argmax
    # emit a non-EOS token forever = exact worst-case decode length
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32)))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    fn = jax.jit(lambda v, m: greedy_decode(model, v, m, max_length))
    mel_warm = jnp.asarray(
        rng.normal(size=(batch, 256, 512)).astype(np.float32))
    np.asarray(fn(variables, mel_warm))  # compile (host sync via transfer)

    times = []
    for _ in range(3):
        mel = jnp.asarray(
            rng.normal(size=(batch, 256, 512)).astype(np.float32))
        t0 = time.time()
        np.asarray(fn(variables, mel))
        times.append(time.time() - t0)
    best = min(times)
    audio_sec = batch * 256 * 128 / 16000
    rtf = audio_sec / best

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 'benchmarks', 'baseline_torch_cpu.json')
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        if baseline.get('rtf'):
            vs_baseline = rtf / baseline['rtf']

    print(json.dumps({
        'metric': 'slakh_transcription_rtf_worst_case',
        'value': round(rtf, 3),
        'unit': 'audio-sec/sec/chip (1024-step greedy decode, batch 8)',
        'vs_baseline': round(vs_baseline, 1) if vs_baseline else None,
    }))


if __name__ == '__main__':
    main()
