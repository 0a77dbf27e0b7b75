"""Handler-level A/B for the segmem fused call cap.

The kernel-level sweep (dev_fused_vmem_unlock.py) showed per-call RTF
FALLING with in-trace groups at the chunk-512 segmem shape (B=8 195.2,
B=32 188.6, B=64 167.6) — the opposite of the short-encoder behavior.
This drives the REAL product path (InferenceHandler._decode_segmem_chained,
the one get_scores/test.py/serve.py use) over 32 memory chains and
compares the landed single-group cap against the old 64-row cap.

    python benchmarks/dev_segmem_cap.py <cap_rows>

Prints one JSON line per run.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def main(cap_rows: int):
    import jax
    import mr_mt3_tpu.infer.handler as handler_mod
    from mr_mt3_tpu.infer import InferenceHandler
    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.utils.bench_helpers import zero_variables
    from mr_mt3_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == 'tpu'

    cfg = MT3Config(dtype='bfloat16', segmem_variant='encoder_append',
                    segmem_length=64)
    model = MT3(cfg)
    variables = zero_variables(model)
    handler = InferenceHandler(model=model, variables=variables,
                               batch_size=8, quantize='fused')

    # force the cap under test (the landed rule picks 8 for this model)
    orig = handler._call_sizes

    def sized(n_real, floor, capped):
        def bucket(n):
            return handler_mod._round_up(
                max(floor, handler_mod._pow2_bucket(n)), handler.n_data)
        if not capped:
            return [bucket(n_real)]
        if bucket(n_real) <= cap_rows:
            return [bucket(n_real)]
        sizes = [cap_rows] * (n_real // cap_rows)
        if n_real % cap_rows:
            sizes.append(bucket(n_real % cap_rows))
        return sizes

    handler._call_sizes = sized
    assert orig is not sized

    # 32 songs x 8 segments, batch_size 8 -> 32 chains of 8 segments
    rng = np.random.default_rng(0)
    mels = [rng.normal(size=(8, 256, 512)).astype(np.float32)
            for _ in range(32)]

    handler._decode_segmem_chained(mels[:2])   # warm both bucket shapes
    handler._decode_segmem_chained(mels)
    times = []
    for _ in range(4):
        t0 = time.monotonic()
        out = handler._decode_segmem_chained(mels)
        times.append(time.monotonic() - t0)
    assert len(out) == 32
    med = sorted(times)[len(times) // 2]
    audio = 32 * 8 * 256 * 128 / 16000
    print(json.dumps({
        'case': f'segmem_handler_cap{cap_rows}',
        'rtf': round(audio / med, 1),
        's': round(med, 2),
        'spread': round((max(times) - min(times)) / med, 3)}), flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]))
