"""AOT executable serialization for serve startup (VERDICT round-4 #4).

serve.py pays 100-320 s of server-side compile per program shape at
startup (PERF.md startup section); the persistent XLA compilation cache
is documented NOT to cover this platform's server-side stage. This
measures whether `jax.experimental.serialize_executable` — which pickles
the COMPILED executable, unlike `jax.export` which re-compiles StableHLO
at load — can skip it:

  phase 1 (--save): trace+compile a representative decode program, time
    the compile, serialize to disk, run it, record logits hash.
  phase 2 (--load, FRESH process): deserialize_and_load, time
    time-to-first-result, verify the output matches phase 1 bit-exactly.

Run on the TPU:
  python benchmarks/dev_aot_serialize.py --save /tmp/aot.bin
  python benchmarks/dev_aot_serialize.py --load /tmp/aot.bin
"""

import argparse
import json
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def build():
    """A real decode-shaped program: the 46M teacher-forced forward at a
    serving bucket shape (the compile cost class serve.py pays)."""
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.utils.builders import param_shapes

    cfg = MT3Config(dtype='bfloat16')
    model = MT3(cfg)
    # deterministic NON-ZERO params (host-generated; device init costs
    # tens of seconds here): zero weights give all-zero logits, which
    # would make the save/load output-hash comparison vacuous
    rng = np.random.default_rng(0)
    variables = {'params': jax.tree.map(
        lambda s: jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32) * 0.02,
            s.dtype),
        param_shapes(model))}

    def forward(variables, mel, ids):
        return model.apply(variables, mel, decoder_input_ids=ids,
                           deterministic=True)

    mel = jnp.zeros((8, 256, cfg.mel_bins), jnp.float32)
    ids = jnp.zeros((8, 64), jnp.int32)
    return jax.jit(forward), (variables, mel, ids)


def out_hash(out) -> str:
    import hashlib
    return hashlib.sha256(
        np.ascontiguousarray(np.asarray(out, np.float32)).tobytes()
    ).hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--save')
    ap.add_argument('--load')
    args = ap.parse_args()
    import jax
    from jax.experimental import serialize_executable as se

    fn, fargs = build()

    if args.save:
        t0 = time.time()
        lowered = fn.lower(*fargs)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        t0 = time.time()
        payload = se.serialize(compiled)
        blob = pickle.dumps(payload)
        with open(args.save, 'wb') as f:
            f.write(blob)
        t_ser = time.time() - t0
        t0 = time.time()
        out = compiled(*fargs)
        np.asarray(out)
        t_run = time.time() - t0
        print(json.dumps({
            'phase': 'save', 'lower_s': round(t_lower, 1),
            'compile_s': round(t_compile, 1),
            'serialize_s': round(t_ser, 1),
            'blob_mb': round(len(blob) / 1e6, 1),
            'first_run_s': round(t_run, 1),
            'out_hash': out_hash(out)}), flush=True)

    if args.load:
        t0 = time.time()
        with open(args.load, 'rb') as f:
            payload = pickle.loads(f.read())
        compiled = se.deserialize_and_load(*payload)
        t_load = time.time() - t0
        t0 = time.time()
        out = compiled(*fargs)
        np.asarray(out)
        t_run = time.time() - t0
        print(json.dumps({
            'phase': 'load', 'deserialize_s': round(t_load, 1),
            'first_run_s': round(t_run, 1),
            'out_hash': out_hash(out)}), flush=True)


if __name__ == '__main__':
    main()
