"""Attention-core microbenchmark (TPU dev tool, round-4 MFU work).

The production train step runs the attention core at three shapes
(B=96, H=6, Dk=64): self-attention at L=256 (8 encoder + 8 decoder
layers), cross-attention 256x320 (8 layers), and the segmem memory
encoder's self-attention at L=1024 (1 layer). This times fwd+bwd of
just the core (projections excluded -- they are clean matmuls) per
variant, so softmax/numerics changes land with a number:

  einsum  -- production path: bf16 scores matmul, fp32 softmax, bf16 pv
  fused   -- ops/train_attention.py single-tile VMEM kernel (custom VJP)
  pet32   -- preferred_element_type=fp32 on the scores matmul (skips
             the separate bf16->fp32 convert before softmax)
  bf16sm  -- softmax entirely in bf16 (numerics-changing; floor probe)
  nosm    -- no softmax at all: matmul-only floor

Output: JSON lines per (shape, variant) with ms and the projected
per-step cost (ms * calls_per_step).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')

B, H, DK = 96, 6, 64
# (lq, lk, causal, calls_per_step)
SHAPES = [(256, 256, False, 8), (256, 256, True, 8),
          (256, 320, False, 8), (1024, 1024, False, 1)]


def core(q, k, v, causal, variant):
    import jax
    import jax.numpy as jnp
    if variant == 'fused':
        from mr_mt3_tpu.ops.train_attention import fused_attention
        return fused_attention(q, k, v, causal)
    if variant == 'pet32':
        scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32)
    else:
        scores = jnp.einsum('bqhd,bkhd->bhqk', q, k)
    if causal:
        lq, lk = q.shape[1], k.shape[1]
        tri = jnp.tril(jnp.ones((lq, lk), dtype=bool))
        scores = scores + jnp.where(tri, 0.0, -1e9).astype(scores.dtype)
    if variant == 'nosm':
        probs = scores.astype(q.dtype)
    elif variant == 'bf16sm':
        probs = jax.nn.softmax(scores, axis=-1)
    else:
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(q.dtype)
    return jnp.einsum('bhqk,bkhd->bqhd', probs, v)


def main(variants):
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for lq, lk, causal, calls in SHAPES:
        q = jnp.asarray(rng.normal(size=(B, lq, H, DK)) * 0.1,
                        jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, lk, H, DK)) * 0.1,
                        jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, lk, H, DK)) * 0.1,
                        jnp.bfloat16)
        # the tunneled platform has a ~25 ms per-dispatch floor; amortize
        # it by enqueueing CHAIN data-dependent async dispatches of the
        # same program and syncing ONCE (the scalar carry both defeats
        # CSE and serializes device execution). grad-of-scan is avoided
        # deliberately -- its server-side compile hangs on this platform.
        CHAIN = 16

        def chained(fn, reps=5):
            np.asarray(fn(q, k, v, jnp.zeros(())))  # compile + exec
            times = []
            for _ in range(reps):
                t0 = time.time()
                acc = jnp.zeros(())
                for _ in range(CHAIN):
                    acc = fn(q, k, v, acc)
                np.asarray(acc)
                times.append((time.time() - t0) / CHAIN)
            return float(np.median(times)), float(
                (max(times) - min(times)) / np.median(times))

        @jax.jit
        def null(q, k, v, acc):
            return acc + q[0, 0, 0, 0].astype(jnp.float32)

        floor_ms, _ = chained(null)

        for variant in variants:
            @jax.jit
            def fwd_bwd(q, k, v, acc, _causal=causal, _variant=variant):
                def loss(args):
                    out = core(*args, _causal, _variant)
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                qi = q + acc.astype(q.dtype) * q.dtype.type(1e-9)
                l, grads = jax.value_and_grad(loss)((qi, k, v))
                return acc + l + grads[0][0, 0, 0, 0].astype(jnp.float32)

            med, spread = chained(fwd_bwd)
            ms = max(med - floor_ms, 0.0) * 1000
            print(json.dumps({
                'shape': f'{lq}x{lk}' + ('_causal' if causal else ''),
                'variant': variant, 'ms': round(ms, 2),
                'ms_per_step': round(ms * calls, 1),
                'spread': round(spread, 3),
            }), flush=True)


if __name__ == '__main__':
    main(sys.argv[1:] or ['einsum', 'fused', 'nosm'])
