"""d_kv=64 MXU-lane-padding microbench (VERDICT round-4 #5).

MT3's heads are (H=6, d_kv=64): every attention contraction runs at
half the MXU's 128-lane depth, the residual named since round 3 as the
reason train-step MFU plateaus at ~33%. The proposed lever was "pack 2
heads into one 128-lane dim for the attention matmuls". This bench
measures whether any packing can pay, by timing the three layouts a
packing could produce against the production shapes.

Why there is no FREE packing (analytic, the bench quantifies the cost):
with per-head softmax, S_h = Q_h K_h^T must stay separated by head.
  * Packing along the CONTRACTION dim ([Q1|Q2] (L,128) x [K1|K2]
    (L,128)^T) computes Q1K1^T + Q2K2^T — the cross terms are SUMMED
    into the result and cannot be unmixed. Invalid.
  * Packing along the SEQUENCE dim (stack to (2L, 64)) computes a
    (2L, 2L) score block whose off-diagonal halves (Q1K2^T, Q2K1^T)
    are discarded — 2x the FLOPs for the same useful work, i.e. the
    identical 50% utilization, just in bigger tiles. The bench measures
    whether the bigger-tile shape is nevertheless FASTER (fewer Mosaic
    loop iterations / better pipelining) — that is the only version of
    the lever that could win.
  * The PV product has the same structure (V packs along the 64-lane
    output dim only if P becomes block-diagonal = 2x FLOPs).

Legs (bf16 inputs, f32 accumulation, production bb=B*H=48 batch):
  qk_d64       (48,L,64)x(48,L,64)^T   — production QK shape
  qk_d128      (48,L,128)x(48,L,128)^T — 2x the useful depth; if the
                                         time MATCHES qk_d64, the MXU
                                         pads 64->128 and half the
                                         array is idle in production
  qk_pack_seq  (24,2L,64)x(24,2L,64)^T — the sequence-packed variant
  pv_d64       (48,L,L)x(48,L,64)      — production PV shape
  pv_d128      (48,L,L)x(48,L,128)     — full-lane output comparison

Run: python benchmarks/dev_head_packing.py [--l 1024] [--reps 50]
Output: one JSON line per leg {leg, ms, rel_qk_d64}.

Reference hot loop whose shapes these are: the training teacher-forced
attention (reference models/t5.py:595-648), here
mr_mt3_tpu/ops/train_attention.py (B=8 x H=6 merged grid rows).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, reps, chain=1):
    """Wall time per fn application. chain > 1 folds that many
    applications into ONE jitted program (inputs perturbed per step so
    XLA cannot CSE them) — per-dispatch tunnel overhead (~1 ms/call
    here) otherwise swamps sub-ms dots."""
    if chain > 1:
        def chained(*a):
            def body(i, acc):
                scaled = tuple(x * (1.0 + 1e-6 * i) for x in a)
                return acc + jnp.sum(fn(*scaled))
            return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))
        g = jax.jit(chained)
        np.asarray(g(*args))          # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = g(*args)
        np.asarray(out)
        return (time.perf_counter() - t0) / (reps * chain) * 1e3
    g = jax.jit(fn)
    np.asarray(jnp.sum(g(*args)))     # sync (tunnel-safe scalar)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(*args)
    np.asarray(jnp.sum(out))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--l', type=int, default=1024)
    ap.add_argument('--reps', type=int, default=50)
    ap.add_argument('--bh', type=int, default=48,
                    help='merged batch*heads rows (production B=8, H=6)')
    ap.add_argument('--chain', type=int, default=1,
                    help='in-jit applications per dispatch (use ~20 for '
                         'L<=512 where dispatch overhead dominates)')
    args = ap.parse_args()
    L, BH, reps = args.l, args.bh, args.reps

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    bf = jnp.bfloat16

    def nt(a, b):
        return jax.lax.dot_general(a, b, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    def nn(a, b):
        return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    legs = {}
    q64 = jax.random.normal(ks[0], (BH, L, 64), bf)
    k64 = jax.random.normal(ks[1], (BH, L, 64), bf)
    legs['qk_d64'] = (nt, (q64, k64))

    q128 = jax.random.normal(ks[2], (BH, L, 128), bf)
    k128 = jax.random.normal(ks[3], (BH, L, 128), bf)
    legs['qk_d128'] = (nt, (q128, k128))

    qp = q64.reshape(BH // 2, 2 * L, 64)
    kp = k64.reshape(BH // 2, 2 * L, 64)
    legs['qk_pack_seq'] = (nt, (qp, kp))

    p = jax.random.normal(ks[4], (BH, L, L), bf)
    v64 = jax.random.normal(ks[5], (BH, L, 64), bf)
    v128 = jnp.concatenate([v64, v64], axis=-1)
    legs['pv_d64'] = (nn, (p, v64))
    legs['pv_d128'] = (nn, (p, v128))

    base = None
    for name, (fn, a) in legs.items():
        ms = bench(fn, a, reps, chain=args.chain)
        if base is None:
            base = ms
        print(json.dumps({'leg': name, 'ms': round(ms, 4),
                          'rel_qk_d64': round(ms / base, 3)}), flush=True)


if __name__ == '__main__':
    main()
