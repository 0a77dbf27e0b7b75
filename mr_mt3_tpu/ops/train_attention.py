"""Fused teacher-forced attention for the TRAINING path (TPU Pallas).

Why not stock flash attention: the streaming/online-softmax design
exists so O(L^2) scores never leave registers at L >= 8k. At MT3's
training lengths (256/320/1024) the whole score matrix fits VMEM, and
the stock `jax.experimental.pallas.ops.tpu.flash_attention` measured
2.2x SLOWER than plain einsum on the production step (332 vs 154 ms,
PERF.md round-4) — its multi-pass backward and small-tile grid overhead
dwarf the win at these shapes. The einsum path's real cost is HBM: the
fp32 (B, H, Lq, Lk) score tensor round-trips HBM in both passes
(measured 10.2 of 13.1 ms at 1024^2, benchmarks/dev_attn_micro.py).

So this kernel is a SINGLE-TILE fused attention: one grid step per
(batch, head) computes the entire (Lq, Lk) score matrix in VMEM (4 MB
fp32 at 1024^2, ~16 MB/core available), does the unscaled-softmax
(T5 convention — the reference scales neither: models/t5.py attention)
on-chip, and writes only the (Lq, D) output. The backward recomputes
scores in-VMEM (flash-style rematerialization — cheaper than storing
P to HBM) and emits dq/dk/dv in the same single pass, no atomics, no
cross-step accumulation.

Numerics: scores and softmax statistics in fp32 (the MXU accumulates
fp32 natively, so this is free); probabilities cast to bf16 for the PV
matmul — exactly the einsum path's contract, so logit-parity tests see
the same numerics class (fp reassociation differences only).

Scope: every FULL-SEQUENCE attention on TPU bf16 — the training and
eval teacher-forced forward, and decode-side full-sequence legs that
reach Attention.attend with no mask (the segmem memory encoder runs at
L=1024 inside decode programs too). Per-step decode attention uses its
own kernels (ops/decode.py, ops/fused_decode.py) and masked prefill
calls stay on einsum. Multi-device jit contexts work: the kernel is
embarrassingly parallel over (batch, head) and declares exactly that
via custom_partitioning (see the GSPMD section below), so data-parallel
training shards b, tensor-parallel attention shards h, and shardy
force-replicates sequence/feature dims if they arrive sharded.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mr_mt3_tpu.ops._backend import on_tpu

_LANE = 128


def _pad_kv(k: jnp.ndarray, v: jnp.ndarray):
    """Pad Lk up to a lane multiple; returns (k, v, real_lk)."""
    lk = k.shape[1]
    pad = (-lk) % _LANE
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return k, v, lk


def _mask_scores(s: jnp.ndarray, causal: bool, kv_valid: int) -> jnp.ndarray:
    """Additive -inf masking computed in-VMEM (never materialized in HBM).
    kv_valid is STATIC (trace-time) — training lengths are fixed shapes.
    s: (bb, Lq, Lk)."""
    lq, lk = s.shape[-2], s.shape[-1]
    # masks built 2D and broadcast over the bb dim: 3D iota/where lowered
    # ~40x slower in Mosaic (1.26 ms of a 1.29 ms causal call, measured)
    col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    if kv_valid < lk:
        s = jnp.where((col < kv_valid)[None], s, -1e30)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        s = jnp.where((col <= row)[None], s, -1e30)
    return s


def _softmax(s: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


# batched matmul helpers over (bb, M, K) x (bb, N, K) etc. — the batch
# dim lowers to a Mosaic loop; batching amortizes grid/DMA overhead at
# the short lengths where 1-per-step grids lose to einsum
def _bmm_nt(a, b):     # (bb, M, K) @ (bb, N, K)^T -> (bb, M, N)
    return jax.lax.dot_general(a, b, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _bmm_nn(a, b):     # (bb, M, K) @ (bb, K, N) -> (bb, M, N)
    return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _bmm_tn(a, b):     # (bb, K, M)^T @ (bb, K, N) -> (bb, M, N)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, causal: bool, kv_valid: int):
    q = q_ref[:, 0]        # (bb, Lq, D)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = _bmm_nt(q, k)
    p = _softmax(_mask_scores(s, causal, kv_valid)).astype(v.dtype)
    o = _bmm_nn(p, v)
    o_ref[:, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, causal: bool, kv_valid: int):
    q = q_ref[:, 0]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    do = do_ref[:, 0]
    # recompute P in-VMEM (cheaper than an HBM round-trip of (Lq, Lk))
    s = _bmm_nt(q, k)
    p = _softmax(_mask_scores(s, causal, kv_valid))
    pb = p.astype(do.dtype)
    dv = _bmm_tn(pb, do)                      # dV = P^T dO
    dp = _bmm_nt(do, v)                       # dP = dO V^T
    # dS = P * (dP - rowsum(dP * P))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = _bmm_nn(dsb, k)
    dk = _bmm_tn(dsb, q)
    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)


def _bh_spec(bb: int, l: int, d: int):
    """A (bb, 1, l, d) block of a (B, H, L, D) array per grid step.

    TPU block shapes must have their last two dims (8, 128)-aligned or
    equal to the array dims — slicing heads out of the model's native
    (B, L, H, D) layout puts H second-to-last with block 1 and fails
    that rule, so the wrappers transpose to (B, H, L, D) around the
    kernel (one cheap HBM pass; XLA usually folds it into the
    neighbouring projection reshape). bb batch rows share a grid step:
    at L=256 a 1-per-step grid is 576 tiny programs whose DMA/grid
    overhead loses to plain einsum (measured, PERF.md round-4); bb=8
    amortizes it while the score block stays ~2 MB."""
    return pl.BlockSpec((bb, 1, l, d), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)


# VMEM ceiling for picking bb: peak live score-sized fp32 buffers in the
# backward are ~3x (s/p, dp, ds) plus bf16 copies -> ~14 bytes per score
# element; keep bb * lq * lk * 14B under ~12 MB of the ~16 MB/core.
_SCORE_BYTES_BUDGET = 12 * 1024 * 1024 // 14


def _pick_block_b(b: int, lq: int, lk: int) -> int:
    bb = max(1, min(8, _SCORE_BYTES_BUDGET // max(lq * lk, 1)))
    while b % bb:
        bb -= 1
    return bb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = False,
                    kv_valid: Optional[int] = None) -> jnp.ndarray:
    """Fused unscaled-softmax attention, differentiable.

    q: (B, Lq, H, D); k/v: (B, Lk, H, D) — Lk is padded internally to a
    128 multiple and masked via kv_valid (defaults to the real Lk).
    Returns (B, Lq, H, D) in q's dtype.
    """
    return _fused_fwd(q, k, v, causal, kv_valid)[0]


def _call_fwd_local(q, k, v, causal: bool, kv_valid: int):
    """q/k/v here are ALREADY (B, H, L, D) — device-local shapes."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    kernel = functools.partial(_fwd_kernel, causal=causal,
                               kv_valid=kv_valid)
    bb = _pick_block_b(b, lq, lk)
    return pl.pallas_call(
        kernel,
        grid=(b // bb, h),
        in_specs=[_bh_spec(bb, lq, d), _bh_spec(bb, lk, d),
                  _bh_spec(bb, lk, d)],
        out_specs=_bh_spec(bb, lq, d),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        interpret=not on_tpu(),
    )(q, k, v)


def _call_bwd_local(q, k, v, do, causal: bool, kv_valid: int):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    kernel = functools.partial(_bwd_kernel, causal=causal,
                               kv_valid=kv_valid)
    bb = _pick_block_b(b, lq, lk)
    return pl.pallas_call(
        kernel,
        grid=(b // bb, h),
        in_specs=[_bh_spec(bb, lq, d), _bh_spec(bb, lk, d),
                  _bh_spec(bb, lk, d), _bh_spec(bb, lq, d)],
        out_specs=[_bh_spec(bb, lq, d), _bh_spec(bb, lk, d),
                   _bh_spec(bb, lk, d)],
        out_shape=[jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, lk, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, lk, d), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        interpret=not on_tpu(),
    )(q, k, v, do)


# ---- GSPMD partitioning -------------------------------------------------
#
# A pallas_call has no SPMD partitioning rule, so under jit over a
# multi-device mesh the kernel would fail to partition. The grid is
# embarrassingly parallel over (batch, head), so custom_partitioning
# declares exactly that: b and h factors propagate (data-parallel
# training shards b; tensor-parallel attention shards h), while the
# l/k/d factors are marked need-replication — shardy inserts the
# all-gathers if an operand arrives sequence- or feature-sharded.
# Each shard then runs the local kernel on its slice.

def _bh_sharding(mesh, spec):
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P
    spec = tuple(spec) + (None,) * (4 - len(tuple(spec)))
    return NamedSharding(mesh, P(spec[0], spec[1], None, None))


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(causal: bool, kv_valid: int):
    from jax.experimental.custom_partitioning import custom_partitioning

    def infer(mesh, arg_shapes, result_shape):
        return _bh_sharding(mesh, arg_shapes[0].sharding.spec)

    def partition(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(mesh, arg_shapes[0].sharding.spec)

        def lower(q, k, v):
            return _call_fwd_local(q, k, v, causal, kv_valid)

        return mesh, lower, sh, (sh, sh, sh)

    cp = custom_partitioning(
        lambda q, k, v: _call_fwd_local(q, k, v, causal, kv_valid))
    cp.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule='b h l d, b h k d, b h k d -> b h l d',
        # factor indices must be listed in order of first appearance
        need_replication_factors=('l', 'd', 'k'))
    return cp


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(causal: bool, kv_valid: int):
    from jax.experimental.custom_partitioning import custom_partitioning

    def infer(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(mesh, arg_shapes[0].sharding.spec)
        return (sh, sh, sh)

    def partition(mesh, arg_shapes, result_shape):
        sh = _bh_sharding(mesh, arg_shapes[0].sharding.spec)

        def lower(q, k, v, do):
            return _call_bwd_local(q, k, v, do, causal, kv_valid)

        return mesh, lower, (sh, sh, sh), (sh, sh, sh, sh)

    cp = custom_partitioning(
        lambda q, k, v, do: _call_bwd_local(q, k, v, do, causal, kv_valid))
    cp.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule=('b h l d, b h k d, b h k d, b h l d '
                       '-> b h l d, b h k d, b h k d'),
        need_replication_factors=('l', 'd', 'k'))
    return cp


def _call_fwd(q, k, v, causal: bool, kv_valid: int):
    return _partitioned_fwd(causal, kv_valid)(q, k, v)


def _fused_fwd(q, k, v, causal: bool, kv_valid: Optional[int]):
    k, v, real_lk = _pad_kv(k, v)
    valid = real_lk if kv_valid is None else kv_valid
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _call_fwd(qt, kt, vt, causal, valid).transpose(0, 2, 1, 3)
    # residuals stay transposed: the backward kernel wants (B, H, L, D)
    return out, (qt, kt, vt, real_lk)


def _fused_bwd(causal: bool, kv_valid: Optional[int], res, do):
    q, k, v, real_lk = res            # (B, H, L, D)
    valid = real_lk if kv_valid is None else kv_valid
    b, h, lq, d = q.shape
    lk = k.shape[2]
    do = do.transpose(0, 2, 1, 3)
    dq, dk, dv = _partitioned_bwd(causal, valid)(q, k, v, do)
    dq = dq.transpose(0, 2, 1, 3)
    dk = dk.transpose(0, 2, 1, 3)
    dv = dv.transpose(0, 2, 1, 3)
    if lk != real_lk:
        dk = dk[:, :real_lk]
        dv = dv[:, :real_lk]
    return dq, dk, dv


fused_attention.defvjp(_fused_fwd, _fused_bwd)
