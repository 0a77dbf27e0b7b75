"""Fused int8-weight matmul kernels for the decode step.

The decode step at small batch is pure HBM traffic; round 1 measured plain
XLA int8 weights as a REGRESSION (0.74 vs 0.53 ms/step) because XLA
materializes the int8->bf16 convert in HBM instead of fusing it into the
dot. These Pallas kernels read the int8 bytes into VMEM and dequantize
in-register, so weight traffic actually halves:

  * int8_matmul      — y = (x @ W_i8) * col_scale, one MXU dot
  * int8_gated_ff    — the full gated-GELU FF block (wi_0, wi_1, wo) in one
                       kernel: three int8 weight reads, zero intermediate
                       HBM round trips

Quantization is symmetric per output column: scale_j = max|W[:, j]| / 127.
Used by the opt-in `quantize='int8'` decode path (ops/fast_decode.py).
bf16 stays the default: the traffic halving is real but per-launch
overhead made int8 measurably SLOWER at batch 8 and neutral at batch 64
(PERF.md negative results), and int8 perturbs logits (token flip rate is
pinned in tests/test_int8_decode.py against the parity-harness weights).
It remains useful where weight HBM footprint matters more than latency.

Reference hot loop this accelerates: the per-token full-decoder re-run at
models/t5.py:267-295.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mr_mt3_tpu.models.mt3 import gelu_new
from mr_mt3_tpu.ops._backend import on_tpu as _on_tpu


def quantize_columns(w: jnp.ndarray, qmax: int = 127,
                     dtype=jnp.int8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, N) float -> ((K, N) int codes in [-qmax, qmax], (1, N) f32
    per-column scales). One symmetric per-column quantizer for every
    integer tier: 127/int8 (default) and 7/int4
    (fused_decode.quantize_columns_int4)."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True),
                        1e-12) / qmax
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(dtype)
    return q, scale


def _pad_rows(x: jnp.ndarray, multiple: int = 16) -> Tuple[jnp.ndarray, int]:
    rows = x.shape[0]
    padded = ((rows + multiple - 1) // multiple) * multiple
    if padded != rows:
        x = jnp.pad(x, ((0, padded - rows), (0, 0)))
    return x, rows


def _matmul_kernel(x_ref, w_ref, s_ref, out_ref):
    w = w_ref[:].astype(jnp.bfloat16)  # dequant in VMEM — int8 HBM traffic
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    out_ref[:] = (acc * s_ref[:]).astype(out_ref.dtype)


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """x (B, K) bf16 @ w_q (K, N) int8 * scale (1, N) -> (B, N) x.dtype."""
    x_p, rows = _pad_rows(x)
    out = pl.pallas_call(
        _matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((x_p.shape[0], w_q.shape[1]),
                                       x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret or not _on_tpu(),
    )(x_p, w_q, scale)
    return out[:rows]


def _gated_ff_kernel(h_ref, w0_ref, w1_ref, wo_ref,
                     s0_ref, s1_ref, so_ref, out_ref):
    h = h_ref[:]
    w0 = w0_ref[:].astype(jnp.bfloat16)
    a = jnp.dot(h, w0, preferred_element_type=jnp.float32) * s0_ref[:]
    w1 = w1_ref[:].astype(jnp.bfloat16)
    b = jnp.dot(h, w1, preferred_element_type=jnp.float32) * s1_ref[:]
    g = (gelu_new(a) * b).astype(jnp.bfloat16)
    wo = wo_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(g, wo, preferred_element_type=jnp.float32) * so_ref[:]
    out_ref[:] = acc.astype(out_ref.dtype)


def int8_gated_ff(h: jnp.ndarray,
                  w0_q: jnp.ndarray, s0: jnp.ndarray,
                  w1_q: jnp.ndarray, s1: jnp.ndarray,
                  wo_q: jnp.ndarray, so: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Gated-GELU FF with int8 weights, fused: h (B, D) -> (B, D).

    out = (gelu(h @ w0 * s0) * (h @ w1 * s1)) @ wo * so
    (matches the bf16 path in fast_decode.decode_step_fast's MLP).
    """
    h_p, rows = _pad_rows(h)
    out = pl.pallas_call(
        _gated_ff_kernel,
        out_shape=jax.ShapeDtypeStruct((h_p.shape[0], wo_q.shape[1]),
                                       h.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret or not _on_tpu(),
    )(h_p, w0_q, w1_q, wo_q, s0, s1, so)
    return out[:rows]
