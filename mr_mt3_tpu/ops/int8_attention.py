"""Int8-KV decode attention kernel.

At large decode batches the KV cache dominates HBM traffic (B=128:
~1.3 GB/step of ~1.5 GB total — PERF.md roofline), so halving KV bytes is
the biggest remaining throughput lever. Plain XLA int8 hits the same trap
as int8 weights (the int8->bf16 convert materializes in HBM); this Pallas
kernel reads the int8 cache into VMEM and dequantizes in-register.

MEASURED NEGATIVE RESULT (see PERF.md): both a VPU dequant design
(7.86 ms/step at B=128) and this end-to-end int8 MXU design (7.34 ms/step
vs 1.75 bf16) lose — per-grid-block pipeline overhead dominates at these
tiny per-row working sets, and the bf16 XLA path is already at ~94% of
HBM roofline. Kept opt-in for memory-constrained serving. The math here
keeps int8 on the MXU end to end:

  * q is quantized per (batch, head) in-kernel;
  * scores = int8 q x int8 K on the MXU with int32 accumulation, exactly
    rescaled afterward by (q_scale x per-position k_scale) — only K-sized
    elementwise work;
  * the softmax probabilities are folded with the per-position V scales
    and re-quantized to int8 (the one lossy step beyond KV quantization),
    so the value contraction is again an int8 MXU dot.

Quantization is symmetric per (batch, head, position): each appended K/V
row gets its own scale, written alongside the int8 cache in the decode
carry. Used by the opt-in `quantize='int8_kv'` decode mode
(ops/fast_decode.py); bf16 stays the default because quantized KV
perturbs logits (flip rate pinned in tests/test_int8_decode.py).

Reference hot loop this accelerates: the per-token full-decoder re-run at
models/t5.py:267-295.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mr_mt3_tpu.ops._backend import on_tpu as _on_tpu


def quantize_kv_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., dk, K) float -> ((..., dk, K) int8, (..., 1, K) f32 scales).

    One scale per position (the trailing K axis), shared across dk."""
    x = jnp.asarray(x, jnp.float32)
    scale = jnp.max(jnp.abs(x), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _attention_kernel(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                      out_ref):
    # block = one batch row: q (H, dk); k/v (H, dk, K) int8; scales (H,1,K)
    position = pos_ref[0]
    q = q_ref[0].astype(jnp.float32)[:, None, :]          # (H, 1, dk)
    q_scale = jnp.maximum(jnp.max(jnp.abs(q), axis=-1, keepdims=True),
                          1e-12) / 127.0                  # (H, 1, 1)
    q_i8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
    scores_i32 = jax.lax.dot_general(                     # MXU int8 dot
        q_i8, k_ref[0], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                 # (H, 1, K)
    # exact rescale: per-head q scale x per-position k scale
    scores = scores_i32.astype(jnp.float32) * q_scale * ks_ref[0]
    kk = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    scores = jnp.where(kk <= position, scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)               # (H, 1, K)
    # fold per-position v scales into the probabilities, then quantize so
    # the value contraction is another int8 MXU dot (the one lossy step)
    pv = probs * vs_ref[0]
    p_scale = jnp.maximum(jnp.max(jnp.abs(pv), axis=-1, keepdims=True),
                          1e-20) / 127.0                  # (H, 1, 1)
    p_i8 = jnp.clip(jnp.round(pv / p_scale), -127, 127).astype(jnp.int8)
    out_i32 = jax.lax.dot_general(
        p_i8, v_ref[0], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                 # (H, 1, dk)
    out = (out_i32.astype(jnp.float32) * p_scale)[:, 0, :]  # (H, dk)
    out_ref[0] = out.astype(out_ref.dtype)


def int8_decode_attention(q: jnp.ndarray,
                          k_q: jnp.ndarray, k_scale: jnp.ndarray,
                          v_q: jnp.ndarray, v_scale: jnp.ndarray,
                          position: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Single-query attention over an int8 KV cache.

    q: (B, H, dk) bf16/f32 — the current step's queries.
    k_q/v_q: (B, H, dk, K) int8; k_scale/v_scale: (B, H, 1, K) f32.
    position: scalar int32 — only cache slots <= position participate.
    Returns (B, H * dk) in q.dtype.
    """
    b, h, dk = q.shape
    k_len = k_q.shape[-1]
    pos = jnp.asarray(position, jnp.int32).reshape(1)
    out = pl.pallas_call(
        _attention_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, dk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dk, k_len), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 1, k_len), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dk, k_len), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 1, k_len), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (B, H, dk) output with one (1, H, dk) block per grid step — TPU
        # block dims must divide (8, 128) OR equal the array dims, and
        # (H, dk) equals the array tail; in-kernel reshapes to (H*dk,)
        # fail Mosaic layout inference, so flattening happens outside
        out_specs=pl.BlockSpec((1, h, dk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, dk), q.dtype),
        interpret=interpret or not _on_tpu(),
    )(pos, q, k_q, k_scale, v_q, v_scale)
    return out.reshape(b, h * dk)
