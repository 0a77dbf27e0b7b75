"""Whole-decoder Pallas megakernel for the greedy decode step.

PERF.md's roofline analysis left exactly one decode lever on the table:
the bf16 XLA while-loop body at small batch spends ~60% of its time on
small-op overhead and imperfect overlap (327 us/step measured at B=8 vs
~132 us of mandatory HBM traffic), and every multi-launch int8 design
lost to per-launch overhead (2 kernels/layer x 8 layers x B grid blocks
= thousands of ~3 us pipeline iterations). The fix has to amortize ALL
weight + KV reads into one launch: this kernel runs the entire
8-layer decoder step — self-attention over the int8 KV cache (flash
accumulation over 256-position chunks), cross-attention over the int8
encoder KV, and the gated-GELU FF with int8 weights — in a single
pallas_call with grid (layers, cache_chunks). That is ~16-32 pipeline
iterations per step instead of thousands, and int8 storage halves the
bytes so a double-buffered stage (one layer's weights + cross-KV + one
cache chunk ~= 6 MB) fits in the 16 MB of VMEM, which bf16 cannot
(~15 MB/stage before the cache).

The kernel is HEAD-FUSED: all H=6 heads attend in single dots with the
(head, batch) axes merged into one 48-row batch dim. That matters as
much as the fusion itself — a per-head Python loop measured 0.346
ms/step at B=8 (SLOWER than the 0.323 XLA body) because it issues
~3,000 tiny serial vector ops per step. Mosaic constraints found by
probing the real TPU shape this layout (all verified on v5e):

  * minor-dim reshapes ((B, H*dk) <-> (B, H, dk)) do NOT compile, but
    64-lane static slices/writes and lane-axis concatenate DO — so the
    (B, 3*inner) qkv dot output is scattered into (H*B, dk) scratch by
    per-head lane-slice + sublane-block writes, and attention outputs
    reassemble to (B, inner) with a lane concat;
  * leading-dim merges ((H, B, dk, K) -> (H*B, dk, K)) compile for f32
    and int8, so caches store (L, H, B, dk, P) and merge in-kernel;
  * dot_general supports ONE batch dim — (HB, 1, dk) x (HB, dk, K) is
    the proven int8 attention shape; 3D-rhs free dims, two contracting
    dims, and two batch dims all fail to compile;
  * int8 vectors cannot be shape-cast — expand dims on the f32 array
    BEFORE quantizing.

The hidden state x lives in VMEM scratch across all grid steps; the
kernel emits per-layer K/V rows pre-quantized, which XLA scatters into
the cache (tiny dynamic_update_slices — same count as the bf16 path).

The product path is the WINDOW kernel (grid (tokens, layers, chunks)):
a pallas_call inside a compiled loop costs ~100 us per invocation on
this platform regardless of body size, so FUSED_WINDOW=32 greedy steps
run per invocation, with the serial token dependency resolved in-kernel
(one-hot embed matmul -> layers -> lm_head -> argmax feed the next grid
step through VMEM scratch; the window's own K/V rows stay on-chip in
bf16 scratch so the HBM cache is only read for rows decoded before the
window). The per-step kernel remains for tests and as the reference
implementation of the shared layer math (_layer_ops keeps the two
identical by construction).

Numerics match ops/int8_attention.py's end-to-end int8 math: q rows and
the (v-scale-folded) softmax probabilities are quantized per row so both
attention contractions run as int8 MXU dots with exact rescaling.
In-window rows attend at bf16 (slightly MORE precise than the int8
cache rows the per-step kernel reads), so window-vs-per-step tokens
agree on confident models but may argmax apart on near-uniform logits.
Weights are per-output-column int8 as in ops/int8_matmul.py. Token flip
rate vs the bf16 path is pinned in tests/test_fused_decode.py.

Opt-in via quantize='fused' (ops/decode.greedy_decode / the
InferenceHandler). Reference hot loop this accelerates: the per-token
full-decoder re-run at models/t5.py:267-295.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mr_mt3_tpu.models.config import MT3Config
from mr_mt3_tpu.models.mt3 import gelu_new
from mr_mt3_tpu.ops._backend import on_tpu as _on_tpu
from mr_mt3_tpu.ops.int8_matmul import quantize_columns

# self-KV cache chunk streamed per grid step; 256 keeps a double-buffered
# stage (weights + cross-KV + chunk) near 6 MB of VMEM at B=8
CHUNK = 256

# Mosaic's scoped-VMEM cap for the megakernels. XLA's default is 16 MiB —
# a conservative reservation, NOT the hardware limit (v5e has 128 MiB of
# physical VMEM) — and the grouped kernel's phased 512-position program
# missed it by 1%. Raising the cap per-kernel via CompilerParams lets
# configs the default rejects (phased group-axis, chunk-512 groups)
# compile; XLA still keeps its own program buffers outside this scope.
FUSED_VMEM_LIMIT = 64 * 1024 * 1024

# device-batch cap for ONE kernel: the per-stage VMEM budget (one
# layer's weights + cross-KV + a cache chunk, double-buffered) fills at 8
# rows — B=16 fails to compile at CHUNK 256 AND 128 (cross-KV scales
# with B and cannot be chunked away). Larger batches run as groups-of-8
# unrolled inside one trace (fast_decode.greedy_loop_fused), which
# measured BETTER aggregate RTF than B=8: 148 -> 186 audio-sec/s at B=64.
FUSED_MAX_BATCH = 8

# attention contraction lowering: 'mxu' quantizes q/probs per row and runs
# (HB)-batched int8 MXU dots (ops/int8_attention.py math); 'vpu' dequantizes
# K/V in-register and multiply-reduces on the VPU (exact, no q/prob
# quantization). Early (round-2) per-step kernels measured them within
# tunnel noise; after the window kernel + 512-chunk work shrank the other
# overheads, the difference is decisive: mxu 163/187 RTF vs vpu 121/122
# at B=8/B=64 (round 3) — the VPU multiply-reduce is now the bottleneck
# it was hiding behind.
ATTN_IMPL = 'mxu'


class FusedParams(NamedTuple):
    """Decoder weights quantized per output column for the megakernel.

    Projections keep their natural (in, out) layout — the kernel slices
    per-head columns at dk-lane granularity."""
    wqkv: jnp.ndarray     # (L, D, 3*inner) int8 — q | k | v concat
    sqkv: jnp.ndarray     # (L, 1, 3*inner) f32
    wo: jnp.ndarray       # (L, inner, D) int8
    so: jnp.ndarray       # (L, 1, D) f32
    wqc: jnp.ndarray      # (L, D, inner) int8 — cross-attention q
    sqc: jnp.ndarray      # (L, 1, inner) f32
    woc: jnp.ndarray      # (L, inner, D) int8
    soc: jnp.ndarray      # (L, 1, D) f32
    wff_in: jnp.ndarray   # (L, D, 2F) int8 — wi_0 | wi_1 concat
    sff_in: jnp.ndarray   # (L, 1, 2F) f32
    wff_out: jnp.ndarray  # (L, F, D) int8
    sff_out: jnp.ndarray  # (L, 1, D) f32
    norms: jnp.ndarray    # (L, 3, D) f32 — self, cross, ff RMS weights
    final_norm: jnp.ndarray  # (1, D) f32
    lm_q: jnp.ndarray     # (D, vocab) int8
    lm_s: jnp.ndarray     # (1, vocab) f32


def quantize_columns_int4(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-column int4 quantization (codes in [-7, 7]).

    ops/int8_matmul.quantize_columns at qmax 7; HALVES the weight bytes
    the HBM-bandwidth-saturated megakernel streams (PERF.md decode
    roofline) at ~18x the int8 rounding error."""
    return quantize_columns(w, qmax=7, dtype=jnp.int4)


def pack_fused_params(params: Dict[str, Any], cfg: MT3Config,
                      exact: bool = False, wbits: int = 8) -> FusedParams:
    """Quantize the decoder blocks for the megakernel.

    Quantizes from the original (typically fp32) weights, matching
    stack_decode_params' int8 mode. exact=True (quantize='fused_bf16')
    stores bf16 weights with unit scales instead — the megakernel then
    runs unquantized, matching the XLA bf16 body's numerics class.
    wbits=4 (quantize='fused_int4') stores int4 codes, halving the
    streamed weight bytes. The kernel detects the mode from the weight
    dtype."""
    if exact and wbits != 8:
        raise ValueError('exact and wbits=4 are mutually exclusive')
    if wbits not in (4, 8):
        raise ValueError(f'wbits must be 4 or 8, got {wbits}')
    blocks = [params['decoder'][f'block_{i}']
              for i in range(cfg.num_decoder_layers)]

    def stacked(fn):
        return tuple(jnp.stack(x) for x in zip(*[fn(b) for b in blocks]))

    def f32(node):
        return jnp.asarray(node['kernel'], jnp.float32)

    def bf16_columns(w):
        return (w.astype(jnp.bfloat16),
                jnp.ones((1, w.shape[1]), jnp.float32))

    if exact:
        qcols = bf16_columns
    elif wbits == 4:
        # jitted: eager int4 array creation is broken on the axon TPU
        # plugin (recursion in the eager path); compiled it is fine
        qcols = jax.jit(quantize_columns_int4)
    else:
        qcols = quantize_columns

    wqkv, sqkv = stacked(lambda b: qcols(jnp.concatenate(
        [f32(b['self_attn']['q']), f32(b['self_attn']['k']),
         f32(b['self_attn']['v'])], axis=1)))
    wo, so = stacked(lambda b: qcols(f32(b['self_attn']['o'])))
    wqc, sqc = stacked(lambda b: qcols(f32(b['cross_attn']['q'])))
    woc, soc = stacked(lambda b: qcols(f32(b['cross_attn']['o'])))
    wff_in, sff_in = stacked(lambda b: qcols(jnp.concatenate(
        [f32(b['ff']['wi_0']), f32(b['ff']['wi_1'])], axis=1)))
    wff_out, sff_out = stacked(lambda b: qcols(f32(b['ff']['wo'])))
    norms = jnp.stack([
        jnp.stack([jnp.asarray(b['self_norm']['weight'], jnp.float32),
                   jnp.asarray(b['cross_norm']['weight'], jnp.float32),
                   jnp.asarray(b['ff_norm']['weight'], jnp.float32)])
        for b in blocks])
    final_norm = jnp.asarray(params['decoder']['final_norm']['weight'],
                             jnp.float32)[None, :]
    lm_q, lm_s = qcols(
        jnp.asarray(params['lm_head']['kernel'], jnp.float32))
    return FusedParams(wqkv, sqkv, wo, so, wqc, sqc, woc, soc,
                       wff_in, sff_in, wff_out, sff_out, norms,
                       final_norm, lm_q, lm_s)


def init_fused_cache(cfg: MT3Config, batch: int, max_len: int,
                     exact: bool = False,
                     kv_dtype=None) -> Dict[str, jnp.ndarray]:
    """Head-major int8 self-KV cache: kq/vq (L, H, B, dk, P) + per-position
    f32 scales ks/vs (L, H, B, P). exact=True (fused_bf16) stores bf16
    rows; the scale arrays remain as UNUSED placeholders (the exact-mode
    kernel math never reads them) so the kernel's operand structure is
    mode-independent. kv_dtype overrides the cache dtype explicitly
    (jnp.int4 for quantize='fused_int4')."""
    l, h, dk = cfg.num_decoder_layers, cfg.num_heads, cfg.d_kv
    shape = (l, h, batch, dk, max_len)
    sshape = (l, h, batch, max_len)
    if kv_dtype is None:
        kv_dtype = jnp.bfloat16 if exact else jnp.int8
    return {'kq': jnp.zeros(shape, kv_dtype),
            'ks': jnp.zeros(sshape, jnp.float32),
            'vq': jnp.zeros(shape, kv_dtype),
            'vs': jnp.zeros(sshape, jnp.float32)}


def precompute_cross_kv_fused(dp, cfg: MT3Config,
                              encoder_out: jnp.ndarray,
                              exact: bool = False,
                              qmax: int = 127
                              ) -> Dict[str, jnp.ndarray]:
    """Encoder K/V for all layers, quantized int8 head-major.

    dp: DecodeParams (for the stacked cross_attn k/v kernels).
    exact=True (fused_bf16) keeps bf16 K/V with unit scales; qmax=7
    (fused_int4) stores int4 codes."""
    from mr_mt3_tpu.ops.fast_decode import precompute_cross_kv_stacked
    k, v = precompute_cross_kv_stacked(dp, cfg, encoder_out,
                                       kv_layout='bhdk')  # (L,B,H,dk,Lenc)
    k = jnp.moveaxis(k, 2, 1)                              # (L,H,B,dk,Lenc)
    v = jnp.moveaxis(v, 2, 1)
    if exact:
        sshape = k.shape[:3] + k.shape[4:]
        return {'ckq': k.astype(jnp.bfloat16),
                'cks': jnp.ones(sshape, jnp.float32),
                'cvq': v.astype(jnp.bfloat16),
                'cvs': jnp.ones(sshape, jnp.float32)}
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    dtype = jnp.int4 if qmax == 7 else jnp.int8
    # per-position scales (over dk, axis -2)
    ks = jnp.maximum(jnp.max(jnp.abs(k), axis=-2), 1e-12) / qmax
    vs = jnp.maximum(jnp.max(jnp.abs(v), axis=-2), 1e-12) / qmax
    kq = jnp.clip(jnp.round(k / ks[..., None, :]), -qmax, qmax).astype(dtype)
    vq = jnp.clip(jnp.round(v / vs[..., None, :]), -qmax, qmax).astype(dtype)
    return {'ckq': kq, 'cks': ks, 'cvq': vq, 'cvs': vs}


def _rms(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return weight * (x * jax.lax.rsqrt(var + eps))


def _math_helpers(cfg: MT3Config, batch: int, exact: bool = False,
                  qmax: int = 127):
    """Shared in-kernel math for the step and window kernels.

    exact=True is the quantize='fused_bf16' mode: weights, KV caches and
    cross-KV are bf16 (scales are unit-valued and ignored), the attention
    contractions are bf16 MXU dots with f32 accumulation, and no
    re-quantization happens anywhere — the same numerics class as the
    XLA bf16 decode body, at megakernel launch cost.

    qmax=7 is the quantize='fused_int4' mode: KV rows are stored as int4
    codes in [-7, 7] (merge_hb widens them to int8 in-register for the
    MXU dots — the HBM bytes are already halved by then); q/probs keep
    their per-row int8 quantization."""
    heads, d_kv = cfg.num_heads, cfg.d_kv
    hb = heads * batch
    kv_dtype = jnp.int4 if qmax == 7 else jnp.int8

    def scores_vpu(q: jnp.ndarray, kq_hb, ks_hb) -> jnp.ndarray:
        """q (HB, dk) f32 x int8 K (HB, dk, K) -> (HB, K) f32 scores.

        VPU dequant + broadcast-multiply + reduce over dk; exact — q needs
        no quantization."""
        k = kq_hb.astype(jnp.float32)
        return jnp.sum(q[:, :, None] * k, axis=1) * ks_hb

    def values_vpu(p: jnp.ndarray, vq_hb, vs_hb) -> jnp.ndarray:
        """probs (HB, K) f32 x int8 V (HB, dk, K) -> (HB, dk) f32.

        Folds the per-position v scales into p (one K-sized multiply
        instead of dk-sized dequant), then VPU multiply + reduce over K."""
        pv = p * vs_hb
        v = vq_hb.astype(jnp.float32)
        return jnp.sum(pv[:, None, :] * v, axis=-1)

    def scores_mxu(q: jnp.ndarray, kq_hb, ks_hb) -> jnp.ndarray:
        """(HB)-batched int8 MXU score dot with per-row q quantization.

        expand_dims happens on the f32 array BEFORE the int8 cast —
        Mosaic cannot shape-cast int8 vectors."""
        qscale = jnp.maximum(jnp.max(jnp.abs(q), axis=-1, keepdims=True),
                             1e-12) / 127.0
        qi8 = jnp.clip(jnp.round((q / qscale)[:, None, :]),
                       -127, 127).astype(jnp.int8)
        scores = jax.lax.dot_general(
            qi8, kq_hb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)[:, 0, :]
        return scores.astype(jnp.float32) * qscale * ks_hb

    def values_mxu(p: jnp.ndarray, vq_hb, vs_hb) -> jnp.ndarray:
        """(HB)-batched int8 MXU value dot; probabilities are folded with
        the per-position v scales and re-quantized per row (the one lossy
        step beyond KV quantization — ops/int8_attention.py math)."""
        pv = p * vs_hb
        pscale = jnp.maximum(jnp.max(jnp.abs(pv), axis=-1, keepdims=True),
                             1e-20) / 127.0
        pi8 = jnp.clip(jnp.round((pv / pscale)[:, None, :]),
                       -127, 127).astype(jnp.int8)
        out = jax.lax.dot_general(
            pi8, vq_hb,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)[:, 0, :]
        return out.astype(jnp.float32) * pscale

    def scores_exact(q: jnp.ndarray, k_hb, ks_hb) -> jnp.ndarray:
        """(HB)-batched bf16 MXU score dot (fused_bf16 mode); the unit
        scales are ignored. expand_dims on the f32 array before the cast,
        as in scores_mxu."""
        qb = (q[:, None, :]).astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qb, k_hb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        return scores

    def values_exact(p: jnp.ndarray, v_hb, vs_hb) -> jnp.ndarray:
        """(HB)-batched bf16 MXU value dot (fused_bf16 mode); probabilities
        cast to bf16 (the XLA body's contraction dtype), no re-quantization."""
        pb = (p[:, None, :]).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            pb, v_hb,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        return out

    if exact:
        int8_scores, int8_values = scores_exact, values_exact
    else:
        int8_scores = scores_mxu if ATTN_IMPL == 'mxu' else scores_vpu
        int8_values = values_mxu if ATTN_IMPL == 'mxu' else values_vpu

    def int8_proj(h_bf16: jnp.ndarray, w_ref, s) -> jnp.ndarray:
        """(B, K) bf16 @ int8 (K, N) * scales -> (B, N) f32.

        In exact mode the weights are already bf16 (astype is a no-op)
        and the unit scale multiply is skipped."""
        acc = jnp.dot(h_bf16, w_ref.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return acc if exact else acc * s

    def scatter_heads(dst_ref, flat: jnp.ndarray, col0: int):
        """(B, inner) lane-sliced per head into (HB, dk) scratch rows."""
        for h in range(heads):
            dst_ref[h * batch:(h + 1) * batch, :] = \
                flat[:, col0 + h * d_kv:col0 + (h + 1) * d_kv]

    def gather_heads(src: jnp.ndarray) -> jnp.ndarray:
        """(HB, dk) -> (B, inner) by lane-concatenating the head blocks."""
        return jnp.concatenate(
            [src[h * batch:(h + 1) * batch, :] for h in range(heads)],
            axis=1)

    def merge_hb(ref):
        """(1, H, B, ...) block -> (HB, ...) leading-dim merge.

        int4 blocks (fused_int4 KV) widen to int8 in-register for the
        MXU dots; the HBM traffic was already paid at int4 width."""
        block = ref[0]
        if block.dtype == jnp.int4:
            block = block.astype(jnp.int8)
        return block.reshape((hb,) + block.shape[2:])

    def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(HB, dk) f32 -> (int8/int4 codes, per-row f32 scale); in exact
        mode (bf16 rows, unit scale) — the scale keeps its operand slot
        so the kernel structure is mode-independent."""
        if exact:
            return x.astype(jnp.bfloat16), jnp.ones((x.shape[0], 1),
                                                    jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                            1e-12) / qmax
        return jnp.clip(jnp.round(x / scale),
                        -qmax, qmax).astype(kv_dtype), scale

    return (int8_scores, int8_values, int8_proj, scatter_heads,
            gather_heads, merge_hb, quantize_rows)


def chunk_base_for(lenc: int, single_group: bool = False) -> int:
    """Streamed cache chunk for a given encoder length.

    Longer encoders (segmem appends memory: Lenc=320) originally HALVED
    the chunk to 128 — under Mosaic's default 16 MiB scoped-VMEM cap the
    bigger cross-KV blocks left no room for a 256-position chunk. The
    raised FUSED_VMEM_LIMIT re-opened that axis, and at Lenc=320 the
    512 chunk wins decisively at BOTH call shapes (v5e, segmem lockstep
    8x8 worst-case): single-group 135.4 (chunk 128) -> 166.9 (256) ->
    195.2 RTF (512); 4 unrolled groups (B=32) 142.2 -> 173.9 -> 188.6.
    single_group (a call of <= FUSED_MAX_BATCH rows that is NOT one of
    several unrolled groups) goes further: the WHOLE worst-case decode in
    one 1024-position chunk — zero dead-chunk grid steps, and the
    full-width masked flash dot costs less than the grid steps it
    replaces (measured B=8 159-164 (chunk 512) -> 166.2 (1024); segmem
    lockstep 195.2 -> 197.9). Grouped short-encoder calls keep 256
    (8 unrolled 512-chunk kernels measured 174.1 vs 202.8 RTF at B=64;
    PERF.md)."""
    if single_group:
        return CHUNK * 4
    return CHUNK * 2 if lenc > 256 else CHUNK


def _layer_ops(cfg: MT3Config, batch: int, exact: bool = False,
               qmax: int = 127):
    """Shared layer-body sections for the step and window kernels.

    Both kernels MUST keep identical math here — any fix applies to both
    by construction."""
    (int8_scores, int8_values, int8_proj, scatter_heads, gather_heads,
     merge_hb, quantize_rows) = _math_helpers(cfg, batch, exact=exact,
                                              qmax=qmax)
    inner, d_kv, d_ff = cfg.inner_dim, cfg.d_kv, cfg.d_ff
    eps = cfg.layer_norm_epsilon
    hb = cfg.num_heads * batch

    def qkv_block(x, norms, wqkv, sqkv,
                  q_scr, k_scr, v_scr, m_scr, l_scr, acc_scr, emit_rows):
        """Project q/k/v from x, reset the flash state, and hand the
        quantized cache rows to emit_rows(kq, ks, vq, vs)."""
        h1 = _rms(x, norms[0, 0:1, :], eps).astype(jnp.bfloat16)
        qkv = int8_proj(h1, wqkv[0], sqkv[0])       # (B, 3*inner) f32
        scatter_heads(q_scr, qkv, 0)
        scatter_heads(k_scr, qkv, inner)
        scatter_heads(v_scr, qkv, 2 * inner)
        m_scr[:] = jnp.full((hb, 1), -1e30, jnp.float32)
        l_scr[:] = jnp.zeros((hb, 1), jnp.float32)
        acc_scr[:] = jnp.zeros((hb, d_kv), jnp.float32)
        kq_row, ks_row = quantize_rows(k_scr[:])
        vq_row, vs_row = quantize_rows(v_scr[:])
        emit_rows(kq_row, ks_row, vq_row, vs_row)

    def flash_chunk(q_scr, m_scr, l_scr, acc_scr, kq, ks, vq, vs,
                    base, limit, chunk):
        """Online-softmax update over one int8 cache chunk; only cache
        columns < limit (already-written positions) participate."""
        col = jax.lax.broadcasted_iota(jnp.int32, (hb, chunk), 1) + base
        valid = col < limit
        scores = int8_scores(q_scr[:], merge_hb(kq), merge_hb(ks))
        scores = jnp.where(valid, scores, -1e30)
        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(scores - m_new)
        p = jnp.where(valid, p, 0.0)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = (acc_scr[:] * alpha
                      + int8_values(p, merge_hb(vq), merge_hb(vs)))
        m_scr[:] = m_new

    def o_cross_ff(x, attn_bf16, q_scr, norms,
                   wo, so, wqc, sqc, woc, soc,
                   wff_in, sff_in, wff_out, sff_out,
                   ckq, cks, cvq, cvs):
        """Self-attention output projection, cross-attention over the int8
        encoder KV, and the gated-GELU FF. Returns the new x."""
        x = x + int8_proj(attn_bf16, wo[0], so[0])
        h2 = _rms(x, norms[0, 1:2, :], eps).astype(jnp.bfloat16)
        qc_flat = int8_proj(h2, wqc[0], sqc[0])      # (B, inner)
        scatter_heads(q_scr, qc_flat, 0)             # reuse q scratch
        scores = int8_scores(q_scr[:], merge_hb(ckq), merge_hb(cks))
        probs = jax.nn.softmax(scores, axis=-1)
        attn_c = int8_values(probs, merge_hb(cvq), merge_hb(cvs))
        attn_c = gather_heads(attn_c).astype(jnp.bfloat16)
        x = x + int8_proj(attn_c, woc[0], soc[0])
        h3 = _rms(x, norms[0, 2:3, :], eps).astype(jnp.bfloat16)
        g = int8_proj(h3, wff_in[0], sff_in[0])      # (B, 2F)
        gated = (gelu_new(g[:, :d_ff]) * g[:, d_ff:]).astype(jnp.bfloat16)
        return x + int8_proj(gated, wff_out[0], sff_out[0])

    return qkv_block, flash_chunk, o_cross_ff


def _make_kernel(cfg: MT3Config, batch: int, chunk: int, n_chunks: int,
                 exact: bool = False, qmax: int = 127):
    eps = cfg.layer_norm_epsilon
    n_layers = cfg.num_decoder_layers
    (_, _, int8_proj, _, gather_heads, _, _) = _math_helpers(
        cfg, batch, exact=exact, qmax=qmax)
    qkv_block, flash_chunk, o_cross_ff = _layer_ops(cfg, batch, exact=exact,
                                                    qmax=qmax)

    def kernel(pos_ref, x_ref,
               wqkv, sqkv, wo, so, wqc, sqc, woc, soc,
               wff_in, sff_in, wff_out, sff_out, norms,
               fnorm, lm_q, lm_s,
               ckq, cks, cvq, cvs,
               kq, ks, vq, vs,
               logits_out, kq_out, ks_out, vq_out, vs_out,
               x_scr, q_scr, k_scr, v_scr, m_scr, l_scr, acc_scr):
        i = pl.program_id(0)
        c = pl.program_id(1)
        pos = pos_ref[0]

        @pl.when(jnp.logical_and(i == 0, c == 0))
        def _():
            x_scr[:] = x_ref[:].astype(jnp.float32)

        @pl.when(c == 0)
        def _():
            def emit(kq_row, ks_row, vq_row, vs_row):
                kq_out[0] = kq_row
                ks_out[0] = ks_row
                vq_out[0] = vq_row
                vs_out[0] = vs_row
            qkv_block(x_scr[:], norms, wqkv, sqkv,
                      q_scr, k_scr, v_scr, m_scr, l_scr, acc_scr, emit)

        # self-attention: flash update over cache chunk c, all heads in
        # single (HB)-batched dots; rows 0..pos-1 hold past positions.
        # Chunks past the frontier are skipped (no DMA via chunk_spec's
        # clamp, no compute via this guard).
        @pl.when(c * chunk < pos)
        def _():
            flash_chunk(q_scr, m_scr, l_scr, acc_scr, kq, ks, vq, vs,
                        c * chunk, pos, chunk)

        @pl.when(c == n_chunks - 1)
        def _():
            x = x_scr[:]
            # diagonal term (current position, f32 on-chip)
            q, kc, vc = q_scr[:], k_scr[:], v_scr[:]
            s_cur = jnp.sum(q * kc, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_scr[:], s_cur)
            alpha = jnp.exp(m_scr[:] - m_new)
            p_cur = jnp.exp(s_cur - m_new)
            l_fin = l_scr[:] * alpha + p_cur
            acc = acc_scr[:] * alpha + p_cur * vc
            attn = gather_heads(acc / l_fin).astype(jnp.bfloat16)
            x = o_cross_ff(x, attn, q_scr, norms,
                           wo, so, wqc, sqc, woc, soc,
                           wff_in, sff_in, wff_out, sff_out,
                           ckq, cks, cvq, cvs)
            x_scr[:] = x

            @pl.when(i == n_layers - 1)
            def _():
                xf = _rms(x, fnorm[0:1, :], eps).astype(jnp.bfloat16)
                logits_out[:] = int8_proj(xf, lm_q[:], lm_s[:])

    return kernel


def fused_decode_step(cfg: MT3Config, fp: FusedParams, dp,
                      tokens: jnp.ndarray, position: jnp.ndarray,
                      cache: Dict[str, jnp.ndarray],
                      cross: Dict[str, jnp.ndarray],
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One greedy step through the megakernel.

    tokens (B,) int32 -> (logits (B, vocab), updated cache). dp supplies
    the embedding/pos-table/final-norm/lm_head leaves (DecodeParams).
    On real TPU the batch must be a multiple of 8: gather_heads
    lane-concatenates per-head (batch, dk) blocks, and sub-tile sublane
    offsets hit Mosaic's 'offset mismatch on non-concat dimension'
    (greedy_loop_fused pads for the window kernel; direct callers of
    this per-step kernel pad themselves)."""
    heads, d_kv, d_model = cfg.num_heads, cfg.d_kv, cfg.d_model
    inner = cfg.inner_dim
    n_layers = cfg.num_decoder_layers
    batch = tokens.shape[0]
    max_len = cache['kq'].shape[-1]
    lenc = cross['ckq'].shape[-1]
    chunk = min(chunk_base_for(lenc), max_len)
    if max_len % chunk:
        raise ValueError(f'fused cache length {max_len} must be a multiple '
                         f'of {chunk}')
    n_chunks = max_len // chunk

    x = dp.token_embed[tokens].astype(jnp.float32)
    x = x + jax.lax.dynamic_slice_in_dim(
        dp.pos_table, position, 1, 0).astype(jnp.float32)

    # index maps receive the scalar-prefetch ref as a trailing arg
    def layer_spec(block, mem=pltpu.VMEM):
        return pl.BlockSpec(
            block, lambda i, c, *_: (i,) + (0,) * (len(block) - 1),
            memory_space=mem)

    def chunk_spec(block):
        nd = len(block)

        # skip chunks past the decode frontier (see the window kernel's
        # chunk_spec): clamping to the last live chunk elides the DMA,
        # and the kernel gates the matching (no-op) compute
        def imap(i, c, pos_ref):
            live = (pos_ref[0] + chunk - 1) // chunk
            c_eff = jnp.minimum(c, jnp.maximum(live - 1, 0))
            return (i,) + (0,) * (nd - 2) + (c_eff,)

        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    const_spec = pl.BlockSpec(
        x.shape, lambda i, c, *_: (0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_layers, n_chunks),
        in_specs=[
            const_spec,                                       # x
            layer_spec((1, d_model, 3 * inner)),              # wqkv
            layer_spec((1, 1, 3 * inner)),                    # sqkv
            layer_spec((1, inner, d_model)),                  # wo
            layer_spec((1, 1, d_model)),                      # so
            layer_spec((1, d_model, inner)),                  # wqc
            layer_spec((1, 1, inner)),                        # sqc
            layer_spec((1, inner, d_model)),                  # woc
            layer_spec((1, 1, d_model)),                      # soc
            layer_spec((1, d_model, 2 * cfg.d_ff)),           # wff_in
            layer_spec((1, 1, 2 * cfg.d_ff)),                 # sff_in
            layer_spec((1, cfg.d_ff, d_model)),               # wff_out
            layer_spec((1, 1, d_model)),                      # sff_out
            layer_spec((1, 3, d_model)),                      # norms
            pl.BlockSpec((1, d_model), lambda i, c, *_: (0, 0),
                         memory_space=pltpu.VMEM),            # final_norm
            pl.BlockSpec((d_model, cfg.vocab_size),
                         lambda i, c, *_: (0, 0),
                         memory_space=pltpu.VMEM),            # lm_q
            pl.BlockSpec((1, cfg.vocab_size), lambda i, c, *_: (0, 0),
                         memory_space=pltpu.VMEM),            # lm_s
            layer_spec((1, heads, batch, d_kv, lenc)),        # ckq
            layer_spec((1, heads, batch, lenc)),              # cks
            layer_spec((1, heads, batch, d_kv, lenc)),        # cvq
            layer_spec((1, heads, batch, lenc)),              # cvs
            chunk_spec((1, heads, batch, d_kv, chunk)),       # kq
            chunk_spec((1, heads, batch, chunk)),             # ks
            chunk_spec((1, heads, batch, d_kv, chunk)),       # vq
            chunk_spec((1, heads, batch, chunk)),             # vs
        ],
        out_specs=[
            pl.BlockSpec((batch, cfg.vocab_size), lambda i, c, *_: (0, 0),
                         memory_space=pltpu.VMEM),            # logits
            layer_spec((1, heads * batch, d_kv)),             # kq_row
            layer_spec((1, heads * batch, 1)),                # ks_row
            layer_spec((1, heads * batch, d_kv)),             # vq_row
            layer_spec((1, heads * batch, 1)),                # vs_row
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, d_model), jnp.float32),          # x_scr
            pltpu.VMEM((heads * batch, d_kv), jnp.float32),     # q_scr
            pltpu.VMEM((heads * batch, d_kv), jnp.float32),     # k_scr
            pltpu.VMEM((heads * batch, d_kv), jnp.float32),     # v_scr
            pltpu.VMEM((heads * batch, 1), jnp.float32),        # m_scr
            pltpu.VMEM((heads * batch, 1), jnp.float32),        # l_scr
            pltpu.VMEM((heads * batch, d_kv), jnp.float32),     # acc_scr
        ],
    )
    exact = fp.wqkv.dtype == jnp.bfloat16
    qmax = 7 if fp.wqkv.dtype == jnp.int4 else 127
    kv_dtype = jnp.bfloat16 if exact else (
        jnp.int4 if qmax == 7 else jnp.int8)
    kernel = _make_kernel(cfg, batch, chunk, n_chunks, exact=exact,
                          qmax=qmax)
    pos = jnp.asarray(position, jnp.int32).reshape(1)
    logits, kq_row, ks_row, vq_row, vs_row = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=FUSED_VMEM_LIMIT),
        out_shape=[
            jax.ShapeDtypeStruct((batch, cfg.vocab_size), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, heads * batch, d_kv), kv_dtype),
            jax.ShapeDtypeStruct((n_layers, heads * batch, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, heads * batch, d_kv), kv_dtype),
            jax.ShapeDtypeStruct((n_layers, heads * batch, 1), jnp.float32),
        ],
        interpret=interpret or not _on_tpu(),
    )(pos, x,
      fp.wqkv, fp.sqkv, fp.wo, fp.so, fp.wqc, fp.sqc, fp.woc, fp.soc,
      fp.wff_in, fp.sff_in, fp.wff_out, fp.sff_out, fp.norms,
      fp.final_norm, fp.lm_q, fp.lm_s,
      cross['ckq'], cross['cks'], cross['cvq'], cross['cvs'],
      cache['kq'], cache['ks'], cache['vq'], cache['vs'])

    # scatter the pre-quantized K/V rows into the cache (tiny XLA writes)
    lhbd = (n_layers, heads, batch, d_kv, 1)
    cache = dict(
        kq=jax.lax.dynamic_update_slice(
            cache['kq'], kq_row.reshape(lhbd), (0, 0, 0, 0, position)),
        ks=jax.lax.dynamic_update_slice(
            cache['ks'], ks_row.reshape(n_layers, heads, batch, 1),
            (0, 0, 0, position)),
        vq=jax.lax.dynamic_update_slice(
            cache['vq'], vq_row.reshape(lhbd), (0, 0, 0, 0, position)),
        vs=jax.lax.dynamic_update_slice(
            cache['vs'], vs_row.reshape(n_layers, heads, batch, 1),
            (0, 0, 0, position)))
    return logits, cache


# decode steps per megakernel invocation. The per-invocation cost of a
# pallas_call inside a while_loop on this platform is ~100 us regardless of
# body size (measured with trivial kernels), which capped the 1-step kernel
# at ~0.28 ms/step; a T-step window amortizes it to ~100/T us. The serial
# token dependency resolves IN-KERNEL: one-hot embed matmul -> layers ->
# lm_head -> argmax feed the next grid step through VMEM scratch, with the
# window's own K/V rows kept in scratch so the HBM cache is only read for
# rows decoded before the window. Measured at B=8 bf16-vs-fused, full
# 1024-step decode: T=8 0.134, T=16 0.113, T=32 0.106 ms/step (XLA body
# 0.321). T=32 trades up to 31 wasted post-EOS steps per batch (~3 ms)
# for the lowest steady-state cost.
FUSED_WINDOW = 32


def _make_window_kernel(cfg: MT3Config, batch: int, chunk: int,
                        n_chunks: int, t_window: int,
                        exact: bool = False, qmax: int = 127):
    vocab = cfg.vocab_size
    eps = cfg.layer_norm_epsilon
    n_layers = cfg.num_decoder_layers
    pad_id, eos_id = cfg.pad_token_id, cfg.eos_token_id
    (_, _, int8_proj, _, gather_heads, _, _) = _math_helpers(
        cfg, batch, exact=exact, qmax=qmax)
    qkv_block, flash_chunk, o_cross_ff = _layer_ops(cfg, batch, exact=exact,
                                                    qmax=qmax)

    def kernel(pos_ref, tokens_in, finished_in, embed, pos_rows,
               wqkv, sqkv, wo, so, wqc, sqc, woc, soc,
               wff_in, sff_in, wff_out, sff_out, norms,
               fnorm, lm_q, lm_s,
               ckq, cks, cvq, cvs,
               kq, ks, vq, vs,
               tokens_out, finished_out, kq_out, ks_out, vq_out, vs_out,
               x_scr, q_scr, k_scr, v_scr, m_scr, l_scr, acc_scr,
               wk_scr, wv_scr, tok_scr, fin_scr):
        t = pl.program_id(0)
        i = pl.program_id(1)
        c = pl.program_id(2)
        pos0 = pos_ref[0]

        @pl.when(jnp.logical_and(t == 0,
                                 jnp.logical_and(i == 0, c == 0)))
        def _():
            tok_scr[:] = tokens_in[:]
            fin_scr[:] = finished_in[:]

        @pl.when(jnp.logical_and(i == 0, c == 0))
        def _():
            # embed the current token as a one-hot MXU matmul (no gathers)
            ids = jax.lax.broadcasted_iota(jnp.int32, (batch, vocab), 1)
            onehot = (ids == tok_scr[:]).astype(jnp.bfloat16)
            x = jnp.dot(onehot, embed[:],
                        preferred_element_type=jnp.float32)
            x_scr[:] = x + pos_rows[pl.ds(t, 1), :]

        @pl.when(c == 0)
        def _():
            def emit(kq_row, ks_row, vq_row, vs_row):
                kq_out[0, 0] = kq_row
                ks_out[0, 0] = ks_row
                vq_out[0, 0] = vq_row
                vs_out[0, 0] = vs_row
            qkv_block(x_scr[:], norms, wqkv, sqkv,
                      q_scr, k_scr, v_scr, m_scr, l_scr, acc_scr, emit)
            # window rows: this step's K/V, visible to later window steps
            wk_scr[i, t] = k_scr[:].astype(jnp.bfloat16)
            wv_scr[i, t] = v_scr[:].astype(jnp.bfloat16)

        # flash attention over HBM cache chunk c (rows < pos0 only; rows
        # decoded inside this window live in wk/wv scratch). Chunks past
        # the frontier are skipped: no DMA (chunk_spec clamps their block
        # index) and no compute (this guard).
        @pl.when(c * chunk < pos0)
        def _():
            flash_chunk(q_scr, m_scr, l_scr, acc_scr, kq, ks, vq, vs,
                        c * chunk, pos0, chunk)

        @pl.when(c == n_chunks - 1)
        def _():
            x = x_scr[:]
            # window rows j = 0..t (j == t is the current position)
            q = q_scr[:]
            m, l, acc = m_scr[:], l_scr[:], acc_scr[:]
            for j in range(t_window):
                # rows j > t are uninitialized scratch — mask VALUES, not
                # just weights (0 * NaN/garbage would still poison acc)
                kj = jnp.where(j <= t, wk_scr[i, j].astype(jnp.float32),
                               0.0)
                vj = jnp.where(j <= t, wv_scr[i, j].astype(jnp.float32),
                               0.0)
                s_j = jnp.sum(q * kj, axis=-1, keepdims=True)
                s_j = jnp.where(j <= t, s_j, -1e30)
                m_new = jnp.maximum(m, s_j)
                alpha = jnp.exp(m - m_new)
                p_j = jnp.where(j <= t, jnp.exp(s_j - m_new), 0.0)
                l = l * alpha + p_j
                acc = acc * alpha + p_j * vj
                m = m_new
            attn = gather_heads(acc / l).astype(jnp.bfloat16)
            x = o_cross_ff(x, attn, q_scr, norms,
                           wo, so, wqc, sqc, woc, soc,
                           wff_in, sff_in, wff_out, sff_out,
                           ckq, cks, cvq, cvs)
            x_scr[:] = x

            @pl.when(i == n_layers - 1)
            def _():
                # lm_head + argmax feed the next window step
                xf = _rms(x, fnorm[0:1, :], eps).astype(jnp.bfloat16)
                logits = int8_proj(xf, lm_q[:], lm_s[:])   # (B, vocab) f32
                mx = jnp.max(logits, axis=-1, keepdims=True)
                cand = jnp.where(
                    logits == mx,
                    jax.lax.broadcasted_iota(jnp.int32, (batch, vocab), 1),
                    vocab)
                nxt = jnp.min(cand, axis=-1, keepdims=True).astype(jnp.int32)
                nxt = jnp.where(fin_scr[:] > 0, pad_id, nxt)
                fin_scr[:] = jnp.where(nxt == eos_id, 1, fin_scr[:])
                tok_scr[:] = nxt
                tokens_out[0] = nxt

                @pl.when(t == t_window - 1)
                def _():
                    finished_out[:] = fin_scr[:]

    return kernel


def fused_decode_window(cfg: MT3Config, fp: FusedParams, dp,
                        tokens: jnp.ndarray, finished: jnp.ndarray,
                        position, cache: Dict[str, jnp.ndarray],
                        cross: Dict[str, jnp.ndarray],
                        t_window: int = FUSED_WINDOW,
                        interpret: bool = False,
                        chunk_base: int = None):
    """Decode t_window greedy steps in ONE megakernel invocation.

    tokens (B,) int32: input token of the first step (position `position`);
    finished (B,) bool. Returns (window_tokens (B, t_window) int32,
    finished (B,) bool, updated cache)."""
    heads, d_kv, d_model = cfg.num_heads, cfg.d_kv, cfg.d_model
    n_layers = cfg.num_decoder_layers
    batch = tokens.shape[0]
    hb = heads * batch
    max_len = cache['kq'].shape[-1]
    lenc = cross['ckq'].shape[-1]
    chunk = min(chunk_base if chunk_base else chunk_base_for(lenc),
                max_len)
    if max_len % chunk:
        raise ValueError(f'fused cache length {max_len} must be a multiple '
                         f'of {chunk}')
    n_chunks = max_len // chunk

    pos = jnp.asarray(position, jnp.int32)
    pos_rows = jax.lax.dynamic_slice(
        jnp.asarray(dp.pos_table, jnp.float32), (pos, 0),
        (t_window, d_model))
    embed = jnp.asarray(dp.token_embed, jnp.bfloat16)

    def layer_spec(block, idx=1):
        """Block indexed by grid dim `idx` on its leading axis."""
        return pl.BlockSpec(
            block,
            lambda t, i, c, *_, _idx=idx: ((t, i, c)[_idx],)
            + (0,) * (len(block) - 1),
            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda t, i, c, *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def chunk_spec(block):
        nd = len(block)

        # clamp the chunk index to the last LIVE chunk (one holding rows
        # < pos0): a block index equal to the previous grid step's elides
        # the DMA (the splash-attention scalar-prefetch pattern), so
        # chunks past the decode frontier cost no HBM traffic. The kernel
        # gates their compute on the same condition — which is an exact
        # no-op anyway (alpha=exp(0)=1, p=0), so numerics are unchanged.
        def imap(t, i, c, pos_ref):
            live = (pos_ref[0] + chunk - 1) // chunk
            c_eff = jnp.minimum(c, jnp.maximum(live - 1, 0))
            return (i,) + (0,) * (nd - 2) + (c_eff,)

        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_window, n_layers, n_chunks),
        in_specs=[
            const_spec((batch, 1)),                           # tokens_in
            const_spec((batch, 1)),                           # finished_in
            const_spec((cfg.vocab_size, d_model)),            # embed
            const_spec((t_window, d_model)),                  # pos_rows
            layer_spec((1, d_model, 3 * cfg.inner_dim)),      # wqkv
            layer_spec((1, 1, 3 * cfg.inner_dim)),            # sqkv
            layer_spec((1, cfg.inner_dim, d_model)),          # wo
            layer_spec((1, 1, d_model)),                      # so
            layer_spec((1, d_model, cfg.inner_dim)),          # wqc
            layer_spec((1, 1, cfg.inner_dim)),                # sqc
            layer_spec((1, cfg.inner_dim, d_model)),          # woc
            layer_spec((1, 1, d_model)),                      # soc
            layer_spec((1, d_model, 2 * cfg.d_ff)),           # wff_in
            layer_spec((1, 1, 2 * cfg.d_ff)),                 # sff_in
            layer_spec((1, cfg.d_ff, d_model)),               # wff_out
            layer_spec((1, 1, d_model)),                      # sff_out
            layer_spec((1, 3, d_model)),                      # norms
            const_spec((1, d_model)),                         # final_norm
            const_spec((d_model, cfg.vocab_size)),            # lm_q
            const_spec((1, cfg.vocab_size)),                  # lm_s
            layer_spec((1, heads, batch, d_kv, lenc)),        # ckq
            layer_spec((1, heads, batch, lenc)),              # cks
            layer_spec((1, heads, batch, d_kv, lenc)),        # cvq
            layer_spec((1, heads, batch, lenc)),              # cvs
            chunk_spec((1, heads, batch, d_kv, chunk)),       # kq
            chunk_spec((1, heads, batch, chunk)),             # ks
            chunk_spec((1, heads, batch, d_kv, chunk)),       # vq
            chunk_spec((1, heads, batch, chunk)),             # vs
        ],
        out_specs=[
            pl.BlockSpec((1, batch, 1), lambda t, i, c, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),            # tokens_out
            const_spec((batch, 1)),                           # finished_out
            pl.BlockSpec((1, 1, hb, d_kv),
                         lambda t, i, c, *_: (t, i, 0, 0),
                         memory_space=pltpu.VMEM),            # kq_out
            pl.BlockSpec((1, 1, hb, 1), lambda t, i, c, *_: (t, i, 0, 0),
                         memory_space=pltpu.VMEM),            # ks_out
            pl.BlockSpec((1, 1, hb, d_kv),
                         lambda t, i, c, *_: (t, i, 0, 0),
                         memory_space=pltpu.VMEM),            # vq_out
            pl.BlockSpec((1, 1, hb, 1), lambda t, i, c, *_: (t, i, 0, 0),
                         memory_space=pltpu.VMEM),            # vs_out
        ],
        scratch_shapes=[
            pltpu.VMEM((batch, d_model), jnp.float32),        # x_scr
            pltpu.VMEM((hb, d_kv), jnp.float32),              # q_scr
            pltpu.VMEM((hb, d_kv), jnp.float32),              # k_scr
            pltpu.VMEM((hb, d_kv), jnp.float32),              # v_scr
            pltpu.VMEM((hb, 1), jnp.float32),                 # m_scr
            pltpu.VMEM((hb, 1), jnp.float32),                 # l_scr
            pltpu.VMEM((hb, d_kv), jnp.float32),              # acc_scr
            pltpu.VMEM((n_layers, t_window, hb, d_kv),
                       jnp.bfloat16),                         # wk_scr
            pltpu.VMEM((n_layers, t_window, hb, d_kv),
                       jnp.bfloat16),                         # wv_scr
            pltpu.VMEM((batch, 1), jnp.int32),                # tok_scr
            pltpu.VMEM((batch, 1), jnp.int32),                # fin_scr
        ],
    )
    exact = fp.wqkv.dtype == jnp.bfloat16
    qmax = 7 if fp.wqkv.dtype == jnp.int4 else 127
    kv_dtype = jnp.bfloat16 if exact else (
        jnp.int4 if qmax == 7 else jnp.int8)
    kernel = _make_window_kernel(cfg, batch, chunk, n_chunks,
                                 t_window, exact=exact, qmax=qmax)
    toks_w, fin_out, kq_w, ks_w, vq_w, vs_w = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=FUSED_VMEM_LIMIT),
        out_shape=[
            jax.ShapeDtypeStruct((t_window, batch, 1), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1), jnp.int32),
            jax.ShapeDtypeStruct((t_window, n_layers, hb, d_kv), kv_dtype),
            jax.ShapeDtypeStruct((t_window, n_layers, hb, 1), jnp.float32),
            jax.ShapeDtypeStruct((t_window, n_layers, hb, d_kv), kv_dtype),
            jax.ShapeDtypeStruct((t_window, n_layers, hb, 1), jnp.float32),
        ],
        interpret=interpret or not _on_tpu(),
    )(pos.reshape(1), tokens[:, None].astype(jnp.int32),
      finished[:, None].astype(jnp.int32), embed, pos_rows,
      fp.wqkv, fp.sqkv, fp.wo, fp.so, fp.wqc, fp.sqc, fp.woc, fp.soc,
      fp.wff_in, fp.sff_in, fp.wff_out, fp.sff_out, fp.norms,
      fp.final_norm, fp.lm_q, fp.lm_s,
      cross['ckq'], cross['cks'], cross['cvq'], cross['cvs'],
      cache['kq'], cache['ks'], cache['vq'], cache['vs'])

    # scatter the window's T pre-quantized K/V rows in one update each
    def rows_last(a, tail):
        # (T, L, HB, tail) -> (L, H, B, tail, T)
        a = a.reshape(t_window, n_layers, heads, batch, tail)
        return jnp.moveaxis(a, 0, -1)

    cache = dict(
        kq=jax.lax.dynamic_update_slice(
            cache['kq'], rows_last(kq_w, d_kv), (0, 0, 0, 0, pos)),
        ks=jax.lax.dynamic_update_slice(
            cache['ks'], rows_last(ks_w, 1)[:, :, :, 0, :],
            (0, 0, 0, pos)),
        vq=jax.lax.dynamic_update_slice(
            cache['vq'], rows_last(vq_w, d_kv), (0, 0, 0, 0, pos)),
        vs=jax.lax.dynamic_update_slice(
            cache['vs'], rows_last(vs_w, 1)[:, :, :, 0, :],
            (0, 0, 0, pos)))
    return toks_w[:, :, 0].T, fin_out[:, 0] > 0, cache


