"""Group-axis window megakernel — a measured-loser design, kept for study.

Decodes G groups of 8 rows in ONE kernel with the layer weights DMA'd once
per (token, layer) instead of once per group. The roofline said ~1.4x at
B=64; measured it LOSES to sequential groups-of-8 (PERF.md "negative
results": the bigger-VMEM kernel leaves XLA no room to overlap group
work). It is int8-only by construction (the kernel writes an int8 KV
cache unconditionally). Relocated out of the product kernel file
(mr_mt3_tpu/ops/fused_decode.py) in round 4 so that file carries only
winning paths; benchmarks/dev_fused_group_axis.py measures this design
against the product path, and tests/test_fused_decode.py pins its
numerics so the recorded negative stays a comparison of two CORRECT
kernels.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from typing import Dict

from mr_mt3_tpu.models.config import MT3Config
from mr_mt3_tpu.ops._backend import on_tpu as _on_tpu
from mr_mt3_tpu.ops.fused_decode import (
    FUSED_VMEM_LIMIT,
    FusedParams,
    _layer_ops,
    _math_helpers,
    _rms,
    chunk_base_for,
)

# ---------------------------------------------------------------------------
# Group-axis window kernel: one kernel decodes G groups of 8 rows with the
# layer weights DMA'd ONCE per (token, layer) instead of once per group.
#
# At B=64 the in-trace groups-of-8 path streams the int8 layer weights
# (~2.75 MB x 8 layers = 22 MB) once PER GROUP per token step — 176 MB of
# the ~550 MB/step total HBM traffic. A grid of (tokens, layers, groups,
# chunks) with the weight blocks indexed by the layer id alone makes
# consecutive (group, chunk) steps revisit the same weight block, which
# Mosaic recognizes and skips the copy — the weights stream once per
# (token, layer) for ALL groups (roofline ceiling ~1.4x at B=64).
#
# The cache/cross blocks stay 8-row-sized (indexed by a flattened
# (layer*G + group) leading axis so the in-kernel merges keep their proven
# 48-row shapes); only the window's bf16 K/V rows and the tiny token/x
# state grow with G, which is what makes the VMEM budget close.
# ---------------------------------------------------------------------------


def regroup_cross_kv(cross: Dict[str, jnp.ndarray], n_groups: int
                     ) -> Dict[str, jnp.ndarray]:
    """(L, H, B, ...) cross-KV -> flattened (L*G, H, 8, ...) group-major."""

    def regroup(a):
        l, h, b = a.shape[:3]
        g = n_groups
        a = a.reshape((l, h, g, b // g) + a.shape[3:])
        a = jnp.moveaxis(a, 2, 1)          # (L, G, H, 8, ...)
        return a.reshape((l * g, h, b // g) + a.shape[4:])

    return {k: regroup(v) for k, v in cross.items()}


def init_fused_cache_grouped(cfg: MT3Config, n_groups: int,
                             max_len: int) -> Dict[str, jnp.ndarray]:
    """Int8 self-KV cache for the grouped kernel: kq/vq (L*G, H, 8, dk, P)
    + per-position f32 scales ks/vs (L*G, H, 8, P)."""
    lg = cfg.num_decoder_layers * n_groups
    h, dk = cfg.num_heads, cfg.d_kv
    return {'kq': jnp.zeros((lg, h, 8, dk, max_len), jnp.int8),
            'ks': jnp.zeros((lg, h, 8, max_len), jnp.float32),
            'vq': jnp.zeros((lg, h, 8, dk, max_len), jnp.int8),
            'vs': jnp.zeros((lg, h, 8, max_len), jnp.float32)}


def _make_grouped_kernel(cfg: MT3Config, n_groups: int, chunk: int,
                         n_chunks: int, t_window: int):
    batch = 8  # rows per group; the kernel's attention math is 8-row
    vocab = cfg.vocab_size
    eps = cfg.layer_norm_epsilon
    n_layers = cfg.num_decoder_layers
    pad_id, eos_id = cfg.pad_token_id, cfg.eos_token_id
    (_, _, int8_proj, _, gather_heads, _, _) = _math_helpers(cfg, batch)
    qkv_block, flash_chunk, o_cross_ff = _layer_ops(cfg, batch)
    inner, d_ff = cfg.inner_dim, cfg.d_ff

    def kernel(pos_ref, packed_in, embed, pos_rows,
               wqkv, wo, wqc, woc, wff_in, wff_out,
               scale_a, scale_b, norms,
               fnorm, lm_q, lm_s,
               ckq, cks, cvq, cvs,
               kq, ks, vq, vs,
               tokens_out, kq_out, ks_out, vq_out, vs_out,
               x_scr, q_scr, k_scr, v_scr, m_scr, l_scr, acc_scr,
               wk_scr, wv_scr, tok_scr):
        t = pl.program_id(0)
        i = pl.program_id(1)
        g = pl.program_id(2)
        c = pl.program_id(3)
        pos0 = pos_ref[0]

        # the six per-layer scale vectors arrive packed into two blocks
        # (six separate (1, 1, N) f32 blocks each pad their sublane dim
        # 1 -> 8; packing shares one padded block). Slices keep a leading
        # unit dim so the shared layer ops' s[0] indexing still applies.
        sqkv = scale_a[0, 0:1, 0:3 * inner]
        sff_in = scale_a[0, 1:2, 0:2 * d_ff]
        sqc = scale_a[0, 2:3, 0:inner]
        so = scale_b[0, 0:1, :]
        soc = scale_b[0, 1:2, :]
        sff_out = scale_b[0, 2:3, :]

        # token/flag state is flat (G*8, 1) — a (G, 8, 1) layout would pad
        # each group's width-1 lane dim to 128 lanes (262 KB of VMEM for
        # 256 bytes of tokens). Per-group views are dynamic sublane slices
        # (the same op class as pos_rows[pl.ds(t, 1)] below). The finished
        # flag is PACKED into bit 16 of the token word (tokens < 2^16):
        # a separate int8 flag buffer pads to a 6 KB (48, 128) tile each
        # for the scratch and the input block — the margin by which the
        # phased 512-position program overflowed the 16 MB VMEM budget.
        grows = pl.ds(g * batch, batch)

        @pl.when(jnp.logical_and(t == 0, jnp.logical_and(
            i == 0, jnp.logical_and(g == 0, c == 0))))
        def _():
            tok_scr[:] = packed_in[:]

        @pl.when(jnp.logical_and(i == 0, c == 0))
        def _():
            # embed this group's current tokens as a one-hot MXU matmul
            ids = jax.lax.broadcasted_iota(jnp.int32, (batch, vocab), 1)
            cur = jnp.bitwise_and(tok_scr[grows], 0xFFFF)
            onehot = (ids == cur).astype(jnp.bfloat16)
            x = jnp.dot(onehot, embed[:],
                        preferred_element_type=jnp.float32)
            x_scr[g] = x + pos_rows[pl.ds(t, 1), :]

        @pl.when(c == 0)
        def _():
            def emit(kq_row, ks_row, vq_row, vs_row):
                # scales leave as bf16: XLA keeps this kernel's output
                # tuple VMEM-resident inside the decode loop, and a width-1
                # f32 lane pads 128x — bf16 halves the two largest tuple
                # members (the cache scatter casts back to f32; ~0.4%
                # relative scale rounding, below the int8 code noise)
                kq_out[0, 0] = kq_row
                ks_out[0, 0] = ks_row.astype(jnp.bfloat16)
                vq_out[0, 0] = vq_row
                vs_out[0, 0] = vs_row.astype(jnp.bfloat16)
            qkv_block(x_scr[g], norms, wqkv, sqkv,
                      q_scr, k_scr, v_scr, m_scr, l_scr, acc_scr, emit)
            # window rows: this step's K/V in bf16, visible to later window
            # steps. NOT int8+scale: a (..., 48, 1) f32 scale scratch pads
            # its minor dim to 128 lanes (T(8,128) tiling), costing ~8x the
            # bf16 rows it was meant to save.
            wk_scr[i, t, g] = k_scr[:].astype(jnp.bfloat16)
            wv_scr[i, t, g] = v_scr[:].astype(jnp.bfloat16)

        # flash attention over HBM cache chunk c (rows < pos0 only); chunks
        # past the frontier are skipped (clamped block index = no DMA, this
        # guard = no compute)
        @pl.when(c * chunk < pos0)
        def _():
            flash_chunk(q_scr, m_scr, l_scr, acc_scr, kq, ks, vq, vs,
                        c * chunk, pos0, chunk)

        @pl.when(c == n_chunks - 1)
        def _():
            x = x_scr[g]
            # window rows j = 0..t (j == t is the current position) — bf16
            # scratch, the same math as the ungrouped window kernel
            q = q_scr[:]
            m, l, acc = m_scr[:], l_scr[:], acc_scr[:]
            for j in range(t_window):
                # rows j > t are uninitialized scratch — mask VALUES, not
                # just weights (0 * garbage would still poison acc)
                kj = jnp.where(j <= t, wk_scr[i, j, g].astype(jnp.float32),
                               0.0)
                vj = jnp.where(j <= t, wv_scr[i, j, g].astype(jnp.float32),
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
            x_scr[g] = x

            @pl.when(i == n_layers - 1)
            def _():
                # lm_head + argmax feed this group's next window step
                xf = _rms(x, fnorm[0:1, :], eps).astype(jnp.bfloat16)
                logits = int8_proj(xf, lm_q[:], lm_s[:])   # (8, vocab) f32
                mx = jnp.max(logits, axis=-1, keepdims=True)
                cand = jnp.where(
                    logits == mx,
                    jax.lax.broadcasted_iota(jnp.int32, (batch, vocab), 1),
                    vocab)
                nxt = jnp.min(cand, axis=-1, keepdims=True).astype(jnp.int32)
                fin32 = jnp.right_shift(tok_scr[grows], 16)
                nxt = jnp.where(fin32 > 0, pad_id, nxt)
                fin32 = jnp.where(nxt == eos_id, 1, fin32)
                tok_scr[grows] = nxt + jnp.left_shift(fin32, 16)
                tokens_out[0] = nxt
                # no finished output: the driver derives the updated flags
                # from the window tokens (a row finishing in this window
                # emits EOS exactly once, then pads)

    return kernel


def fused_decode_window_grouped(cfg: MT3Config, fp: FusedParams, dp,
                                tokens: jnp.ndarray, finished: jnp.ndarray,
                                position, cache: Dict[str, jnp.ndarray],
                                cross: Dict[str, jnp.ndarray],
                                t_window: int = 8,
                                interpret: bool = False,
                                chunk_base: int = None):
    """Decode t_window greedy steps for G groups of 8 in ONE megakernel.

    cache/cross use the flattened (L*G, H, 8, ...) layout
    (init_fused_cache_grouped / regroup_cross_kv). tokens (G*8,) int32,
    finished (G*8,) bool. Returns (window_tokens (G*8, t_window),
    finished (G*8,), updated cache)."""
    heads, d_kv, d_model = cfg.num_heads, cfg.d_kv, cfg.d_model
    n_layers = cfg.num_decoder_layers
    batch = 8
    hb = heads * batch
    lg = cache['kq'].shape[0]
    n_groups = lg // n_layers
    if tokens.shape[0] != n_groups * 8:
        raise ValueError(f'tokens rows {tokens.shape[0]} != groups '
                         f'{n_groups} x 8')
    if fp.wqkv.dtype != jnp.int8:
        # the group-axis design lost to sequential groups (PERF.md
        # negative result) and was only ever built for the int8 tier;
        # its kernel writes an int8 KV cache unconditionally, so bf16 or
        # int4 FusedParams would decode silently wrong rather than fail
        raise NotImplementedError(
            'fused_decode_window_grouped supports only int8 FusedParams '
            f'(got {fp.wqkv.dtype}); use the sequential-groups path for '
            "'fused_bf16'/'fused_int4'")
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

    # pack the six per-layer scale vectors into two (L, 3, N) tensors —
    # separate (1, 1, N) blocks each pad their sublane dim 1 -> 8 in VMEM
    wide = max(3 * cfg.inner_dim, 2 * cfg.d_ff)

    def pad_to(s, w):
        row = s[:, 0, :]
        return jnp.pad(row, ((0, 0), (0, w - row.shape[-1])))

    scale_a = jnp.stack([pad_to(fp.sqkv, wide), pad_to(fp.sff_in, wide),
                         pad_to(fp.sqc, wide)], axis=1)
    scale_b = jnp.stack([fp.so[:, 0, :], fp.soc[:, 0, :],
                         fp.sff_out[:, 0, :]], axis=1)

    def layer_spec(block):
        """Weight block indexed by the LAYER id alone: consecutive
        (group, chunk) grid steps revisit the same block, so Mosaic skips
        the copy and the weights stream once per (token, layer)."""
        return pl.BlockSpec(
            block, lambda t, i, g, c, *_: (i,) + (0,) * (len(block) - 1),
            memory_space=pltpu.VMEM)

    def group_spec(block):
        """Cross-KV block for (layer, group): leading index i*G + g."""
        return pl.BlockSpec(
            block,
            lambda t, i, g, c, *_, _g=n_groups: (i * _g + g,)
            + (0,) * (len(block) - 1),
            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape,
                            lambda t, i, g, c, *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def chunk_spec(block):
        nd = len(block)

        # leading index i*G + g; minor chunk index clamped to the last
        # LIVE chunk so frontier-dead chunks elide their DMA (the kernel
        # gates the matching no-op compute)
        def imap(t, i, g, c, pos_ref, _g=n_groups):
            live = (pos_ref[0] + chunk - 1) // chunk
            c_eff = jnp.minimum(c, jnp.maximum(live - 1, 0))
            return (i * _g + g,) + (0,) * (nd - 2) + (c_eff,)

        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_window, n_layers, n_groups, n_chunks),
        in_specs=[
            const_spec((n_groups * batch, 1)),                # packed_in
            const_spec((cfg.vocab_size, d_model)),            # embed
            const_spec((t_window, d_model)),                  # pos_rows
            layer_spec((1, d_model, 3 * cfg.inner_dim)),      # wqkv
            layer_spec((1, cfg.inner_dim, d_model)),          # wo
            layer_spec((1, d_model, cfg.inner_dim)),          # wqc
            layer_spec((1, cfg.inner_dim, d_model)),          # woc
            layer_spec((1, d_model, 2 * cfg.d_ff)),           # wff_in
            layer_spec((1, cfg.d_ff, d_model)),               # wff_out
            layer_spec((1, 3, wide)),                         # scale_a
            layer_spec((1, 3, d_model)),                      # scale_b
            layer_spec((1, 3, d_model)),                      # norms
            const_spec((1, d_model)),                         # final_norm
            const_spec((d_model, cfg.vocab_size)),            # lm_q
            const_spec((1, cfg.vocab_size)),                  # lm_s
            group_spec((1, heads, batch, d_kv, lenc)),        # ckq
            group_spec((1, heads, batch, lenc)),              # cks
            group_spec((1, heads, batch, d_kv, lenc)),        # cvq
            group_spec((1, heads, batch, lenc)),              # cvs
            chunk_spec((1, heads, batch, d_kv, chunk)),       # kq
            chunk_spec((1, heads, batch, chunk)),             # ks
            chunk_spec((1, heads, batch, d_kv, chunk)),       # vq
            chunk_spec((1, heads, batch, chunk)),             # vs
        ],
        out_specs=[
            pl.BlockSpec((1, batch, 1),
                         lambda t, i, g, c, *_: (t, g, 0),
                         memory_space=pltpu.VMEM),            # tokens_out
            pl.BlockSpec((1, 1, hb, d_kv),
                         lambda t, i, g, c, *_, _g=n_groups:
                         (t, i * _g + g, 0, 0),
                         memory_space=pltpu.VMEM),            # kq_out
            pl.BlockSpec((1, 1, hb, 1),
                         lambda t, i, g, c, *_, _g=n_groups:
                         (t, i * _g + g, 0, 0),
                         memory_space=pltpu.VMEM),            # ks_out
            pl.BlockSpec((1, 1, hb, d_kv),
                         lambda t, i, g, c, *_, _g=n_groups:
                         (t, i * _g + g, 0, 0),
                         memory_space=pltpu.VMEM),            # vq_out
            pl.BlockSpec((1, 1, hb, 1),
                         lambda t, i, g, c, *_, _g=n_groups:
                         (t, i * _g + g, 0, 0),
                         memory_space=pltpu.VMEM),            # vs_out
        ],
        scratch_shapes=[
            pltpu.VMEM((n_groups, batch, d_model), jnp.float32),  # x_scr
            pltpu.VMEM((hb, d_kv), jnp.float32),              # q_scr
            pltpu.VMEM((hb, d_kv), jnp.float32),              # k_scr
            pltpu.VMEM((hb, d_kv), jnp.float32),              # v_scr
            pltpu.VMEM((hb, 1), jnp.float32),                 # m_scr
            pltpu.VMEM((hb, 1), jnp.float32),                 # l_scr
            pltpu.VMEM((hb, d_kv), jnp.float32),              # acc_scr
            pltpu.VMEM((n_layers, t_window, n_groups, hb, d_kv),
                       jnp.bfloat16),                         # wk_scr
            pltpu.VMEM((n_layers, t_window, n_groups, hb, d_kv),
                       jnp.bfloat16),                         # wv_scr
            # flat (G*8, 1): all rows on the sublane axis (one 128-lane
            # pad total instead of one per group), finished flag packed
            # into bit 16 of the token word — these layout choices are
            # what let the 256-position cache chunk (and the phased
            # 512-position program) fit the 16 MB VMEM budget
            pltpu.VMEM((n_groups * batch, 1), jnp.int32),     # tok_scr
        ],
    )
    kernel = _make_grouped_kernel(cfg, n_groups, chunk, n_chunks,
                                  t_window)
    toks_w, kq_w, ks_w, vq_w, vs_w = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=FUSED_VMEM_LIMIT),
        out_shape=[
            jax.ShapeDtypeStruct((t_window, n_groups * batch, 1),
                                 jnp.int32),
            jax.ShapeDtypeStruct((t_window, lg, hb, d_kv), jnp.int8),
            jax.ShapeDtypeStruct((t_window, lg, hb, 1), jnp.bfloat16),
            jax.ShapeDtypeStruct((t_window, lg, hb, d_kv), jnp.int8),
            jax.ShapeDtypeStruct((t_window, lg, hb, 1), jnp.bfloat16),
        ],
        interpret=interpret or not _on_tpu(),
    )(pos.reshape(1),
      (tokens.astype(jnp.int32)
       + (finished.astype(jnp.int32) << 16)).reshape(n_groups * batch, 1),
      embed, pos_rows,
      fp.wqkv, fp.wo, fp.wqc, fp.woc, fp.wff_in, fp.wff_out,
      scale_a, scale_b, fp.norms,
      fp.final_norm, fp.lm_q, fp.lm_s,
      cross['ckq'], cross['cks'], cross['cvq'], cross['cvs'],
      cache['kq'], cache['ks'], cache['vq'], cache['vs'])

    # scatter the window's T pre-quantized K/V rows in one update each
    def rows_last(a, tail):
        # (T, L*G, HB, tail) -> (L*G, H, 8, tail, T)
        a = a.reshape(t_window, lg, heads, batch, tail)
        return jnp.moveaxis(a, 0, -1)

    cache = dict(
        kq=jax.lax.dynamic_update_slice(
            cache['kq'], rows_last(kq_w, d_kv), (0, 0, 0, 0, pos)),
        ks=jax.lax.dynamic_update_slice(
            cache['ks'],
            rows_last(ks_w, 1)[:, :, :, 0, :].astype(jnp.float32),
            (0, 0, 0, pos)),
        vq=jax.lax.dynamic_update_slice(
            cache['vq'], rows_last(vq_w, d_kv), (0, 0, 0, 0, pos)),
        vs=jax.lax.dynamic_update_slice(
            cache['vs'],
            rows_last(vs_w, 1)[:, :, :, 0, :].astype(jnp.float32),
            (0, 0, 0, pos)))
    toks = toks_w[:, :, 0].T
    # a row finishing inside this window emits EOS exactly once (pads
    # after); rows already finished emit only pads — OR-ing recovers the
    # kernel's internal flag without a dedicated (padded-tile) output
    finished = finished | jnp.any(toks == cfg.eos_token_id, axis=1)
    return (toks, finished, cache)
