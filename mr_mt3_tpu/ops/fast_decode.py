"""Scan-over-layers greedy decode step on stacked decoder parameters.

Functionally identical to MT3.decode_step (pinned by the greedy-vs-
teacher-forced tests) but the 8 decoder layers run as a lax.scan over
parameters stacked on a leading layer axis, shrinking the while-loop body
HLO ~8x. On the tunneled axon TPU platform, program *size* dominates
first-execution latency (a full-size unrolled decode program takes minutes
to start; client-side XLA compile is seconds), so compact programs are a
first-class performance concern, not hygiene.

The KV cache lives in the scan carry as stacked (L, B, max_len, H, Dk)
arrays updated with per-layer dynamic_update_slice — tiny in-place writes,
full reads only for attention, same traffic as the per-layer-pytree layout.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mr_mt3_tpu.models.config import MT3Config
from mr_mt3_tpu.models.mt3 import gelu_new, sinusoidal_position_table


class DecodeParams(NamedTuple):
    """Decoder weights arranged for the scan decode step.

    With quantize='int8' the gated-FF weights move into layers['ff_i8']
    (int8 + per-column scales, consumed by the fused Pallas kernel) and
    lm_head_q/lm_head_scale replace the bf16 lm_head read."""
    layers: Dict[str, jnp.ndarray]   # leading (L, ...) axis per leaf
    token_embed: jnp.ndarray         # (vocab, D)
    final_norm: jnp.ndarray          # (D,)
    lm_head: jnp.ndarray             # (D, vocab)
    pos_table: jnp.ndarray           # (max_positions, D)
    lm_head_q: Any = None            # (D, vocab) int8
    lm_head_scale: Any = None        # (1, vocab) f32
    fused: Any = None                # FusedParams (quantize='fused')


def stack_decode_params(params: Dict[str, Any], cfg: MT3Config,
                        dtype=None, quantize: str = 'none') -> DecodeParams:
    """Stack per-block decoder weights along a leading layer axis.

    quantize='int8' quantizes the FF block + lm_head (the largest weight
    reads) per output column for the fused Pallas dequant kernels."""
    if dtype is None:
        dtype = cfg.activation_dtype
    blocks = [params['decoder'][f'block_{i}']
              for i in range(cfg.num_decoder_layers)]
    lm_head_q = lm_head_scale = None
    fused = None
    if quantize in ('fused', 'fused_bf16', 'fused_int4'):
        from mr_mt3_tpu.ops.fused_decode import pack_fused_params
        fused = pack_fused_params(params, cfg,
                                  exact=quantize == 'fused_bf16',
                                  wbits=4 if quantize == 'fused_int4'
                                  else 8)
        # the megakernel holds every decoder weight in int8 (FusedParams;
        # bf16 with 'fused_bf16');
        # the fused driver reads only the cross-attn K/V kernels from the
        # stacked tree (precompute_cross_kv_stacked) plus token_embed /
        # pos_table — stack just those two leaves so the full bf16
        # layer stacks and lm_head are never even allocated in HBM
        # alongside the quantized copies (stack-then-discard would pay
        # the transfer at every handler startup)
        layers = {'cross_attn': {
            name: {'kernel': jnp.stack(
                [jnp.asarray(b['cross_attn'][name]['kernel'], dtype)
                 for b in blocks])}
            for name in ('k', 'v')}}
        lm_head = jnp.zeros((0,), dtype)
    else:
        layers = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x, dtype) for x in xs]),
            *blocks)
        lm_head = jnp.asarray(params['lm_head']['kernel'], dtype)
    if quantize == 'int8':
        from mr_mt3_tpu.ops.int8_matmul import quantize_columns
        layers.pop('ff')
        quant = jax.vmap(quantize_columns)
        # quantize the ORIGINAL (typically fp32) weights, not the stacked
        # activation-dtype copies — going through bf16 first would compound
        # two roundings into the int8 codes
        layers['ff_i8'] = {
            name: dict(zip(('w', 's'), quant(jnp.stack(
                [jnp.asarray(b['ff'][name]['kernel'], jnp.float32)
                 for b in blocks]))))
            for name in ('wi_0', 'wi_1', 'wo')}
        lm_head_q, lm_head_scale = quantize_columns(
            jnp.asarray(params['lm_head']['kernel'], jnp.float32))
    return DecodeParams(
        layers=layers,
        token_embed=jnp.asarray(params['token_embed']['embedding'], dtype),
        final_norm=jnp.asarray(params['decoder']['final_norm']['weight'],
                               jnp.float32),
        lm_head=lm_head if quantize != 'int8' else jnp.zeros((0,), dtype),
        pos_table=jnp.asarray(
            sinusoidal_position_table(cfg.d_model, cfg.max_positions),
            dtype),
        lm_head_q=lm_head_q,
        lm_head_scale=lm_head_scale,
        fused=fused)


def _rms(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    out = x32 * jax.lax.rsqrt(var + eps)
    return (weight * out.astype(dtype)).astype(dtype)


def precompute_cross_kv_stacked(dp: DecodeParams, cfg: MT3Config,
                                encoder_out: jnp.ndarray,
                                kv_layout: str = 'bhdk'
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention K/V for all layers in two batched matmuls.

    kv_layout 'bhdk' -> (L, B, H, Dk, Lenc): the minor two dims (Dk=64,
    Lenc) tile exactly onto the TPU's (16,128) bf16 layout; the legacy
    'bkhd' -> (L, B, Lenc, H, Dk) leaves (H=6, Dk=64) minor, which XLA
    pads ~5x in HBM.
    """
    b, lenc, _ = encoder_out.shape
    enc = encoder_out.astype(dp.lm_head.dtype)
    wk = dp.layers['cross_attn']['k']['kernel']  # (L, D, inner)
    wv = dp.layers['cross_attn']['v']['kernel']
    layers, heads, d_kv = cfg.num_decoder_layers, cfg.num_heads, cfg.d_kv
    if kv_layout == 'bhdk':
        k = jnp.einsum('bsd,ldi->lbis', enc, wk)
        v = jnp.einsum('bsd,ldi->lbis', enc, wv)
        shape = (layers, b, heads, d_kv, lenc)
        return k.reshape(shape), v.reshape(shape)
    k = jnp.einsum('bsd,ldi->lbsi', enc, wk)
    v = jnp.einsum('bsd,ldi->lbsi', enc, wv)
    shape = (layers, b, lenc, heads, d_kv)
    return k.reshape(shape), v.reshape(shape)


def init_cache_stacked(cfg: MT3Config, batch: int, max_len: int,
                       dtype=None, kv_layout: str = 'bhdk'
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if dtype is None:
        dtype = cfg.activation_dtype
    if kv_layout == 'bhdk':
        shape = (cfg.num_decoder_layers, batch, cfg.num_heads, cfg.d_kv,
                 max_len)
    else:
        shape = (cfg.num_decoder_layers, batch, max_len, cfg.num_heads,
                 cfg.d_kv)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def init_int8_cache_stacked(cfg: MT3Config, batch: int, max_len: int):
    """Int8 KV cache + per-position f32 scales (quantize='int8_kv')."""
    shape = (cfg.num_decoder_layers, batch, cfg.num_heads, cfg.d_kv,
             max_len)
    sshape = (cfg.num_decoder_layers, batch, cfg.num_heads, 1, max_len)
    return {'kq': jnp.zeros(shape, jnp.int8),
            'ks': jnp.zeros(sshape, jnp.float32),
            'vq': jnp.zeros(shape, jnp.int8),
            'vs': jnp.zeros(sshape, jnp.float32)}


def quantize_cross_kv(cross_kv: Tuple[jnp.ndarray, jnp.ndarray]):
    """(L,B,H,dk,Lenc) bf16 cross K/V -> int8 + per-position scales."""
    from mr_mt3_tpu.ops.int8_attention import quantize_kv_rows
    cross_k, cross_v = cross_kv
    kq, ks = quantize_kv_rows(cross_k)
    vq, vs = quantize_kv_rows(cross_v)
    return {'kq': kq, 'ks': ks, 'vq': vq, 'vs': vs}


def decode_step_fast(cfg: MT3Config, dp: DecodeParams,
                     tokens: jnp.ndarray, position: jnp.ndarray,
                     cache, cross_kv,
                     kv_layout: str = 'bhdk',
                     quantize: str = 'none') -> Tuple[jnp.ndarray, Tuple]:
    """One greedy step. tokens (B,) -> (logits (B, vocab), new cache).

    quantize='int8_kv': cache/cross_kv are int8+scales dicts (see
    init_int8_cache_stacked) and attention runs through the Pallas
    int8-dequant kernel."""
    if quantize == 'int8_kv':
        return _decode_step_int8_kv(cfg, dp, tokens, position, cache,
                                    cross_kv)
    eps = cfg.layer_norm_epsilon
    heads, d_kv = cfg.num_heads, cfg.d_kv
    k_cache, v_cache = cache
    cross_k, cross_v = cross_kv
    batch = tokens.shape[0]
    seq_last = kv_layout == 'bhdk'
    max_len = k_cache.shape[-1] if seq_last else k_cache.shape[2]

    x = dp.token_embed[tokens][:, None, :]  # (B, 1, D)
    x = x + jax.lax.dynamic_slice_in_dim(dp.pos_table, position, 1, 0)

    pos_idx = jnp.arange(max_len)
    step_mask = jnp.where(pos_idx <= position, 0.0,
                          -1e9).astype(x.dtype)[None, None, None, :]

    def heads_of(y):
        return y.reshape(batch, 1, heads, d_kv)

    def attend(q, k, v, mask):
        """q (B,1,H,Dk); k/v in (B,K,H,Dk) or (B,H,Dk,K) per layout."""
        if seq_last:
            scores = jnp.einsum('bqhd,bhdk->bhqk', q, k)
        else:
            scores = jnp.einsum('bqhd,bkhd->bhqk', q, k)
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            q.dtype)
        if seq_last:
            out = jnp.einsum('bhqk,bhdk->bqhd', probs, v)
        else:
            out = jnp.einsum('bhqk,bkhd->bqhd', probs, v)
        return out.reshape(batch, 1, heads * d_kv)

    def layer(carry, inp):
        x, k_cache, v_cache, i = carry
        p, ck, cv = inp
        # self attention with cache update
        h = _rms(x, p['self_norm']['weight'].astype(jnp.float32), eps)
        q = heads_of(h @ p['self_attn']['q']['kernel'])
        k_step = heads_of(h @ p['self_attn']['k']['kernel'])
        v_step = heads_of(h @ p['self_attn']['v']['kernel'])
        if seq_last:
            k_upd = k_step.reshape(batch, heads, d_kv)[None, ..., None]
            v_upd = v_step.reshape(batch, heads, d_kv)[None, ..., None]
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_upd, (i, 0, 0, 0, position))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_upd, (i, 0, 0, 0, position))
        else:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_step[None], (i, 0, position, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_step[None], (i, 0, position, 0, 0))
        k_all = jax.lax.dynamic_index_in_dim(k_cache, i, 0, keepdims=False)
        v_all = jax.lax.dynamic_index_in_dim(v_cache, i, 0, keepdims=False)
        attn = attend(q, k_all, v_all, step_mask)
        x = x + attn @ p['self_attn']['o']['kernel']
        # cross attention against precomputed K/V
        h = _rms(x, p['cross_norm']['weight'].astype(jnp.float32), eps)
        q = heads_of(h @ p['cross_attn']['q']['kernel'])
        attn = attend(q, ck, cv, None)
        x = x + attn @ p['cross_attn']['o']['kernel']
        # gated-GELU MLP
        h = _rms(x, p['ff_norm']['weight'].astype(jnp.float32), eps)
        if 'ff_i8' in p:
            from mr_mt3_tpu.ops.int8_matmul import int8_gated_ff
            q = p['ff_i8']
            ff_out = int8_gated_ff(
                h[:, 0, :], q['wi_0']['w'], q['wi_0']['s'],
                q['wi_1']['w'], q['wi_1']['s'],
                q['wo']['w'], q['wo']['s'])
            x = x + ff_out[:, None, :]
        else:
            h = gelu_new(h @ p['ff']['wi_0']['kernel']) * \
                (h @ p['ff']['wi_1']['kernel'])
            x = x + h @ p['ff']['wo']['kernel']
        return (x, k_cache, v_cache, i + 1), None

    (x, k_cache, v_cache, _), _ = jax.lax.scan(
        layer, (x, k_cache, v_cache, jnp.int32(0)),
        (dp.layers, cross_k, cross_v))

    x = _rms(x, dp.final_norm, eps)
    if dp.lm_head_q is not None:
        from mr_mt3_tpu.ops.int8_matmul import int8_matmul
        logits = int8_matmul(x[:, 0, :], dp.lm_head_q, dp.lm_head_scale)
    else:
        logits = (x @ dp.lm_head)[:, 0]
    return logits, (k_cache, v_cache)


DEFAULT_PHASES = tuple(range(64, 1024, 64))


def _decode_step_int8_kv(cfg: MT3Config, dp: DecodeParams,
                         tokens: jnp.ndarray, position: jnp.ndarray,
                         cache, cross_q) -> Tuple[jnp.ndarray, Tuple]:
    """decode_step_fast body with int8 self/cross KV via Pallas attention.

    cache: init_int8_cache_stacked dict; cross_q: quantize_cross_kv dict.
    Identical math to the bf16 path up to KV quantization error."""
    from mr_mt3_tpu.ops.int8_attention import (
        int8_decode_attention,
        quantize_kv_rows,
    )
    eps = cfg.layer_norm_epsilon
    heads, d_kv = cfg.num_heads, cfg.d_kv
    batch = tokens.shape[0]
    lenc = cross_q['kq'].shape[-1]

    x = dp.token_embed[tokens][:, None, :]
    x = x + jax.lax.dynamic_slice_in_dim(dp.pos_table, position, 1, 0)

    def q_heads(y):
        return y.reshape(batch, heads, d_kv)

    def layer(carry, inp):
        x, cache, i = carry
        p, cq = inp
        # self attention: quantize the appended row, attend over int8 cache
        h = _rms(x, p['self_norm']['weight'].astype(jnp.float32), eps)
        q = q_heads(h[:, 0, :] @ p['self_attn']['q']['kernel'])
        k_step = q_heads(h[:, 0, :] @ p['self_attn']['k']['kernel'])
        v_step = q_heads(h[:, 0, :] @ p['self_attn']['v']['kernel'])
        kq_row, ks_row = quantize_kv_rows(k_step[..., None])  # (B,H,dk,1)
        vq_row, vs_row = quantize_kv_rows(v_step[..., None])
        cache = dict(
            kq=jax.lax.dynamic_update_slice(
                cache['kq'], kq_row[None], (i, 0, 0, 0, position)),
            ks=jax.lax.dynamic_update_slice(
                cache['ks'], ks_row[None], (i, 0, 0, 0, position)),
            vq=jax.lax.dynamic_update_slice(
                cache['vq'], vq_row[None], (i, 0, 0, 0, position)),
            vs=jax.lax.dynamic_update_slice(
                cache['vs'], vs_row[None], (i, 0, 0, 0, position)))
        sel = lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
        attn = int8_decode_attention(
            q, sel(cache['kq']), sel(cache['ks']),
            sel(cache['vq']), sel(cache['vs']), position)
        x = x + (attn @ p['self_attn']['o']['kernel'])[:, None, :]
        # cross attention over the statically quantized encoder KV
        h = _rms(x, p['cross_norm']['weight'].astype(jnp.float32), eps)
        q = q_heads(h[:, 0, :] @ p['cross_attn']['q']['kernel'])
        attn = int8_decode_attention(
            q, cq['kq'], cq['ks'], cq['vq'], cq['vs'],
            jnp.int32(lenc - 1))
        x = x + (attn @ p['cross_attn']['o']['kernel'])[:, None, :]
        # gated-GELU MLP (bf16 weights; combine with 'int8' separately)
        h = _rms(x, p['ff_norm']['weight'].astype(jnp.float32), eps)
        h = gelu_new(h @ p['ff']['wi_0']['kernel']) * \
            (h @ p['ff']['wi_1']['kernel'])
        x = x + h @ p['ff']['wo']['kernel']
        return (x, cache, i + 1), None

    (x, cache, _), _ = jax.lax.scan(
        layer, (x, cache, jnp.int32(0)), (dp.layers, cross_q))
    x = _rms(x, dp.final_norm, eps)
    logits = (x @ dp.lm_head)[:, 0]
    return logits, cache


def run_phased_decode(state, bounds, body, pad_cache, cache_len=None):
    """Run a greedy-decode `body` under while_loops split at `bounds`,
    growing the KV cache between phases.

    The decode loops keep the cache length a trace-time constant inside
    each while_loop (XLA needs static shapes) and grow it in chunked
    phases: decode to bound b with a cache sized cache_len(b), then pad
    and continue (PERF.md: phase chunking is what makes short decodes
    cheap without recompiling per length). All three loop families —
    model-apply (ops/decode.py), stacked-fast, and the fused megakernel
    — share this skeleton; only the cache pytree layout (pad_cache) and
    the phase-to-cache-length map (cache_len) differ.

    state: (i, tokens, cache, finished); body: state -> state advancing
    i; pad_cache(cache, delta): pad the cache's position axis by delta;
    cache_len(bound): the cache length the phase decoding up to `bound`
    needs (default: the bound itself). The initial cache must already
    be sized cache_len(bounds[0]). Each phase's while_loop early-exits
    once every row is finished. Returns the final state's tokens."""
    if cache_len is None:
        cache_len = lambda b: b  # noqa: E731
    cur = cache_len(bounds[0])
    for bound in bounds:
        target = cache_len(bound)
        if target > cur:
            i, tokens, cache, finished = state
            state = (i, tokens, pad_cache(cache, target - cur), finished)
            cur = target

        def cond(st, bound=bound):
            i, _, _, finished = st
            return (i < bound) & jnp.logical_not(jnp.all(finished))

        state = jax.lax.while_loop(cond, body, state)
    return state[1]


def greedy_loop_fast(cfg: MT3Config, dp: DecodeParams,
                     encoder_out: jnp.ndarray, max_length: int,
                     phases=DEFAULT_PHASES,
                     kv_layout: str = 'bhdk',
                     quantize: str = 'none',
                     valid_mask: jnp.ndarray = None) -> jnp.ndarray:
    """Phase-chunked greedy decode; returns tokens (B, max_length + 1).

    Defaults measured on one v5e chip at B=8 bf16, full 1024 steps:
    64-step phases run 0.326 ms/step vs 0.532 at the old (256, 512)
    schedule — the while-loop body only streams the KV window decoded so
    far (~37% less self-KV traffic than 3 coarse phases), at the same
    ~70 s first-execution cost. kv_layout 'bhdk' keeps the sequence axis
    minor in the KV cache so the (Dk, seq) tail tiles the TPU HBM layout
    exactly (the legacy 'bkhd' layout pads the (H=6, Dk=64) tail ~5x:
    B=64 decode measured 3.30 -> 1.89 s after the switch).

    valid_mask (B,) bool: rows marked False (batch padding) start
    finished, emitting pads — without it a padding row that never emits
    EOS blocks the all-finished early exit for its whole batch.
    """
    batch = encoder_out.shape[0]
    int8_kv = quantize == 'int8_kv'
    fused = quantize in ('fused', 'fused_bf16', 'fused_int4')
    if int8_kv and kv_layout != 'bhdk':
        raise ValueError("quantize='int8_kv' requires kv_layout='bhdk' "
                         '(per-position scales quantize over the Dk axis)')
    if fused:
        return greedy_loop_fused(cfg, dp, encoder_out, max_length,
                                 valid_mask=valid_mask)
    cross_kv = precompute_cross_kv_stacked(dp, cfg, encoder_out,
                                           kv_layout=kv_layout)
    if int8_kv:
        cross_kv = quantize_cross_kv(cross_kv)
    bounds = [p for p in sorted(phases) if p < max_length] + [max_length]

    cache = (init_int8_cache_stacked(cfg, batch, bounds[0]) if int8_kv
             else init_cache_stacked(cfg, batch, bounds[0],
                                     kv_layout=kv_layout))
    tokens = jnp.full((batch, max_length + 1), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    finished = (jnp.zeros((batch,), bool) if valid_mask is None
                else jnp.logical_not(valid_mask))
    seq_axis = 4 if (kv_layout == 'bhdk' or int8_kv) else 2

    def body(state):
        i, tokens, cache, finished = state
        cur = jax.lax.dynamic_slice(tokens, (0, i), (batch, 1))[:, 0]
        logits, cache = decode_step_fast(cfg, dp, cur, i, cache,
                                         cross_kv, kv_layout=kv_layout,
                                         quantize=quantize)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        finished = finished | (nxt == cfg.eos_token_id)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None],
                                              (0, i + 1))
        return i + 1, tokens, cache, finished

    def pad_cache(cache, delta):
        pad = [(0, 0)] * 5
        pad[seq_axis] = (0, delta)
        return jax.tree.map(lambda a: jnp.pad(a, pad), cache)

    return run_phased_decode((jnp.int32(0), tokens, cache, finished),
                             bounds, body, pad_cache)


def greedy_loop_fused(cfg: MT3Config, dp: DecodeParams,
                      encoder_out: jnp.ndarray,
                      max_length: int,
                      n_valid: int = None,
                      valid_mask: jnp.ndarray = None,
                      _grouped: bool = False) -> jnp.ndarray:
    """Greedy decode through the whole-decoder megakernel.

    The while-loop body is ONE pallas invocation decoding FUSED_WINDOW
    tokens (embed -> 8 layers -> lm_head -> argmax all in-kernel), which
    amortizes the ~100 us per-invocation cost this platform charges a
    pallas_call inside a compiled loop (ops/fused_decode.py). Returns
    tokens (B, max_length + 1) like greedy_loop_fast."""
    from mr_mt3_tpu.ops.fused_decode import (
        CHUNK,
        FUSED_MAX_BATCH,
        FUSED_WINDOW,
        chunk_base_for,
        fused_decode_window,
        init_fused_cache,
        precompute_cross_kv_fused,
    )
    batch = encoder_out.shape[0]
    # normalize n_valid into valid_mask up front so the pad/group
    # recursions below (which forward only valid_mask) cannot drop it
    if n_valid is not None:
        nv = jnp.arange(batch) < n_valid
        valid_mask = nv if valid_mask is None else (valid_mask & nv)
        n_valid = None
    if batch > 8 * FUSED_MAX_BATCH:
        # 16-group programs fail remote compile on v5e (PERF.md); callers
        # split into <=64-row device calls (the handler does this).
        # Checked BEFORE 8-row alignment so the error reports the
        # caller's own batch size.
        raise ValueError(
            f'fused decode modes support at most {8 * FUSED_MAX_BATCH} '
            f'rows per call (got {batch})')
    # the kernel's per-head sublane slicing needs 8-row-aligned batch
    # blocks (Mosaic cannot lane-concat sub-tile-offset vectors); pad
    # and slice the result
    pad_rows = -batch % 8
    if pad_rows:
        mask = (jnp.ones((batch,), bool) if valid_mask is None
                else valid_mask)
        out = greedy_loop_fused(
            cfg, dp, jnp.pad(encoder_out, ((0, pad_rows), (0, 0), (0, 0))),
            max_length,
            valid_mask=jnp.pad(mask, (0, pad_rows)))
        return out[:batch]
    if batch > FUSED_MAX_BATCH:
        # larger batches run as groups-of-8 UNROLLED IN ONE TRACE: a
        # single bigger kernel does not compile (the per-stage VMEM
        # budget fills at 8 rows — B=16 at CHUNK 128 or 256 both fail),
        # but trace-time grouping lets XLA overlap the groups' non-kernel
        # work and amortize dispatch: measured aggregate 148 (B=8) ->
        # 161 (B=16) -> 199 (B=32) -> 203 RTF (B=64) on v5e (PERF.md).
        # All-padding groups (n_valid below their range) start finished
        # and exit their decode loop immediately.
        mask = (jnp.ones((batch,), bool) if valid_mask is None
                else valid_mask)
        outs = []
        for s in range(0, batch, FUSED_MAX_BATCH):
            outs.append(greedy_loop_fused(
                cfg, dp, encoder_out[s:s + FUSED_MAX_BATCH], max_length,
                valid_mask=mask[s:s + FUSED_MAX_BATCH], _grouped=True))
        return jnp.concatenate(outs)

    # very long encoders halve the window to shrink the persistent wk/wv
    # scratch and stay under VMEM at the 1024-position phase. Measured on
    # v5e: the full window COMPILES AND RUNS at Lenc=320 (the segmem
    # encoder-append shape, 256 + segmem_length 64) and is ~4% faster
    # than the halved window (141 vs 147 ms for a B=8 full decode), so
    # only encoders beyond 320 halve (PERF.md, dev_lockstep_gap.py).
    t_win = FUSED_WINDOW if encoder_out.shape[1] <= 320 else \
        max(8, FUSED_WINDOW // 2)
    # tiny decode budgets (tests, short clips) shrink the window so the
    # kernel does not decode far past max_length (and the unrolled grid
    # stays small for interpret-mode CPU runs)
    t_win = min(t_win, max(8, -(-max_length // 8) * 8))
    # window-align the decode budget; the tail past max_length is wasted
    # compute only (tokens are sliced off)
    ml_eff = -(-max_length // t_win) * t_win
    bounds = [p for p in range(CHUNK, ml_eff, CHUNK)] + [ml_eff]

    # the CACHE length must be whole kernel chunks; the loop bound need
    # not be — decouple them so any max_length works (the kernel masks
    # cache columns >= position, so an over-long cache only costs padding)
    # single-group (standalone <=8-row) programs double the cache chunk
    # to 512: 145.6 -> 159.0 RTF at B=8; grouped programs keep 256 (8
    # unrolled bigger-VMEM kernels fail remote compile — PERF.md)
    chunk_base = chunk_base_for(encoder_out.shape[1],
                                single_group=not _grouped)

    def cache_len_for(bound):
        if bound <= chunk_base:
            return bound
        return -(-bound // chunk_base) * chunk_base

    exact = dp.fused.wqkv.dtype == jnp.bfloat16   # quantize='fused_bf16'
    qmax = 7 if dp.fused.wqkv.dtype == jnp.int4 else 127
    kv_dtype = jnp.bfloat16 if exact else (
        jnp.int4 if qmax == 7 else jnp.int8)
    cross_kv = precompute_cross_kv_fused(dp, cfg, encoder_out, exact=exact,
                                         qmax=qmax)
    cache = init_fused_cache(cfg, batch, cache_len_for(bounds[0]),
                             kv_dtype=kv_dtype)
    tokens = jnp.full((batch, ml_eff + 1), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    # alignment-padding rows (zero encoder) may never emit EOS; marking
    # them finished from the start keeps the all-finished early exit live
    finished = (jnp.zeros((batch,), bool) if valid_mask is None
                else jnp.logical_not(valid_mask))

    def body(state):
        i, tokens, cache, finished = state
        cur = jax.lax.dynamic_slice(tokens, (0, i), (batch, 1))[:, 0]
        toks_w, finished, cache = fused_decode_window(
            cfg, dp.fused, dp, cur, finished, i, cache, cross_kv,
            t_window=t_win, chunk_base=chunk_base)
        tokens = jax.lax.dynamic_update_slice(tokens, toks_w, (0, i + 1))
        return i + t_win, tokens, cache, finished

    toks = run_phased_decode(
        (jnp.int32(0), tokens, cache, finished), bounds, body,
        pad_cache=lambda c, d: jax.tree.map(
            lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, d)]), c),
        cache_len=cache_len_for)
    return toks[:, :max_length + 1]
