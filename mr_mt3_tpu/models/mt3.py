"""MT3 / MR-MT3 model family in Flax.

A from-scratch TPU-first implementation of the reference's HF-T5 fork
(reference: models/t5.py, models/t5_segmem.py, models/t5_segmem_v2.py,
models/t5_segmem_v2_with_prev.py). Architectural contract, verified against
the reference:

  * continuous encoder input: Dense(mel_bins -> d_model, no bias) 'proj'
    (reference: models/t5.py:51);
  * additive fixed sinusoidal positions on the stack *inputs*, not relative
    attention bias — every T5Block is built with
    has_relative_attention_bias=False (reference: models/t5.py:485-490,
    595-598);
  * T5 semantics inside blocks: RMS layer norm (no mean subtraction, no
    bias), un-scaled dot-product attention (no 1/sqrt(d_kv)), gated-GELU MLP
    with tanh-approximate GELU, pre-LN residual blocks;
  * inner attention dim = num_heads * d_kv = 384 != d_model;
  * untied lm_head Dense(d_model -> vocab_size, no bias)
    (reference: models/t5.py:72);
  * segment-memory family: previous-segment tokens re-embedded with the
    decoder embedding, passed through a 1-layer dropout-free encoder stack,
    truncated to segmem_length, then either appended to the encoder output
    (v2 / v2-with-prev; reference: models/t5_segmem_v2_with_prev.py:121-128)
    or prepended to the decoder inputs (v1;
    reference: models/t5_segmem.py:123-141).

Unlike the reference (which re-runs the full decoder over the growing
sequence each step, reference models/t5.py:267-295), generation here uses a
KV cache with one-position decode steps — see mr_mt3_tpu/ops/decode.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mr_mt3_tpu.models.config import MT3Config


def sinusoidal_position_table(dim: int, max_length: int = 5000) -> np.ndarray:
    """[sin(t w_i) ... | cos(t w_i) ...] table, shape (max_length, dim).

    Matches the reference's FixedPositionalEmbedding
    (reference: models/t5.py:705-719): sin block then cos block, NOT
    interleaved.
    """
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64)
                                  / dim))
    t = np.arange(max_length, dtype=np.float64)
    angles = np.outer(t, inv_freq)
    return np.concatenate([np.sin(angles), np.cos(angles)],
                          axis=-1).astype(np.float32)


_GELU_C = float(np.sqrt(2.0 / np.pi))  # python float: keeps bf16 weak-typed


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approximate GELU (HF 'gelu_new', used by T5 gated-gelu)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        _GELU_C * (x + 0.044715 * jnp.power(x, 3.0))))


def shift_right(labels: jnp.ndarray, start_token_id: int = 0,
                pad_token_id: int = 0) -> jnp.ndarray:
    """Teacher-forcing shift: [start, labels[:-1]], with -100 -> pad."""
    shifted = jnp.concatenate(
        [jnp.full(labels.shape[:-1] + (1,), start_token_id,
                  dtype=labels.dtype), labels[..., :-1]], axis=-1)
    return jnp.where(shifted == -100, pad_token_id, shifted)


class RMSNorm(nn.Module):
    """T5LayerNorm: scale-only RMS normalization in fp32."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param('weight', nn.initializers.ones, (x.shape[-1],))
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        variance = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        out = x32 * jax.lax.rsqrt(variance + self.epsilon)
        return (weight * out.astype(dtype)).astype(dtype)


_ATTENTION_KERNELS = ('auto', 'einsum', 'fused')


def _resolve_attention_kernel(cfg: MT3Config) -> str:
    """'auto' -> 'fused' only for the production TPU bf16 mode; fp32 runs
    keep the einsum path so parity goldens see identical reassociation,
    and CPU tests never trace the TPU kernel.

    Unknown values raise here (the single chokepoint) instead of
    silently running einsum — a typo like 'fuse' would otherwise make a
    benchmark 'measure' a kernel it never ran.

    Multi-device jit is safe: the kernel carries a custom_partitioning
    rule over its (batch, head) grid (ops/train_attention.py), so GSPMD
    shards it like any other op; shard_map paths run it per-device."""
    if cfg.attention_kernel not in _ATTENTION_KERNELS:
        raise ValueError(
            f'unknown attention_kernel {cfg.attention_kernel!r}; '
            f'expected one of {_ATTENTION_KERNELS}')
    if cfg.attention_kernel != 'auto':
        return cfg.attention_kernel
    if cfg.dtype == 'bfloat16' and jax.default_backend() == 'tpu':
        return 'fused'
    return 'einsum'


# Gate the fused kernel to long sequences: per-shape fwd+bwd timings
# (benchmarks/dev_attn_micro.py, B=96 H=6 D=64, TPU v5e) measured the
# kernel 1.6x FASTER at 1024^2 (8.2 vs 13.0 ms — the fp32 score tensor
# stops round-tripping HBM) but SLOWER at every 256-length shape (0.6 vs
# 0.12; 1.36 vs 0.23 causal; 1.83 vs 0.89 cross): at L=256 the (B*H)=576
# tiny grid steps plus the (B,H,L,D) layout passes cost more than XLA's
# fused einsum+softmax. So only the segmem memory encoder (L=1024) uses
# the kernel; everything shorter keeps einsum.
_FUSED_MIN_LEN = 512


class Attention(nn.Module):
    """T5 multi-head attention (no scaling, no bias) with optional KV cache.

    Two teacher-forced implementations (cfg.attention_kernel):
      einsum — materializes (B, H, Lq, Lk) scores in HBM, fp32 softmax
               (the reference's shape, models/t5.py attention);
      fused  — ops/train_attention.py single-tile Pallas kernel: the
               whole score matrix lives in VMEM, fp32 softmax on-chip,
               only the (Lq, D) output reaches HBM. Same numerics class
               as einsum (fp32 scores/softmax, bf16 PV); picked
               automatically on TPU bf16 ('auto'). The stock streaming
               flash-attention kernel measured 2.2x SLOWER than einsum
               at these lengths (PERF.md round-4 negative result).
    """
    cfg: MT3Config

    def setup(self):
        inner = self.cfg.inner_dim
        dtype = self.cfg.activation_dtype
        dense = lambda name: nn.Dense(inner, use_bias=False, name=name,
                                      dtype=dtype)
        self.q = dense('q')
        self.k = dense('k')
        self.v = dense('v')
        self.o = nn.Dense(self.cfg.d_model, use_bias=False, name='o',
                          dtype=dtype)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        return x.reshape(b, l, self.cfg.num_heads, self.cfg.d_kv)

    def project_kv(self, kv_src: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """K/V head projections of a source sequence (for caching)."""
        return self._heads(self.k(kv_src)), self._heads(self.v(kv_src))

    def _fused_eligible(self, lq: int, lk: int,
                        mask: Optional[jnp.ndarray], causal: bool) -> bool:
        if _resolve_attention_kernel(self.cfg) != 'fused':
            return False
        if mask is not None:       # decode-step / prefill masks stay einsum
            return False
        if lq < _FUSED_MIN_LEN or lq % 8:
            return False
        if causal and lq != lk:    # causal masking assumes square here
            return False
        return True

    def attend(self, q_in: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               mask: Optional[jnp.ndarray],
               causal: bool = False) -> jnp.ndarray:
        """q_in: (B, Lq, D); k/v: (B, Lk, H, Dk); mask: (Lq, Lk) or
        (B, 1, Lq, Lk) additive, mutually exclusive with causal=True
        (the flash path implements causality by tile skipping, the
        einsum path builds the additive mask here)."""
        q = self._heads(self.q(q_in))
        lq, lk = q.shape[1], k.shape[1]
        if self._fused_eligible(lq, lk, mask, causal):
            from mr_mt3_tpu.ops.train_attention import fused_attention
            out = fused_attention(q, k, v, causal)
        else:
            if causal:
                if mask is not None:
                    raise ValueError('pass mask or causal=True, not both')
                tri = jnp.tril(jnp.ones((lq, lk), dtype=bool))
                mask = jnp.where(tri, 0.0, -1e9).astype(q_in.dtype)
            scores = jnp.einsum('bqhd,bkhd->bhqk', q, k)
            if mask is not None:
                scores = scores + mask
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(q_in.dtype)
            out = jnp.einsum('bhqk,bkhd->bqhd', probs, v)
        b, lq = out.shape[:2]
        return self.o(out.reshape(b, lq, self.cfg.inner_dim))

    def __call__(self, x: jnp.ndarray, kv_src: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 causal: bool = False) -> jnp.ndarray:
        src = x if kv_src is None else kv_src
        k, v = self.project_kv(src)
        return self.attend(x, k, v, mask, causal=causal)


class FeedForward(nn.Module):
    """T5 gated-GELU MLP: wo(gelu_new(wi_0(x)) * wi_1(x))."""
    cfg: MT3Config

    def setup(self):
        dtype = self.cfg.activation_dtype
        self.wi_0 = nn.Dense(self.cfg.d_ff, use_bias=False, name='wi_0',
                             dtype=dtype)
        self.wi_1 = nn.Dense(self.cfg.d_ff, use_bias=False, name='wi_1',
                             dtype=dtype)
        self.wo = nn.Dense(self.cfg.d_model, use_bias=False, name='wo',
                           dtype=dtype)
        self.dropout = nn.Dropout(self.cfg.dropout_rate)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        h = gelu_new(self.wi_0(x)) * self.wi_1(x)
        h = self.dropout(h, deterministic=deterministic)
        return self.wo(h)


class Block(nn.Module):
    """Pre-LN T5 block: self-attn [+ cross-attn] + gated MLP."""
    cfg: MT3Config
    is_decoder: bool
    dropout_rate: float

    def setup(self):
        eps = self.cfg.layer_norm_epsilon
        self.self_norm = RMSNorm(epsilon=eps, name='self_norm')
        self.self_attn = Attention(self.cfg, name='self_attn')
        if self.is_decoder:
            self.cross_norm = RMSNorm(epsilon=eps, name='cross_norm')
            self.cross_attn = Attention(self.cfg, name='cross_attn')
        self.ff_norm = RMSNorm(epsilon=eps, name='ff_norm')
        self.ff = FeedForward(self.cfg, name='ff')
        self.res_dropout = nn.Dropout(self.dropout_rate)

    def _drop(self, x, deterministic):
        return self.res_dropout(x, deterministic=deterministic)

    def __call__(self, x: jnp.ndarray,
                 encoder_out: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = x + self._drop(
            self.self_attn(self.self_norm(x), causal=self.is_decoder),
            deterministic)
        if self.is_decoder:
            x = x + self._drop(
                self.cross_attn(self.cross_norm(x), kv_src=encoder_out),
                deterministic)
        x = x + self._drop(
            self.ff(self.ff_norm(x), deterministic=deterministic),
            deterministic)
        return x


class Stack(nn.Module):
    """T5 stack with additive sinusoidal positions and final RMS norm.

    (reference: models/t5.py:478-702 T5Stack)
    """
    cfg: MT3Config
    num_layers: int
    is_decoder: bool
    dropout_rate: float

    def setup(self):
        block_cls = Block
        if self.cfg.remat:
            # rematerialize block activations in the backward pass;
            # deterministic (arg 3, counting self) must stay static
            block_cls = nn.remat(Block, static_argnums=(3,))
        self.blocks = [
            block_cls(self.cfg, is_decoder=self.is_decoder,
                      dropout_rate=self.dropout_rate, name=f'block_{i}')
            for i in range(self.num_layers)]
        self.final_norm = RMSNorm(epsilon=self.cfg.layer_norm_epsilon,
                                  name='final_norm')
        self.io_dropout = nn.Dropout(self.dropout_rate)
        self.pos_table = jnp.asarray(sinusoidal_position_table(
            self.cfg.d_model, self.cfg.max_positions))

    def add_positions(self, embeds: jnp.ndarray, offset: int = 0):
        seq = embeds.shape[-2]
        pos = jax.lax.dynamic_slice_in_dim(self.pos_table, offset, seq, 0)
        return embeds + pos.astype(embeds.dtype)

    def __call__(self, embeds: jnp.ndarray,
                 encoder_out: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = self.add_positions(embeds)
        x = self.io_dropout(x, deterministic=deterministic)
        for block in self.blocks:
            # positional call so nn.remat's static_argnums applies
            # (causality is the block's own is_decoder attribute)
            x = block(x, encoder_out, deterministic)
        x = self.final_norm(x)
        x = self.io_dropout(x, deterministic=deterministic)
        return x


class MT3(nn.Module):
    """The full encoder-decoder with optional segment memory.

    Public entry points (via .apply(..., method=...)):
      __call__       — teacher-forced logits for training/eval
      encode         — mel -> encoder hidden states (+ segmem append if prev
                       tokens given)
      compute_segmem — previous-segment token ids -> memory embeddings
      decode_hidden  — full-sequence decoder (used by tests/parity)
      init_cache / decode_step — incremental decoding with KV cache
    """
    cfg: MT3Config

    def setup(self):
        cfg = self.cfg
        dtype = cfg.activation_dtype
        self.proj = nn.Dense(cfg.d_model, use_bias=False, name='proj',
                             dtype=dtype)
        self.token_embed = nn.Embed(cfg.vocab_size, cfg.d_model,
                                    name='token_embed', dtype=dtype)
        self.encoder = Stack(cfg, cfg.num_encoder_layers, is_decoder=False,
                             dropout_rate=cfg.dropout_rate, name='encoder')
        self.decoder = Stack(cfg, cfg.num_decoder_layers, is_decoder=True,
                             dropout_rate=cfg.dropout_rate, name='decoder')
        self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                name='lm_head', dtype=dtype)
        if cfg.has_segmem:
            # dropout forced to 0 in the memory encoder
            # (reference: models/t5_segmem.py:63-64)
            self.segmem_encoder = Stack(
                cfg, cfg.segmem_num_layers, is_decoder=False,
                dropout_rate=0.0, name='segmem_encoder')

    # ---- encoder side ----

    def encode_audio(self, mel: jnp.ndarray,
                     deterministic: bool = True) -> jnp.ndarray:
        """mel (B, frames, mel_bins) -> (B, frames, d_model)."""
        x = self.proj(mel.astype(self.cfg.activation_dtype))
        return self.encoder(x, deterministic=deterministic)

    def compute_segmem(self, prev_ids: jnp.ndarray) -> jnp.ndarray:
        """Previous-segment token ids (B, L) -> memory (B, segmem_length, D).

        -100 labels are mapped to pad first
        (reference: models/t5_segmem_v2_with_prev.py:118-123).
        """
        prev_ids = jnp.where(prev_ids == -100, self.cfg.pad_token_id,
                             prev_ids)
        emb = self.token_embed(prev_ids)
        out = self.segmem_encoder(emb, deterministic=True)
        return out[:, :self.cfg.segmem_length]

    def encode(self, mel: jnp.ndarray,
               targets_prev: Optional[jnp.ndarray] = None,
               deterministic: bool = True) -> jnp.ndarray:
        """Full encoder pass; appends segmem for the 'encoder_append' family."""
        enc = self.encode_audio(mel, deterministic=deterministic)
        if self.cfg.segmem_variant == 'encoder_append':
            if targets_prev is None:
                raise ValueError(
                    'encoder_append segmem requires targets_prev')
            enc = jnp.concatenate(
                [enc, self.compute_segmem(targets_prev)], axis=1)
        return enc

    # ---- teacher-forced decode (training) ----

    def decode_hidden(self, encoder_out: jnp.ndarray,
                      decoder_input_ids: jnp.ndarray,
                      decoder_embeds_prefix: Optional[jnp.ndarray] = None,
                      deterministic: bool = True) -> jnp.ndarray:
        embeds = self.token_embed(decoder_input_ids)
        strip = 0
        if decoder_embeds_prefix is not None:
            strip = decoder_embeds_prefix.shape[1]
            embeds = jnp.concatenate([decoder_embeds_prefix, embeds], axis=1)
        hidden = self.decoder(embeds, encoder_out=encoder_out,
                              deterministic=deterministic)
        if strip:
            hidden = hidden[:, strip:]
        return hidden

    def __call__(self, mel: jnp.ndarray,
                 decoder_input_ids: Optional[jnp.ndarray] = None,
                 labels: Optional[jnp.ndarray] = None,
                 targets_prev: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """Teacher-forced forward -> logits (B, L, vocab).

        Matches reference forward() of the corresponding model class; the
        loss lives in the training task, not the model
        (reference: models/t5.py:182-249).
        """
        cfg = self.cfg
        if decoder_input_ids is None:
            if labels is None:
                raise ValueError('need decoder_input_ids or labels')
            decoder_input_ids = shift_right(
                labels, cfg.decoder_start_token_id, cfg.pad_token_id)

        if cfg.segmem_variant in ('decoder_prepend', 'encoder_append') \
                and targets_prev is None:
            # batch-internal memory: row b remembers row b-1's tokens
            # (reference: models/t5_segmem.py:125-132)
            targets_prev = batch_internal_segmem_ids(decoder_input_ids)

        enc = self.encode_audio(mel, deterministic=deterministic)
        prefix = None
        if cfg.segmem_variant == 'encoder_append':
            enc = jnp.concatenate(
                [enc, self.compute_segmem(targets_prev)], axis=1)
        elif cfg.segmem_variant == 'decoder_prepend':
            prefix = self.compute_segmem(targets_prev)

        hidden = self.decode_hidden(
            enc, decoder_input_ids, decoder_embeds_prefix=prefix,
            deterministic=deterministic)
        return self.lm_head(hidden)

    # ---- incremental decoding with KV cache ----

    def precompute_cross_kv(self, encoder_out: jnp.ndarray) -> Dict[str, Any]:
        """Per-layer cross-attention K/V from the encoder output."""
        ks, vs = [], []
        for block in self.decoder.blocks:
            k, v = block.cross_attn.project_kv(encoder_out)
            ks.append(k)
            vs.append(v)
        return {'k': jnp.stack(ks), 'v': jnp.stack(vs)}

    def decode_step(self, tokens: jnp.ndarray, position: jnp.ndarray,
                    self_kv: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],
                    cross_kv: Dict[str, Any]) -> Tuple[jnp.ndarray, Tuple]:
        """One greedy-decode step.

        tokens: (B,) current input token ids.
        position: scalar int32 — decode position (0-based).
        self_kv: per-layer ((B, max_len, H, Dk) k, v) pairs. A flat tuple
          pytree (not a stacked array) so the while-loop carry aliases each
          layer's buffer in place — stacking would copy the whole cache
          every step.
        cross_kv: precompute_cross_kv output.

        Returns (logits (B, vocab), updated self_kv).
        """
        cfg = self.cfg
        x = self.token_embed(tokens[:, None])  # (B, 1, D)
        x = x + jax.lax.dynamic_slice_in_dim(
            self.decoder.pos_table, position, 1, 0).astype(x.dtype)

        max_len = self_kv[0][0].shape[1]
        # mask out cache slots after the current position; (1,1,1,max_len)
        # broadcasts over (B, H, 1 query, max_len keys)
        pos_idx = jnp.arange(max_len)
        step_mask = jnp.where(pos_idx <= position, 0.0,
                              -1e9).astype(x.dtype)[None, None, None, :]

        new_kv = []
        for i, block in enumerate(self.decoder.blocks):
            k_cache, v_cache = self_kv[i]
            h = block.self_norm(x)
            k_step, v_step = block.self_attn.project_kv(h)
            k_all = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k_step, position, axis=1)
            v_all = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v_step, position, axis=1)
            new_kv.append((k_all, v_all))
            attn = block.self_attn.attend(h, k_all, v_all, step_mask)
            x = x + attn
            h = block.cross_norm(x)
            x = x + block.cross_attn.attend(h, cross_kv['k'][i],
                                            cross_kv['v'][i], None)
            x = x + block.ff(block.ff_norm(x), deterministic=True)
        x = self.decoder.final_norm(x)
        logits = self.lm_head(x)[:, 0]
        return logits, tuple(new_kv)

    def init_cache(self, batch_size: int, max_len: int):
        cfg = self.cfg
        shape = (batch_size, max_len, cfg.num_heads, cfg.d_kv)
        dtype = cfg.activation_dtype
        return tuple((jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                     for _ in range(cfg.num_decoder_layers))

    def prefill_cache(self, prefix_embeds: jnp.ndarray,
                      self_kv: Tuple[jnp.ndarray, jnp.ndarray],
                      cross_kv: Dict[str, Any]) -> Tuple:
        """Run a decoder-input prefix through the stack, filling cache slots
        [0, P).

        Used by the v1 segmem decode where the memory embedding is
        *prepended* to the decoder inputs (reference:
        models/t5_segmem.py:207-213); the prefix occupies positions 0..P-1
        and generated tokens continue at position P.
        """
        p = prefix_embeds.shape[1]
        x = prefix_embeds + self.decoder.pos_table[:p].astype(
            prefix_embeds.dtype)
        causal = jnp.tril(jnp.ones((p, p), dtype=bool))
        mask = jnp.where(causal, 0.0, -1e9).astype(x.dtype)
        new_kv = []
        for i, block in enumerate(self.decoder.blocks):
            k_cache, v_cache = self_kv[i]
            h = block.self_norm(x)
            k, v = block.self_attn.project_kv(h)
            new_kv.append((
                jax.lax.dynamic_update_slice_in_dim(k_cache, k, 0, axis=1),
                jax.lax.dynamic_update_slice_in_dim(v_cache, v, 0, axis=1)))
            x = x + block.self_attn.attend(h, k, v, mask)
            h = block.cross_norm(x)
            x = x + block.cross_attn.attend(h, cross_kv['k'][i],
                                            cross_kv['v'][i], None)
            x = x + block.ff(block.ff_norm(x), deterministic=True)
        return tuple(new_kv)


def batch_internal_segmem_ids(decoder_input_ids: jnp.ndarray) -> jnp.ndarray:
    """Row b's memory = row b-1's (left-shifted) ids; row 0 gets [1, 0, ...].

    (reference: models/t5_segmem.py:125-132)
    """
    b, l = decoder_input_ids.shape
    shifted = jnp.concatenate(
        [decoder_input_ids[:, 1:],
         jnp.zeros((b, 1), dtype=decoder_input_ids.dtype)], axis=1)
    dummy = jnp.zeros((1, l), dtype=decoder_input_ids.dtype).at[0, 0].set(1)
    return jnp.concatenate([dummy, shifted[:-1]], axis=0)
