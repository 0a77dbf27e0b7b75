"""Greedy autoregressive decoding as compiled TPU loops.

The reference decodes by re-running the whole decoder over the growing
sequence every step with no KV cache (reference: models/t5.py:267-295,
config use_cache=False), and the segmem models additionally loop segments
one-by-one in Python (reference: models/t5_segmem_v2_with_prev.py:241-294).

Here both loops are on-device:
  * greedy_decode — jax.lax.while_loop over decode positions with a KV
    cache and all-finished early exit; one compilation serves every song
    (static shapes: max_length tokens, fixed segment count per batch).
  * segmem_greedy_decode — jax.lax.scan over the segment axis carrying the
    previous segment's decoded tokens (the sequential memory chain), with
    the *batch* dimension free for multiple songs in lockstep.

Outputs match the reference token-stream format: position 0 is the decoder
start token, finished rows pad with pad_token_id, EOS is included.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mr_mt3_tpu.models.config import MT3Config
from mr_mt3_tpu.models.mt3 import MT3
from mr_mt3_tpu.ops.fast_decode import (
    greedy_loop_fast,
    run_phased_decode,
    stack_decode_params,
)


def _greedy_loop(model: MT3, variables, encoder_out: jnp.ndarray,
                 max_length: int,
                 decoder_prefix_embeds: Optional[jnp.ndarray] = None,
                 valid_mask: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
    """Shared decode loop. encoder_out: (B, Lenc, D) -> tokens (B, max_length+1).

    With decoder_prefix_embeds (B, P, D), the prefix is prefilled into the
    KV cache and generation starts at position P (v1 segmem semantics).
    """
    cfg = model.cfg
    batch = encoder_out.shape[0]
    prefix_len = (0 if decoder_prefix_embeds is None
                  else decoder_prefix_embeds.shape[1])
    cross_kv = model.apply(variables, encoder_out,
                           method=MT3.precompute_cross_kv)

    # Phase-chunked cache growth: early steps attend over a short cache and
    # the cache is padded out between phases. Full-length decodes touch
    # ~40% less KV traffic; typical decodes (EOS long before max_length)
    # never pay for the full window at all.
    phases = [p for p in (256, 512) if p < max_length] + [max_length]

    cache = model.apply(variables, batch, phases[0] + prefix_len,
                        method=MT3.init_cache)
    if prefix_len:
        cache = model.apply(variables, decoder_prefix_embeds, cache,
                            cross_kv, method=MT3.prefill_cache)
    tokens = jnp.full((batch, max_length + 1), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    finished = (jnp.zeros((batch,), bool) if valid_mask is None
                else jnp.logical_not(valid_mask))

    def body(state):
        i, tokens, cache, finished = state
        cur = jax.lax.dynamic_slice(tokens, (0, i), (batch, 1))[:, 0]
        logits, cache = model.apply(variables, cur, i + prefix_len, cache,
                                    cross_kv, method=MT3.decode_step)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # finished rows emit pad; EOS marks a row finished
        # (reference: models/t5.py:286-295)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        finished = finished | (nxt == cfg.eos_token_id)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
        return i + 1, tokens, cache, finished

    return run_phased_decode(
        (jnp.int32(0), tokens, cache, finished), phases, body,
        pad_cache=lambda c, d: jax.tree.map(
            lambda a: jnp.pad(a, ((0, 0), (0, d), (0, 0), (0, 0))), c),
        cache_len=lambda b: b + prefix_len)


def greedy_decode(model: MT3, variables, mel: jnp.ndarray,
                  max_length: int = 1024,
                  use_fast: bool = True,
                  quantize: str = 'none',
                  valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Vanilla MT3 transcription decode.

    mel: (B, frames, mel_bins) -> tokens (B, max_length + 1) with leading
    start token, matching the reference's generate() output layout.
    use_fast selects the scan-over-layers decode body (identical outputs,
    much smaller compiled program); the module-path loop remains for
    debugging and the decoder_prepend variant. quantize:
      'int8'    — FF + lm_head weights through fused Pallas dequant
                  kernels (memory mode; measured slower at batch 8,
                  neutral at 64 — PERF.md);
      'int8_kv' — the self/cross KV caches in int8 with a Pallas dequant
                  attention kernel (the KV cache dominates traffic at
                  large batch);
      'fused'   — the whole-decoder Pallas megakernel with int8 weights
                  AND int8 KV in a single launch per step
                  (ops/fused_decode.py); batches beyond 8 rows run as
                  groups-of-8 in one trace and aggregate throughput
                  IMPROVES with batch (PERF.md). All perturb logits
                  slightly.
      'fused_bf16' — the same megakernel UNQUANTIZED: bf16 weights and
                  bf16 KV, bf16 MXU contractions with f32 accumulation —
                  the XLA bf16 body's numerics class at megakernel
                  launch cost (a middle tier between 'none' and 'fused').
      'fused_int4' — the megakernel with int4 weights AND int4 KV:
                  halves the HBM bytes the bandwidth-saturated kernel
                  streams (PERF.md roofline) at ~18x the int8 rounding
                  error; guarded by the probe ladder (int4 -> int8 ->
                  bf16 -> exact).
    """
    if quantize not in ('none', 'int8', 'int8_kv', 'fused',
                        'fused_bf16', 'fused_int4'):
        raise ValueError(f'unknown quantize mode: {quantize!r}')
    if not use_fast and quantize != 'none':
        # argument check BEFORE the encoder pass — in an eager call the
        # encoder is the most expensive op in this function
        raise ValueError('quantize is only supported with use_fast=True')
    encoder_out = model.apply(variables, mel, method=MT3.encode_audio)
    if use_fast:
        dp = stack_decode_params(
            variables['params'], model.cfg,
            quantize=quantize if quantize in (
                'int8', 'fused', 'fused_bf16', 'fused_int4') else 'none')
        return greedy_loop_fast(model.cfg, dp, encoder_out, max_length,
                                quantize=quantize, valid_mask=valid_mask)
    return _greedy_loop(model, variables, encoder_out, max_length,
                        valid_mask=valid_mask)


def make_greedy_decode_fn(model: MT3, max_length: int = 1024):
    """Jitted greedy decode with donated nothing and static shapes."""
    @jax.jit
    def fn(variables, mel):
        return greedy_decode(model, variables, mel, max_length)
    return fn


def initial_segmem_tokens(cfg: MT3Config, batch: int,
                          max_length: int,
                          codec=None, vocab=None) -> jnp.ndarray:
    """Memory seed for the first segment.

    v2-with-prev seeds with [tie, EOS, pad...] in model space (encoded 1134,
    1 for the standard vocab — reference:
    models/t5_segmem_v2_with_prev.py:246-259); v1/v2 seed with [EOS, pad...]
    (reference: models/t5_segmem.py:193-197, t5_segmem_v2.py:189-195).
    The tie id is derived from the codec + vocabulary (pass them for
    non-default VocabularyConfigs; the default codec is built otherwise).
    """
    mem = jnp.zeros((batch, max_length), jnp.int32)
    if cfg.segmem_variant == 'encoder_append' and \
            cfg.segmem_seed == 'tie_eos':
        if codec is None:
            from mr_mt3_tpu.codec import VocabularyConfig, build_codec
            codec = build_codec(VocabularyConfig(num_velocity_bins=1))
        if vocab is None:
            from mr_mt3_tpu.codec import vocabulary_from_codec
            vocab = vocabulary_from_codec(codec)
        from mr_mt3_tpu.codec import Event
        tie_id = (codec.encode_event(Event(type='tie', value=0))
                  + vocab.num_special_tokens())
        mem = mem.at[:, 0].set(tie_id).at[:, 1].set(cfg.eos_token_id)
    else:
        mem = mem.at[:, 0].set(cfg.eos_token_id)
    return mem


def segmem_greedy_decode(model: MT3, variables, mel_segments: jnp.ndarray,
                         max_length: int = 1024,
                         initial_memory: Optional[jnp.ndarray] = None,
                         codec=None, vocab=None,
                         quantize: str = 'none',
                         valid_mask: Optional[jnp.ndarray] = None,
                         chain_memory: bool = True,
                         memory_format: str = 'reference',
                         oracle_memory: Optional[jnp.ndarray] = None,
                         ) -> jnp.ndarray:
    """Sequential segment-memory decode over one or more songs in lockstep.

    mel_segments: (B, S, frames, mel_bins) — S consecutive segments per song.
    Returns tokens (B, S, max_length + 1) with leading start token per
    segment. Segment i's memory is segment i-1's decoded tokens (start token
    included, as in the reference where `decoder_tokens` begins with the
    start id — reference: models/t5_segmem_v2_with_prev.py:241-294).

    chain_memory=False is a DIAGNOSTIC ablation (no reference analog):
    every segment sees the initial seed memory instead of the previous
    segment's decode, so the outputs are independent of segment order.
    Comparing F1 with/without the chain isolates how much information the
    carried memory contributes at decode time — distinguishing "the chain
    propagates decode errors" (exposure bias: ablated >= chained) from
    "the chain carries nothing" (ablated == chained exactly) and from a
    carry defect.

    memory_format selects the layout of the CARRIED memory tokens:
      'reference'     — segment i-1's tokens INCLUDING the leading decoder
                        start id (the reference's decode behavior, above);
      'train_aligned' — the start id is dropped, so the memory looks
                        exactly like training's targets_prev ([tok...,
                        EOS, pad...] — reference feeds targets_prev with
                        no start id at train time:
                        models/t5_segmem_v2_with_prev.py:74,118-123).
                        The reference thus shifts every memory token one
                        position at decode relative to training — a
                        train/decode distribution mismatch this knob
                        isolates (benchmarks/dev_segmem_ablation.py).

    oracle_memory (B, S, max_length) is a DIAGNOSTIC: segment i's memory
    is taken from oracle_memory[:, i] verbatim (ground-truth prev-segment
    tokens in whichever format the caller built), bypassing both the
    chain and the seed — the exposure-bias upper bound.
    """
    if memory_format not in ('reference', 'train_aligned'):
        raise ValueError(f'unknown memory_format: {memory_format!r}')
    cfg = model.cfg
    b, s = mel_segments.shape[:2]
    if quantize not in ('none', 'int8', 'int8_kv', 'fused',
                        'fused_bf16', 'fused_int4'):
        raise ValueError(f'unknown quantize mode: {quantize!r}')
    use_fast = cfg.segmem_variant != 'decoder_prepend'
    if not use_fast and quantize != 'none':
        raise ValueError(
            'quantize is not supported for decoder_prepend models')
    dp = (stack_decode_params(
        variables['params'], cfg,
        quantize=quantize
        if quantize in ('int8', 'fused', 'fused_bf16', 'fused_int4')
        else 'none')
        if use_fast else None)
    # encode all segments in one batched pass (the reference also encodes
    # up-front: models/t5_segmem_v2_with_prev.py:228-233)
    flat = mel_segments.reshape((b * s,) + mel_segments.shape[2:])
    enc = model.apply(variables, flat, method=MT3.encode_audio)
    enc = enc.reshape((b, s) + enc.shape[1:])
    enc = jnp.moveaxis(enc, 1, 0)  # (S, B, Lenc, D) for scan

    if initial_memory is None:
        initial_memory = initial_segmem_tokens(cfg, b, max_length,
                                               codec=codec, vocab=vocab)

    def seg_step(mem_tokens, xs):
        if oracle_memory is not None:
            enc_i, mem_in = xs
        else:
            enc_i, mem_in = xs, mem_tokens
        segmem = model.apply(variables, mem_in,
                             method=MT3.compute_segmem)  # (B, L_agg, D)
        if cfg.segmem_variant == 'encoder_append':
            enc_aug = jnp.concatenate([enc_i, segmem], axis=1)
            tokens = greedy_loop_fast(cfg, dp, enc_aug, max_length,
                                      quantize=quantize,
                                      valid_mask=valid_mask)
        elif cfg.segmem_variant == 'decoder_prepend':
            # v1: memory becomes a decoder-input prefix, prefilled into the
            # KV cache (reference: models/t5_segmem.py:207-236 generate_2)
            tokens = _greedy_loop(model, variables, enc_i, max_length,
                                  decoder_prefix_embeds=segmem,
                                  valid_mask=valid_mask)
        else:
            tokens = greedy_loop_fast(cfg, dp, enc_i, max_length,
                                      quantize=quantize,
                                      valid_mask=valid_mask)
        # next memory = this segment's tokens cropped to max_length: with
        # the start id in 'reference' format (reference pads/crops to
        # max_length), without it in 'train_aligned'
        if not chain_memory:
            mem_next = mem_tokens
        elif memory_format == 'train_aligned':
            mem_next = tokens[:, 1:max_length + 1]
        else:
            mem_next = tokens[:, :max_length]
        return mem_next, tokens

    xs = (enc, jnp.moveaxis(oracle_memory, 1, 0)) \
        if oracle_memory is not None else enc
    _, all_tokens = jax.lax.scan(seg_step, initial_memory, xs)
    return jnp.moveaxis(all_tokens, 0, 1)  # (B, S, max_length + 1)


def make_segmem_decode_fn(model: MT3, max_length: int = 1024):
    @jax.jit
    def fn(variables, mel_segments, initial_memory=None):
        return segmem_greedy_decode(model, variables, mel_segments,
                                    max_length, initial_memory)
    return fn
