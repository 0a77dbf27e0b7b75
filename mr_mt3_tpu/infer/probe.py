"""Quantized-decode safety probe.

The megakernel's zero-flip evidence is from the overfit parity model
(PERF.md); a real checkpoint with near-uniform logits can flip tokens —
and F1 — silently (measured: 413/3075 flips on random 46M weights). This
probe decodes a deterministic music-like batch through a handler's
quantized path AND an exact-bf16 twin and counts token flips, so callers
(serve.py startup, eval's quantize='auto') can fall back before trusting
quantized numerics on the actual weights being served.
"""

from __future__ import annotations

import numpy as np


def probe_audio(num_segments: int = 2, sample_rate: int = 16000
                ) -> np.ndarray:
    """The canonical deterministic probe signal: a chord + percussion-ish
    bursts, so logits are exercised on music-like (not silent) input.
    Shared by the quantize guard and serving prewarm so the warmed
    program sees the same numerics the guard validated.

    Sized 64 samples SHORT of an exact hop multiple: the frontend pads a
    full extra hop when the length divides the hop (bug-compat with the
    reference's pad_end framing), so an exact multiple would gain a
    whole extra all-padding segment and every probe would decode one
    pow2 bucket more rows than asked for."""
    n = num_segments * 256 * 128 - 64
    t = np.arange(n, dtype=np.float32) / sample_rate
    audio = (0.2 * np.sin(2 * np.pi * 261.63 * t)      # C4
             + 0.2 * np.sin(2 * np.pi * 329.63 * t)    # E4
             + 0.15 * np.sin(2 * np.pi * 392.0 * t))   # G4
    burst = (np.arange(n) % (sample_rate // 2)) < 800  # 2 Hz clicks
    audio = audio + 0.3 * burst * np.sin(2 * np.pi * 1200 * t)
    return audio.astype(np.float32)


def probe_mel(handler, num_segments: int = 2) -> np.ndarray:
    """probe_audio through the handler's frontend -> mel
    (num_segments, 256, 512)."""
    segments, _, valid = handler._audio_to_segments(
        probe_audio(num_segments, handler.SAMPLE_RATE))
    return handler._compute_mel(segments, valid)


# Ladder probes run at a SHORT max_length: program startup on this
# platform scales with program size (a 1024-step decode carries 3 cache
# phases and 4x the loop trip count), and short flip-counts reject the
# losing tiers just as well — random/near-uniform weights flip within
# the first tokens (measured ladder: int4 1740/3075 flips — PERF.md).
# The short probe alone is NOT the whole guard: quantized-KV attention
# error is not position-independent (more cached positions, more
# accumulated rounding), and a full-length program can hit compile
# ceilings (VMEM) the short program never sees. So once a quantized
# tier probes clean at the short length, resolve_auto_quantize runs ONE
# full-length confirm probe on it — the same two full-length programs
# (quant + exact twin) the pre-short-probe guard always paid — and any
# flip or compile failure there demotes as usual. Net: losing tiers pay
# only short programs (the 1.9x time-to-ready win on a full ladder
# walk, PERF.md), while the winner is still guarded end-to-end at the
# serving length.
PROBE_MAX_LENGTH = 256


def _probe_twin(handler, quantize: str, max_length: int):
    """A handler sharing `handler`'s weights/config but with the given
    quantize mode and (short) decode length."""
    from mr_mt3_tpu.infer.handler import InferenceHandler
    return InferenceHandler(
        model=handler.model, variables=handler.variables,
        mel_norm=handler.mel_norm,
        contiguous_inference=handler.contiguous_inference,
        batch_size=handler.batch_size, max_length=max_length,
        segment_bucket=handler.segment_bucket, quantize=quantize,
        mesh=handler.mesh)


def quantize_probe(handler, max_length: int = None):
    """Decode the probe batch through the handler's quantized path AND an
    exact-bf16 twin at the same length; return
    (flipped_tokens, total_tokens). max_length=None means the short
    ladder length (min(handler.max_length, PROBE_MAX_LENGTH));
    resolve_auto_quantize passes handler.max_length for the winner's
    full-length confirm.

    The exact-side tokens are cached on the handler per decode length:
    they depend only on the weights and config, which do not change
    across the demotion ladder's re-probes, so each further tier pays
    only its own quantized decode — not a rebuilt exact twin (the
    ladder alternates short probes and full confirms, hence a
    shape-keyed dict rather than a single slot)."""
    max_length = (min(handler.max_length, PROBE_MAX_LENGTH)
                  if max_length is None else max_length)
    mel = probe_mel(handler)
    quant = _probe_twin(handler, handler.quantize,
                        max_length)._decode_all(mel)
    cache = getattr(handler, '_probe_exact_tokens', None)
    if cache is None:
        cache = handler._probe_exact_tokens = {}
    exact = cache.get(quant.shape)
    if exact is None:
        exact = _probe_twin(handler, 'none', max_length)._decode_all(mel)
        cache[quant.shape] = exact
    return int(np.sum(quant != exact)), int(quant.size)


def margin_stats(handler, max_length: int = None) -> dict:
    """Top1-minus-top2 logit margins of the EXACT decode on the probe
    batch — the measured MECHANISM behind tier demotions.

    The fused tiers re-order bf16 accumulations vs the XLA body, so a
    decoded token flips when its logit margin is within that numeric
    noise (~1e-2 of logit scale); a checkpoint demotes because its
    margins are thin, not because quantization is 'broken' (round 4: the
    UNQUANTIZED fused_bf16 kernel flipped 68/514 probe tokens on a
    converged checkpoint — more than int4's 62 — PERF.md). This reports
    the margin distribution so a demotion comes with its cause.

    Rescoring is teacher-forced on the exact decode's own tokens: the
    greedy path's per-step distributions are exactly reproduced (same
    conditioning), one parallel forward instead of a serial loop. For
    contiguous segmem handlers the carried memory is reconstructed from
    the decoded tokens in the handler's memory format. Margins use only
    positions up to each row's EOS. Returns {margin_min, margin_p1,
    margin_p5, margin_median, tokens, teacher_forced_agreement} (margins
    in logit units, fp32 stats over the model-dtype forward) or
    {'error': ...} if the handler has no teacher-forced surface for its
    decode mode."""
    import jax
    import jax.numpy as jnp

    cfg = handler.cfg
    if cfg.segmem_variant == 'decoder_prepend':
        return {'error': 'decoder_prepend probe margins unsupported'}
    max_length = (min(handler.max_length, PROBE_MAX_LENGTH)
                  if max_length is None else max_length)
    mel = probe_mel(handler)
    cache = getattr(handler, '_probe_exact_tokens', {})
    exact = None
    for toks in cache.values():
        if toks.shape[1] == max_length + 1:
            exact = toks
    if exact is None:
        exact = _probe_twin(handler, 'none', max_length)._decode_all(mel)
    tokens = np.asarray(exact)                    # (N, L+1), col 0 start id
    n = tokens.shape[0]

    kwargs = {}
    if cfg.segmem_variant == 'encoder_append':
        # BOTH decode modes chain the probe's segments as one song
        # (contiguous lockstep, and _decode_segmem_chained's per-batch
        # chains) — rebuild the memory each segment actually saw from the
        # decode's own outputs, in the handler's memory format
        from mr_mt3_tpu.ops.decode import initial_segmem_tokens
        seed = np.asarray(initial_segmem_tokens(
            cfg, 1, max_length, codec=handler.codec,
            vocab=handler.vocab))
        if handler.segmem_memory_format == 'train_aligned':
            carried = tokens[:-1, 1:max_length + 1]
        else:
            carried = tokens[:-1, :max_length]
        kwargs['targets_prev'] = jnp.asarray(
            np.concatenate([seed, carried], axis=0))

    logits = handler.model.apply(
        handler.variables, jnp.asarray(mel),
        decoder_input_ids=jnp.asarray(tokens[:, :-1]), **kwargs)
    top2 = jax.lax.top_k(logits.astype(jnp.float32), 2)[0]
    margins = np.asarray(top2[..., 0] - top2[..., 1])   # (N, L)
    greedy = np.asarray(jnp.argmax(logits, axis=-1))

    # valid decode positions: up to and including each row's first EOS
    targets = tokens[:, 1:]
    L = targets.shape[1]
    eos_pos = np.where((targets == cfg.eos_token_id).any(axis=1),
                       (targets == cfg.eos_token_id).argmax(axis=1), L - 1)
    valid = np.arange(L)[None, :] <= eos_pos[:, None]
    m = margins[valid]
    agree = float((greedy[valid] == targets[valid]).mean())
    return {
        'margin_min': round(float(m.min()), 4),
        'margin_p1': round(float(np.quantile(m, 0.01)), 4),
        'margin_p5': round(float(np.quantile(m, 0.05)), 4),
        'margin_median': round(float(np.quantile(m, 0.5)), 4),
        'tokens': int(m.size),
        'teacher_forced_agreement': round(agree, 4),
    }


# demotion ladder, top to bottom: int4 megakernel (the TPU serving
# default — halved streamed bytes on the bandwidth-saturated kernel) ->
# int8 megakernel -> UNQUANTIZED bf16 megakernel (same launch structure,
# exact-numerics class, still ~2x the XLA body at small batch) -> exact
# XLA body. Every other quantized mode falls straight to 'none'.
_NEXT_TIER = {'fused_int4': 'fused', 'fused': 'fused_bf16'}


def resolve_auto_quantize(handler, verbose: bool = True,
                          probe_fn=None, confirm_full: bool = True,
                          with_margins: bool = False) -> dict:
    """Probe-guard a handler whose quantize mode is set: any token flip —
    or any probe failure — demotes it one tier ('fused_int4' -> 'fused'
    -> 'fused_bf16' -> 'none'; other modes -> 'none') and re-probes until
    a tier matches exact bf16 token-for-token (or 'none' is reached).
    A tier that probes clean at the short ladder length is then
    confirmed with one probe at the FULL serving length (see the
    PROBE_MAX_LENGTH note: quantized-KV error grows with cache
    occupancy, and full-length programs can hit compile ceilings short
    ones cannot see); a confirm flip or failure demotes the same way.
    Returns an info dict {quantize, probe_flips, probe_tokens,
    probe_tier[, confirm_flips, confirm_tokens, probe_error, demotions]};
    probe_flips/probe_tokens are from the LAST probe that ran, and
    probe_tier names the tier they measured (on a flip-demotion to
    'none' that is the losing tier, not the final one). Counts are
    cleared before each probe attempt, so a tier whose probe RAISES
    never inherits an earlier tier's counts (serve's /healthz would
    present them as evidence for a path they never measured).

    probe_fn: override for the probe (serve.py passes its own
    monkeypatchable entry point). It is called as probe_fn(handler) for
    short ladder probes and probe_fn(handler, max_length=N) for the
    full-length confirm.
    confirm_full=False skips the winner's full-length confirm (callers
    that only ever decode at or below PROBE_MAX_LENGTH).
    with_margins=True attaches margin_stats() of the exact decode as
    info['exact_margins'] whenever a flip demotion happened on real
    weights — the mechanism readout (one extra teacher-forced forward;
    off by default; callers that stub probe_fn must leave it off)."""
    info = {'quantize': handler.quantize}
    if handler.quantize == 'none':
        return info

    def demote(reason: str, to: str = None):
        nxt = to if to is not None else _NEXT_TIER.get(handler.quantize,
                                                       'none')
        if verbose:
            print(f'quantize={handler.quantize!r} demoted to {nxt!r}: '
                  f'{reason}')
        handler.quantize = nxt
        handler._invalidate_compiled()
        info.setdefault('demotions', []).append(reason)

    if handler.cfg.segmem_variant == 'decoder_prepend':
        # no megakernel path at all for the v1 decoder-prepend prefill —
        # straight to exact numerics, skipping the ladder
        demote('decoder_prepend models have no quantized decode path',
               to='none')
        info['quantize'] = 'none'
        return info
    while handler.quantize != 'none':
        # stale-evidence guard: drop the previous tier's counts before
        # probing, so an exception path can't leave them attributed to a
        # tier that never measured them
        for k in ('probe_flips', 'probe_tokens', 'probe_tier',
                  'confirm_flips', 'confirm_tokens', 'probe_error'):
            info.pop(k, None)
        try:
            flips, total = (probe_fn or quantize_probe)(handler)
        except Exception as e:  # the guard must never crash the caller
            info['probe_error'] = repr(e)[:200]
            demote(f'probe failed ({e!r})')
            continue
        info['probe_flips'] = flips
        info['probe_tokens'] = total
        info['probe_tier'] = handler.quantize
        if flips:
            demote(f'{flips}/{total} probe tokens flipped vs exact bf16')
            continue
        if confirm_full and handler.max_length > PROBE_MAX_LENGTH:
            try:
                cflips, ctotal = (probe_fn or quantize_probe)(
                    handler, max_length=handler.max_length)
            except Exception as e:
                info['probe_error'] = repr(e)[:200]
                demote(f'full-length confirm failed ({e!r})')
                continue
            info['confirm_flips'] = cflips
            info['confirm_tokens'] = ctotal
            if cflips:
                demote(f'{cflips}/{ctotal} tokens flipped vs exact bf16 '
                       f'at full length {handler.max_length}')
                continue
        break
    info['quantize'] = handler.quantize
    if with_margins and info.get('demotions'):
        # demotions happened on real weights: attach the margin
        # distribution of the exact decode so the demotion reports its
        # mechanism (thin margins vs fused-kernel numeric noise), not
        # just its fact. Advisory only — never let it break the guard.
        try:
            info['exact_margins'] = margin_stats(handler)
            if verbose:
                print(f'exact-decode margins: {info["exact_margins"]}')
        except Exception as e:
            info['exact_margins'] = {'error': repr(e)[:200]}
    return info
