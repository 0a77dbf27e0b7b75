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


def quantize_probe(handler, max_length: int = None, classify: bool = False):
    """Decode the probe batch through the handler's quantized path AND an
    exact-bf16 twin at the same length; return
    (flipped_tokens, total_tokens), or — with classify=True — a dict
    {flips, total} merged with classify_flips()'s mechanism readout
    (material vs benign first-flip classification; one extra
    teacher-forced forward per dtype). max_length=None means the short
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
    flips, total = int(np.sum(quant != exact)), int(quant.size)
    if not classify:
        return flips, total
    out = {'flips': flips, 'total': total}
    if flips:
        try:
            out.update(classify_flips(handler, quant, exact, mel))
        except Exception as e:
            # classification is a refinement, not the guard: without it
            # the caller treats every flip as material (strict fallback)
            out['classify_error'] = repr(e)[:200]
    return out


def _teacher_forced_margins(handler, mel, tokens, dtype: str = None):
    """Top1-minus-top2 margins + greedy argmax of a teacher-forced
    forward over the exact decode's own tokens (identical conditioning
    to the greedy loop, one parallel forward). For contiguous segmem
    handlers the carried memory is reconstructed from the decoded
    tokens in the handler's memory format. dtype overrides the model's
    compute dtype (the f32 twin used to calibrate numeric noise).
    Returns (margins (N, L) np.float32, greedy (N, L) np, valid (N, L)
    bool) — valid marks positions up to each row's first EOS."""
    import jax
    import jax.numpy as jnp

    cfg = handler.cfg
    model = handler.model
    if dtype is not None and dtype != cfg.dtype:
        from mr_mt3_tpu.models import MT3
        model = MT3(cfg.replace(dtype=dtype))
    tokens = np.asarray(tokens)                   # (N, L+1), col 0 start id
    kwargs = {}
    if cfg.segmem_variant == 'encoder_append':
        from mr_mt3_tpu.ops.decode import initial_segmem_tokens
        L = tokens.shape[1] - 1
        seed = np.asarray(initial_segmem_tokens(
            cfg, 1, L, codec=handler.codec, vocab=handler.vocab))
        if handler.segmem_memory_format == 'train_aligned':
            carried = tokens[:-1, 1:L + 1]
        else:
            carried = tokens[:-1, :L]
        kwargs['targets_prev'] = jnp.asarray(
            np.concatenate([seed, carried], axis=0))
    logits = model.apply(
        handler.variables, jnp.asarray(mel),
        decoder_input_ids=jnp.asarray(tokens[:, :-1]), **kwargs)
    top2 = jax.lax.top_k(logits.astype(jnp.float32), 2)[0]
    margins = np.asarray(top2[..., 0] - top2[..., 1])   # (N, L)
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    targets = tokens[:, 1:]
    L = targets.shape[1]
    eos_pos = np.where((targets == cfg.eos_token_id).any(axis=1),
                       (targets == cfg.eos_token_id).argmax(axis=1), L - 1)
    valid = np.arange(L)[None, :] <= eos_pos[:, None]
    return margins, greedy, valid


# Material-flip calibration: a probe flip is MATERIAL when the exact
# path's own margin at the first divergence exceeds what numeric noise
# can move. The noise scale is measured per checkpoint (bf16-vs-f32
# margin delta on the same teacher-forced forward); the safety factor
# covers the quantized side's independent same-scale reassociation
# noise, and the floor guards degenerate all-zero deltas (f32 models).
MATERIAL_NOISE_SAFETY = 4.0
MATERIAL_MARGIN_FLOOR = 1e-3


def classify_flips(handler, quant, exact, mel) -> dict:
    """Classify free-running probe divergences by MECHANISM.

    The round-4 finding that motivates this (PERF.md): on a converged
    checkpoint the UNQUANTIZED fused_bf16 megakernel flipped MORE probe
    tokens (68/514) than int4 (62/514), and the resolved tier's held-out
    F1 exactly matched the exact path — the flips are bf16
    accumulation-ORDER noise resolving near-tie logits differently, not
    quantization damage. A flip-count guard cannot see that difference;
    this classifier can: a divergence whose first flip sits at a margin
    numeric noise can plausibly cross is BENIGN (two valid greedy
    samples of the same near-tie distribution); one whose margin
    exceeds the measured noise ceiling is MATERIAL (the quantized path
    overrode a confident decision — real numeric damage, e.g. int4
    rounding or accumulated quantized-KV error).

    Only each row's FIRST flip is classified: past it the two paths
    condition on different prefixes and position-wise comparison is
    meaningless. For contiguous segmem handlers the probe's rows form
    ONE chain (segment s's memory is segment s-1's output), so rows
    after the first diverged row are incomparable and counted as
    downstream_rows. This laxness is why the classifier is one layer of
    the guard, not the guard: the full-length confirm still runs, and
    eval/run_tier measure resolved-tier F1 against exact.

    Returns {material_rows, benign_rows, downstream_rows, rows,
    material_margin, margin_noise, first_flip_margins}."""
    quant = np.asarray(quant)
    exact = np.asarray(exact)
    margins, _, valid = _teacher_forced_margins(handler, mel, exact)
    margins_f32, _, _ = _teacher_forced_margins(handler, mel, exact,
                                                dtype='float32')
    noise = float(np.abs(margins - margins_f32)[valid].max())
    tau = max(MATERIAL_NOISE_SAFETY * noise, MATERIAL_MARGIN_FLOOR)
    diff = quant != exact                          # (N, L+1)
    chained = bool(handler.contiguous_inference
                   and handler.cfg.segmem_variant == 'encoder_append')
    out = {'material_rows': 0, 'benign_rows': 0, 'downstream_rows': 0,
           'rows': int(quant.shape[0]),
           'material_margin': round(tau, 5),
           'margin_noise': round(noise, 6),
           'first_flip_margins': []}
    upstream_diverged = False
    for r in range(quant.shape[0]):
        if not diff[r].any():
            continue
        if chained and upstream_diverged:
            out['downstream_rows'] += 1
            continue
        p = int(diff[r].argmax())                  # token coords; col 0 seed
        m = float(margins[r, p - 1]) if p >= 1 else float('inf')
        out['first_flip_margins'].append(round(m, 4))
        if m > tau:
            out['material_rows'] += 1
        else:
            out['benign_rows'] += 1
        if chained:
            upstream_diverged = True
    return out


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
    margins, greedy, valid = _teacher_forced_margins(handler, mel, tokens)
    m = margins[valid]
    agree = float((greedy[valid] == tokens[:, 1:][valid]).mean())
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

# Every per-probe info key resolve_auto_quantize can record; demotion
# paths (here and serve.prepare_handler's prewarm demotions) clear them
# so stale counts are never attributed to a tier that didn't measure
# them.
PROBE_INFO_KEYS = ('probe_flips', 'probe_tokens', 'probe_tier',
                   'probe_material_rows', 'probe_benign_rows',
                   'probe_downstream_rows', 'material_margin',
                   'margin_noise', 'first_flip_margins', 'classify_error',
                   'confirm_flips', 'confirm_tokens',
                   'confirm_material_rows', 'probe_error')


def resolve_auto_quantize(handler, verbose: bool = True,
                          probe_fn=None, confirm_full: bool = True,
                          with_margins: bool = False,
                          demote_on: str = 'material') -> dict:
    """Probe-guard a handler whose quantize mode is set: a MATERIAL token
    flip — or any probe failure — demotes it one tier ('fused_int4' ->
    'fused' -> 'fused_bf16' -> 'none'; other modes -> 'none') and
    re-probes until a tier survives (or 'none' is reached).
    A tier that survives the short ladder probe is then confirmed with
    one probe at the FULL serving length (see the PROBE_MAX_LENGTH note:
    quantized-KV error grows with cache occupancy, and full-length
    programs can hit compile ceilings short ones cannot see); a confirm
    material-flip or failure demotes the same way.

    demote_on selects the flip policy:
      * 'material' (default): flips are classified by classify_flips —
        a first-flip at a margin numeric noise can cross is BENIGN (the
        fused kernels' bf16 reassociation resolving a near-tie the
        other way; measured F1-neutral — PERF.md round 4/5) and does
        NOT demote; a flip at a margin above the measured noise ceiling
        is MATERIAL and demotes. Whenever classification is unavailable
        (legacy probe_fn returning (flips, total), or a classification
        error), EVERY flip is treated as material — the policy degrades
        to strict, never to lax.
      * 'any': the strict round-2 policy — any token flip demotes
        (exact-token-match serving; what the 'token-identical' parity
        claims are measured under).

    Returns an info dict {quantize, probe_flips, probe_tokens,
    probe_tier[, probe_material_rows, probe_benign_rows,
    probe_downstream_rows, material_margin, margin_noise,
    first_flip_margins, confirm_flips, confirm_tokens,
    confirm_material_rows, probe_error, demotions]};
    probe_flips/probe_tokens are from the LAST probe that ran, and
    probe_tier names the tier they measured (on a flip-demotion to
    'none' that is the losing tier, not the final one). Counts are
    cleared before each probe attempt, so a tier whose probe RAISES
    never inherits an earlier tier's counts (serve's /healthz would
    present them as evidence for a path they never measured).

    probe_fn: override for the probe (serve.py passes its own
    monkeypatchable entry point). It is called as probe_fn(handler) for
    short ladder probes and probe_fn(handler, max_length=N) for the
    full-length confirm; if it accepts a `classify` keyword (or **kw)
    it is asked for the classified dict under demote_on='material'.
    confirm_full=False skips the winner's full-length confirm (callers
    that only ever decode at or below PROBE_MAX_LENGTH).
    with_margins=True attaches margin_stats() of the exact decode as
    info['exact_margins'] whenever a flip demotion happened on real
    weights — the mechanism readout (one extra teacher-forced forward;
    off by default; callers that stub probe_fn must leave it off)."""
    import inspect

    info = {'quantize': handler.quantize}
    if handler.quantize == 'none':
        return info

    def accepts_classify(fn):
        try:
            params = inspect.signature(fn).parameters
        except (TypeError, ValueError):
            return False
        return ('classify' in params
                or any(p.kind == p.VAR_KEYWORD for p in params.values()))

    def run_probe(**kw):
        """One probe call -> (flips, total, material_or_None, extras).
        material is None when no classification is available."""
        fn = probe_fn or quantize_probe
        if demote_on == 'material' and accepts_classify(fn):
            try:
                return _unpack(fn(handler, classify=True, **kw))
            except TypeError:
                # a **kw wrapper in front of a classify-unaware probe
                # (e.g. a monkeypatched serving stub): retry plain —
                # the signature mismatch raises before any decode runs
                pass
        return _unpack(fn(handler, **kw))

    def _unpack(res):
        if isinstance(res, dict):
            extras = {k: v for k, v in res.items()
                      if k not in ('flips', 'total')}
            material = (res.get('material_rows')
                        if 'material_rows' in res else None)
            if res['flips'] and material is None:
                material = res['flips']   # classification failed: strict
            return res['flips'], res['total'], material, extras
        flips, total = res
        return flips, total, None, {}

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
        for k in PROBE_INFO_KEYS:
            info.pop(k, None)
        try:
            flips, total, material, extras = run_probe()
        except Exception as e:  # the guard must never crash the caller
            info['probe_error'] = repr(e)[:200]
            demote(f'probe failed ({e!r})')
            continue
        info['probe_flips'] = flips
        info['probe_tokens'] = total
        info['probe_tier'] = handler.quantize
        for k in ('material_rows', 'benign_rows', 'downstream_rows'):
            if k in extras:
                info[f'probe_{k}'] = extras[k]
        for k in ('material_margin', 'margin_noise', 'first_flip_margins',
                  'classify_error'):
            if k in extras:
                info[k] = extras[k]
        effective = material if material is not None else flips
        if effective:
            if material is not None and material != flips:
                demote(f'{material} material first-flip(s) '
                       f'(margin > {extras.get("material_margin")}) among '
                       f'{flips}/{total} flipped probe tokens vs exact bf16')
            else:
                demote(f'{flips}/{total} probe tokens flipped vs exact bf16')
            continue
        if flips and verbose:
            print(f'quantize={handler.quantize!r}: {flips}/{total} probe '
                  f'flips, all benign (first-flip margins '
                  f'{extras.get("first_flip_margins")} <= noise ceiling '
                  f'{extras.get("material_margin")}) — tier kept')
        if confirm_full and handler.max_length > PROBE_MAX_LENGTH:
            try:
                cflips, ctotal, cmaterial, cextras = run_probe(
                    max_length=handler.max_length)
            except Exception as e:
                info['probe_error'] = repr(e)[:200]
                demote(f'full-length confirm failed ({e!r})')
                continue
            info['confirm_flips'] = cflips
            info['confirm_tokens'] = ctotal
            if 'material_rows' in cextras:
                info['confirm_material_rows'] = cextras['material_rows']
            ceffective = cmaterial if cmaterial is not None else cflips
            if ceffective:
                if cmaterial is not None and cmaterial != cflips:
                    demote(f'{cmaterial} material first-flip(s) among '
                           f'{cflips}/{ctotal} flips at full length '
                           f'{handler.max_length}')
                else:
                    demote(f'{cflips}/{ctotal} tokens flipped vs exact '
                           f'bf16 at full length {handler.max_length}')
                continue
        break
    info['quantize'] = handler.quantize
    if with_margins and (info.get('demotions')
                         or info.get('probe_benign_rows')):
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
