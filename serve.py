"""Transcription server: long-lived process with a warm compiled model.

The reference has no serving story (transcription is a batch CLI); on TPU
the expensive parts — program startup and weight residency — are per
process, so production use wants a resident server. This exposes a minimal
HTTP API on the standard library only:

  POST /transcribe       body: WAV or FLAC bytes -> Standard MIDI File bytes
  POST /transcribe.json  body: audio             -> JSON note list
  GET  /healthz          -> {"status": "ok", ...}

Requests queue through a single device worker; segments from one request
batch together (and whole songs run in lockstep in contiguous mode).

Usage:
  python serve.py --port 8742 path=<checkpoint> [--config-name=... model=...]

Checkpoint/config grammar matches test.py; with no path, serves random
weights (plumbing/latency testing).
"""

import io
import json
import os
import sys
import threading
import time


def build_handler(argv):
    from mr_mt3_tpu.utils.config import load_config, parse_cli
    from mr_mt3_tpu.utils.profiling import (
        enable_compilation_cache,
        honor_platform_env,
    )

    args = [a for a in argv if not a.startswith('--port')]
    config_name, config_dir, overrides = parse_cli(args)
    default_dir = os.environ.get('MR_MT3_CONFIGS') or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'configs')
    cfg = load_config(config_dir or default_dir, config_name, overrides)
    honor_platform_env()
    enable_compilation_cache()

    from mr_mt3_tpu.infer import InferenceHandler
    from mr_mt3_tpu.utils import builders

    model = builders.build_model(cfg)
    if cfg.get('path'):
        params, _ = builders.load_weights(str(cfg.path), model)
        variables = {'params': params}
        mel_norm = 'pretrained/mt3.pth' not in str(cfg.path)
    else:
        print('WARNING: serving randomly initialized weights '
              '(no path= given)', file=sys.stderr)
        variables = {'params': builders.init_params(model)}
        mel_norm = True

    # the whole-decoder megakernel at int4 is the serving default on TPU
    # (the kernel is HBM-bandwidth-saturated, so int4's halved bytes are
    # the fastest tier: 184/200/236 RTF at B=8/B=64/segmem vs int8's
    # 168/176/196 same-session — PERF.md; zero token flips on the parity
    # model). eval.quantize=none opts back into exact bf16 numerics. (On
    # CPU the kernel would run interpreted — keep the XLA path there.)
    # prepare_handler() guards the default: any probe-token flip vs
    # exact bf16 demotes one tier (int4 -> int8 -> bf16 -> exact XLA)
    # before traffic is served.
    import jax
    on_tpu = jax.default_backend() == 'tpu'
    quantize = str(cfg.eval.get('quantize')
                   or ('fused_int4' if on_tpu else 'none'))
    if quantize == 'auto':
        # same resolution as eval (infer/scores.py): megakernel on TPU,
        # guarded by prepare_handler's probe; exact bf16 elsewhere
        quantize = 'fused_int4' if on_tpu else 'none'
    # multi-chip serving: shard decode batches over every visible chip
    # (devices: <n>|[ids] limits the data axis, like train.py/test.py)
    from mr_mt3_tpu.parallel import device_cap
    n_dev = device_cap(cfg.get('devices')) or len(jax.devices())
    mesh = None
    if n_dev > 1:
        from mr_mt3_tpu.parallel import make_mesh
        mesh = make_mesh(data=n_dev, model=1)
    return InferenceHandler(
        model=model, variables=variables, mel_norm=mel_norm,
        contiguous_inference=bool(cfg.eval.get('contiguous_inference')),
        batch_size=int(cfg.eval.get('batch_size') or 8),
        quantize=quantize,
        mesh=mesh)


def quantize_probe(handler, max_length=None, **kw):
    """Decode a probe batch through the handler's quantized path AND an
    exact-bf16 twin; return (flipped_tokens, total_tokens) — or, when
    the ladder asks for classify=True, the classified dict (material vs
    benign first-flips). max_length is passed by the ladder's
    full-length winner confirm (None = the short ladder length).

    Library home: mr_mt3_tpu.infer.probe (shared with eval's
    quantize='auto'); re-exported here so tests/operators can
    monkeypatch the serving entry point."""
    from mr_mt3_tpu.infer.probe import quantize_probe as _probe
    if max_length is None:
        return _probe(handler, **kw)
    return _probe(handler, max_length=max_length, **kw)


def prepare_handler(handler, probe: bool = True, prewarm: bool = True):
    """Pre-traffic safety + latency work; returns an info dict for /healthz.

    1. quantize guard: with a quantized decode path, decode a probe batch
       quantized AND exact; a MATERIAL token flip (one whose first
       divergence sits at a logit margin numeric noise cannot cross —
       infer/probe.classify_flips) or any probe failure demotes one
       tier with a logged warning — 'fused' (int8) falls back to
       'fused_bf16' (the unquantized megakernel) and only then to the
       exact XLA body. Benign near-tie flips (bf16 reassociation
       resolving a coin-flip logit the other way; measured F1-neutral —
       PERF.md) keep the tier and are reported in /healthz. The
       demotion policy lives in
       mr_mt3_tpu.infer.probe.resolve_auto_quantize (shared with eval's
       quantize='auto'; demote_on='any' restores strict
       exact-token-match serving); serve.quantize_probe stays the
       monkeypatchable probing entry point.
    2. prewarm: compile-and-run the serving decode program so the first
       request does not pay the 100-320 s program startup (PERF.md).

    Ladder probes run SHORT (infer/probe.PROBE_MAX_LENGTH) so losing
    tiers never pay a full-length program's startup; the ladder then
    confirms the winning tier with one probe at the full serving length
    (resolve_auto_quantize confirm_full), which also surfaces
    full-length compile ceilings the short probe cannot see. The
    prewarm's transcribe_many covers the remaining bucket-shaped
    programs; if one of THOSE fails to compile, the failure demotes one
    tier and the ladder resumes, so the guard stays total.
    """
    from mr_mt3_tpu.infer import probe as probe_mod

    def demote_tier(reason: str):
        nxt = probe_mod._NEXT_TIER.get(handler.quantize, 'none')
        print(f'WARNING: quantize={handler.quantize!r} demoted to '
              f'{nxt!r} for serving ({reason})', file=sys.stderr)
        info.setdefault('demotions', []).append(reason)
        handler.quantize = nxt
        handler._invalidate_compiled()
        # the recorded probe counts belong to the tier we just left —
        # /healthz must not present them as evidence for the new one
        for k in probe_mod.PROBE_INFO_KEYS:
            info.pop(k, None)

    info = {'quantize': handler.quantize, 'prewarmed': False}
    while True:
        if probe and handler.quantize != 'none':
            t0 = time.monotonic()
            before = handler.quantize
            demoted_before = len(info.get('demotions', []))
            probed = probe_mod.resolve_auto_quantize(
                handler, verbose=False,
                probe_fn=lambda h, **kw: quantize_probe(h, **kw))
            info.setdefault('demotions', []).extend(
                probed.pop('demotions', []))
            info.update(probed)
            info['probe_seconds'] = round(
                info.get('probe_seconds', 0.0) + time.monotonic() - t0, 1)
            if handler.quantize != before:
                # info['probe_flips'] is the LAST probe (possibly the
                # clean one that stopped the ladder) — the demotion
                # reasons carry the flip counts behind each step down
                why = '; '.join(info['demotions'][demoted_before:])
                print(f'WARNING: quantize={before!r} demoted to '
                      f'{handler.quantize!r} for serving ({why})',
                      file=sys.stderr)
        if not prewarm:
            break
        from mr_mt3_tpu.infer.probe import probe_audio
        t0 = time.monotonic()
        prewarm_before = info.get('prewarm_seconds', 0.0)
        # warm through transcribe_many — the path EVERY request takes
        # (serve's MicroBatcher always calls it), so the compiled program
        # shapes match real traffic, including the sharded contiguous fn
        # under a mesh (the single-song _decode_all would compile the
        # unsharded local program instead). Lockstep songs (contiguous
        # mode) and memory chains (encoder_append models) both bucket to
        # powers of two, so each coalesce bucket is a distinct program —
        # warm them all, deduped by the padded shape they produce (under
        # a mesh several counts collapse onto one shape), or the first
        # coalesced request of a cold bucket stalls on program startup.
        audio = probe_audio(2)
        capped = handler.quantize.startswith('fused')
        if handler.contiguous_inference:
            # leading device axis = lockstep SONGS, bounded by the
            # coalesce cap (floor 1)
            floor = 1
            candidates = [1 << i for i in range(
                (MicroBatcher.MAX_COALESCE - 1).bit_length() + 1)]
        elif handler.cfg.segmem_variant == 'encoder_append':
            # leading device axis = memory CHAINS
            # (ceil(segments/batch_size) per song, floor 4) — a single
            # LONG song yields more chains than the coalesce cap has
            # songs (a 5-minute song is 5 chains), so song-count
            # candidates alone would leave real-traffic chain buckets
            # cold. Warm every pow2 chain bucket up to _pow2_bucket's
            # cap; beyond it shapes grow in multiples of 4, unbounded by
            # song length — those accept a cold compile. The probe song
            # must contribute exactly ONE chain (ceil(segments/
            # batch_size) == 1) so k probe songs exercise the k-chain
            # bucket — at batch_size=1 the 2-segment probe would be 2
            # chains per song and the predicted shapes would desync from
            # what transcribe_many actually compiles.
            from mr_mt3_tpu.infer.handler import POW2_BUCKET_CAP
            if handler.batch_size < 2:
                audio = probe_audio(1)
            floor = 4
            candidates = [1 << i for i in range(POW2_BUCKET_CAP
                                                .bit_length())]
        else:
            # vanilla non-contiguous: _decode_all pads every call to the
            # one fixed (batch_size * n_data) shape — a single warm
            # covers all traffic
            floor, candidates = 1, [1]
        # dedupe by the actual device-call shapes each count produces
        # (_call_sizes is the shape logic the request path uses — under
        # the fused per-call cap a big count splits into already-warmed
        # cap-size calls, and under a mesh several counts collapse onto
        # one padded shape)
        counts, seen = [], set()
        for k in candidates:
            shapes = handler._call_sizes(k, floor=floor, capped=capped)
            new = [s for s in shapes if s not in seen]
            if new:
                seen.update(new)
                counts.append(k)
        try:
            for k in counts:
                handler.transcribe_many([audio] * k)
        except Exception as e:  # noqa: BLE001
            # the ladder's full-length confirm covers the probe-batch
            # program, but the prewarm's coalesce buckets are distinct
            # shapes that can still fail to compile (e.g. a VMEM ceiling
            # at a bigger chain bucket) — treat that exactly like a
            # probe failure: demote one tier and re-run the ladder from
            # there. At 'none' there is no further fallback — surface
            # the real error. prewarm_seconds accumulates across failed
            # attempts so the startup accounting keeps the time burned
            # compiling losing tiers.
            info['prewarm_seconds'] = round(
                prewarm_before + time.monotonic() - t0, 1)
            if handler.quantize == 'none':
                raise
            demote_tier(f'prewarm failed at full length ({e!r})')
            continue
        info['prewarm_seconds'] = round(
            prewarm_before + time.monotonic() - t0, 1)
        info['prewarmed'] = True
        info['prewarm_buckets'] = counts
        break
    info['quantize'] = handler.quantize
    print(f'serving decode path: quantize={handler.quantize!r} '
          f'(probe={info.get("probe_flips", "skipped")} flips, '
          f'prewarmed={info["prewarmed"]})')
    return info


class MicroBatcher:
    """Coalesces concurrent transcription requests into one device batch.

    Requests that arrive while the device is busy queue up; when the worker
    frees, everything waiting (up to max_coalesce songs) runs as ONE
    transcribe_many call — cross-song lockstep batching on the segment axis,
    so N concurrent clients cost ~1 decode instead of N serialized ones.
    """

    MAX_COALESCE = 8  # also the largest song bucket prepare_handler warms

    def __init__(self, handler, max_coalesce: int = None):
        import queue
        self.handler = handler
        self.max_coalesce = max_coalesce or self.MAX_COALESCE
        self.batches = 0
        self._q: 'queue.Queue' = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def transcribe(self, audio):
        done = threading.Event()
        slot = {'result': None, 'error': None}
        self._q.put((audio, slot, done))
        done.wait()
        if slot['error'] is not None:
            raise slot['error']
        return slot['result']

    def _drain(self):
        import queue
        first = self._q.get()  # block for the first request
        batch = [first]
        while len(batch) < self.max_coalesce:
            try:
                batch.append(self._q.get_nowait())
            except queue.Empty:
                break
        return batch

    def _run(self):
        while True:
            batch = self._drain()
            self.batches += 1
            audios = [b[0] for b in batch]
            try:
                try:
                    results = self.handler.transcribe_many(audios)
                    if len(results) != len(batch):
                        raise RuntimeError(
                            f'transcribe_many returned {len(results)} '
                            f'results for {len(batch)} songs')
                    for (_, slot, done), ns in zip(batch, results):
                        slot['result'] = ns
                        done.set()
                except Exception:
                    # isolate the failing song: fall back to per-request,
                    # still THROUGH transcribe_many — handler.transcribe
                    # would route contiguous decode to the unsharded local
                    # program under a mesh, a shape prepare_handler never
                    # prewarmed, stalling every queued client on a cold
                    # ~100-320 s compile; the 1-song transcribe_many
                    # bucket is always warmed
                    for audio, slot, done in batch:
                        try:
                            slot['result'] = \
                                self.handler.transcribe_many([audio])[0]
                        except Exception as e:  # noqa: BLE001
                            slot['error'] = e
                        done.set()
            except BaseException as e:  # never die with waiters blocked
                for _, slot, done in batch:
                    if not done.is_set():
                        slot['error'] = RuntimeError(
                            f'transcription worker error: {e!r}')
                        done.set()


def make_server(handler, port: int, info=None):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from mr_mt3_tpu.audio import resample
    from mr_mt3_tpu.midi.writer import note_sequence_to_midi_bytes

    batcher = MicroBatcher(handler)
    stats = {'requests': 0, 'audio_seconds': 0.0, 'batches': 0}
    if info is None:
        # server built without prepare_handler(): report the path, cold
        info = {'quantize': handler.quantize, 'prewarmed': False}
    stats['decode'] = info
    stats_lock = threading.Lock()

    def decode_audio(body: bytes):
        import struct

        import numpy as np
        try:
            if body[:4] == b'fLaC':
                from mr_mt3_tpu.native.flac import decode_flac_bytes
                samples, sr = decode_flac_bytes(body)
                samples = samples.mean(axis=1)
            elif body[:4] == b'RIFF':
                from mr_mt3_tpu.audio import read_wav_bytes
                samples, sr = read_wav_bytes(body)
            else:
                raise ValueError('body must be WAV or FLAC bytes')
        except (struct.error, IndexError, KeyError) as e:
            # truncated/corrupt containers surface as parse errors from
            # the struct-based readers — client data, so 400 not 500
            raise ValueError(f'malformed audio container: {e!r}')
        # a corrupt header's sample rate feeds resample_poly, whose filter
        # design scales with the rate ratio — an absurd rate (e.g. 2^32-1)
        # would be a memory/CPU DoS, so bound it to plausible audio rates
        if not 1000 <= sr <= 768000:
            raise ValueError(f'implausible sample rate: {sr}')
        # the range bound alone still admits rates nearly coprime with
        # 16000 (e.g. 767999): resample_poly's filter length is
        # ~20*max(up, down) after the gcd reduction, so a tiny WAV
        # claiming such a rate would cost a multi-million-tap design per
        # request. Every real audio rate shares a large factor with
        # 16000 (44.1k-family rates reduce to up/down <= 441*2^k), so
        # cap the reduced ratio instead of enumerating rates.
        from math import gcd
        if max(sr, 16000) // gcd(int(sr), 16000) > 8000:
            raise ValueError(
                f'unsupported sample rate for resampling: {sr} '
                '(use a standard audio rate, e.g. 44100/48000/16000)')
        if sr != 16000:
            samples = resample(samples, sr, 16000)
        return samples.astype(np.float32)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _reply(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                self._reply(200, json.dumps(
                    {'status': 'ok', **stats}).encode(), 'application/json')
            else:
                self._reply(404, b'not found', 'text/plain')

        def do_POST(self):
            if self.path not in ('/transcribe', '/transcribe.json'):
                self._reply(404, b'not found', 'text/plain')
                return
            try:
                length = int(self.headers.get('Content-Length') or 0)
            except ValueError:
                self._reply(400, b'bad Content-Length', 'text/plain')
                return
            # negative would make rfile.read() block until EOF (thread
            # DoS on keep-alive sockets); the cap bounds the in-memory
            # body (1 GB ~ 9 hours of 16 kHz float32 audio)
            if length < 0 or length > 1 << 30:
                self._reply(400, b'bad Content-Length', 'text/plain')
                return
            body = self.rfile.read(length)
            try:
                audio = decode_audio(body)
                ns = batcher.transcribe(audio)
                with stats_lock:
                    stats['requests'] += 1
                    stats['audio_seconds'] += len(audio) / 16000.0
                    stats['batches'] = batcher.batches
                if self.path == '/transcribe.json':
                    notes = [{'pitch': n.pitch, 'start': n.start_time,
                              'end': n.end_time, 'velocity': n.velocity,
                              'program': n.program, 'is_drum': n.is_drum}
                             for n in ns.notes]
                    self._reply(200, json.dumps({'notes': notes}).encode(),
                                'application/json')
                else:
                    self._reply(200, note_sequence_to_midi_bytes(ns),
                                'audio/midi')
            except ValueError as e:
                self._reply(400, str(e).encode(), 'text/plain')
            except Exception as e:
                self._reply(500, f'internal error: {e}'.encode(),
                            'text/plain')

    return ThreadingHTTPServer(('127.0.0.1', port), Handler)


def main():
    port = 8742
    argv = []
    it = iter(sys.argv[1:])
    for arg in it:
        if arg.startswith('--port'):
            port = int(arg.split('=', 1)[1] if '=' in arg else next(it))
        else:
            argv.append(arg)
    handler = build_handler(argv)
    # quantize guard + prewarm BEFORE binding the port: the first request
    # must not pay program startup or risk unguarded quantized numerics
    info = prepare_handler(handler)
    server = make_server(handler, port, info)
    print(f'serving on http://127.0.0.1:{port} '
          '(POST /transcribe, /transcribe.json; GET /healthz)')
    server.serve_forever()


if __name__ == '__main__':
    main()
