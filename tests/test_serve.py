"""Tests for the transcription HTTP server (tiny model, in-process)."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import serve
from mr_mt3_tpu.audio import write_wav
from mr_mt3_tpu.infer import InferenceHandler
from mr_mt3_tpu.midi import read_midi
from mr_mt3_tpu.models import MT3, MT3Config

SMALL = MT3Config(vocab_size=1536, d_model=32, d_kv=8, d_ff=48, num_heads=4,
                  num_encoder_layers=1, num_decoder_layers=1, mel_bins=512,
                  dropout_rate=0.0)


@pytest.fixture(scope='module')
def server():
    model = MT3(SMALL)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 512)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32))
    handler = InferenceHandler(model=model, variables=variables,
                               max_length=12, batch_size=4)
    srv = serve.make_server(handler, port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f'http://127.0.0.1:{srv.server_address[1]}'
    srv.shutdown()


def _wav_bytes(seconds=2.0, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    buf = io.BytesIO()
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix='.wav', delete=False) as f:
        path = f.name
    write_wav(path, x, sr)
    data = open(path, 'rb').read()
    os.unlink(path)
    return data


def _post(url, body):
    req = urllib.request.Request(url, data=body, method='POST')
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.read(), resp.headers.get('Content-Type')
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get('Content-Type')


class TestServer:
    def test_healthz(self, server):
        with urllib.request.urlopen(server + '/healthz', timeout=30) as r:
            payload = json.loads(r.read())
        assert payload['status'] == 'ok'

    def test_transcribe_wav_to_midi(self, server):
        status, body, ctype = _post(server + '/transcribe', _wav_bytes())
        assert status == 200
        assert ctype == 'audio/midi'
        midi = read_midi(body)  # valid SMF
        assert midi.ticks_per_quarter > 0

    def test_transcribe_json(self, server):
        status, body, ctype = _post(server + '/transcribe.json',
                                    _wav_bytes(1.0))
        assert status == 200
        payload = json.loads(body)
        assert 'notes' in payload

    def test_flac_input(self, server):
        from mr_mt3_tpu.native.flac import encode_flac_bytes, flac_available
        if not flac_available():
            pytest.skip('native FLAC unavailable')
        t = np.arange(16000) / 16000
        x = (10000 * np.sin(2 * np.pi * 330 * t)).astype(np.int32)
        status, body, ctype = _post(server + '/transcribe',
                                    encode_flac_bytes(x, 16000))
        assert status == 200
        assert ctype == 'audio/midi'

    def test_garbage_body_400(self, server):
        status, body, _ = _post(server + '/transcribe', b'definitely not audio')
        assert status == 400
        assert b'WAV or FLAC' in body

    def test_negative_content_length_400(self, server):
        """A negative Content-Length must be rejected up front: passing
        it to rfile.read() would block until EOF and hang the worker
        thread for as long as the client holds the socket open."""
        import socket
        from urllib.parse import urlparse
        u = urlparse(server)
        for bad in ('-1', str(1 << 31)):
            with socket.create_connection((u.hostname, u.port),
                                          timeout=30) as s:
                s.sendall((f'POST /transcribe HTTP/1.1\r\n'
                           f'Host: {u.hostname}\r\n'
                           f'Content-Length: {bad}\r\n'
                           f'Connection: close\r\n\r\n').encode())
                reply = s.recv(4096).decode(errors='replace')
            assert ' 400 ' in reply.split('\r\n')[0], (bad, reply[:80])

    def test_malformed_wav_400(self, server):
        """Bytes with a RIFF magic but a truncated/corrupt body must come
        back 400 (struct parse errors are client data, not 500s)."""
        for payload in (b'RIFF',                         # magic only
                        b'RIFF\x10\x00\x00\x00WAVE',     # no fmt/data
                        b'RIFF\xff\xff\xff\xffWAVEfmt '  # truncated fmt
                        + b'\x10\x00\x00\x00\x01\x00'):
            status, body, _ = _post(server + '/transcribe', payload)
            assert status == 400, payload[:16]

    def test_implausible_sample_rate_400(self, server):
        """A structurally valid WAV whose header claims a 2^32-1 Hz rate
        must 400: that rate would otherwise reach resample_poly, whose
        filter design scales with the rate ratio (memory/CPU DoS)."""
        import struct
        payload = (b'RIFF' + struct.pack('<I', 36 + 4) + b'WAVEfmt '
                   + struct.pack('<IHHIIHH', 16, 1, 1, 0xFFFFFFFF,
                                 0xFFFFFFFE, 2, 16)
                   + b'data' + struct.pack('<I', 4) + b'\x00' * 4)
        status, body, _ = _post(server + '/transcribe', payload)
        assert status == 400
        assert b'sample rate' in body

    def test_coprime_sample_rate_400(self, server):
        """An in-range rate nearly coprime with 16000 (767999: gcd=1)
        must also 400: resample_poly's filter length is ~20*max(up,
        down) after gcd reduction, so a ~100-byte WAV claiming it would
        cost a 15M-tap float64 filter design per request."""
        import struct
        payload = (b'RIFF' + struct.pack('<I', 36 + 4) + b'WAVEfmt '
                   + struct.pack('<IHHIIHH', 16, 1, 1, 767999,
                                 767999 * 2, 2, 16)
                   + b'data' + struct.pack('<I', 4) + b'\x00' * 4)
        status, body, _ = _post(server + '/transcribe', payload)
        assert status == 400
        assert b'sample rate' in body

    def test_malformed_flac_400(self, server):
        """Bytes with a fLaC magic but corrupt internals must come back as
        a clean 4xx, not a crashed worker (the native decoder rejects
        them; fuzzed under ASan/UBSan by native/flac_fuzz)."""
        for payload in (b'fLaC',                       # magic only
                        b'fLaC' + b'\x00' * 16,        # truncated metadata
                        b'fLaC' + bytes(range(256))):  # garbage blocks
            status, body, _ = _post(server + '/transcribe', payload)
            assert status == 400, payload[:16]

    def test_corrupted_valid_flac_400_or_200(self, server):
        """A real stream with stomped frame bytes either decodes (the
        corruption lands in audio data) or 400s — never 500s."""
        from mr_mt3_tpu.native.flac import encode_flac_bytes, flac_available
        if not flac_available():
            pytest.skip('native FLAC unavailable')
        t = np.arange(16000) / 16000
        x = (10000 * np.sin(2 * np.pi * 330 * t)).astype(np.int32)
        data = bytearray(encode_flac_bytes(x, 16000))
        rng = np.random.default_rng(5)
        for _ in range(8):
            corrupt = bytearray(data)
            for _ in range(16):
                corrupt[rng.integers(4, len(corrupt))] = rng.integers(256)
            status, _, _ = _post(server + '/transcribe', bytes(corrupt))
            assert status in (200, 400), status

    def test_unknown_path_404(self, server):
        status, _, _ = _post(server + '/nope', b'')
        assert status == 404

    def test_concurrent_requests_all_succeed(self, server):
        wav = _wav_bytes(2.0)
        results = [None] * 4

        def call(i):
            results[i] = _post(server + '/transcribe.json', wav)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, body, _ in results:
            assert status == 200
            assert 'notes' in json.loads(body)


class TestMicroBatcher:
    def test_coalesces_queued_requests(self):
        """Requests queued while the device is busy run as ONE
        transcribe_many call."""
        import time

        release = threading.Event()
        calls = []

        class SlowHandler:
            def transcribe_many(self, audios):
                calls.append(len(audios))
                if len(calls) == 1:
                    release.wait(timeout=10)

                class NS:
                    notes = []
                return [NS() for _ in audios]

        batcher = serve.MicroBatcher(SlowHandler())
        threads = [threading.Thread(
            target=batcher.transcribe, args=(np.zeros(10, np.float32),))
            for _ in range(4)]
        threads[0].start()
        deadline = time.time() + 5
        while not calls and time.time() < deadline:
            time.sleep(0.005)  # wait until the worker holds request 0
        assert calls, 'worker thread never picked up request 0'
        for t in threads[1:]:
            t.start()
        # requests 1-3 are all enqueued before the device frees
        deadline = time.time() + 5
        while batcher._q.qsize() < 3 and time.time() < deadline:
            time.sleep(0.005)
        release.set()
        for t in threads:
            t.join(timeout=10)
        assert calls[0] == 1
        assert calls[1] == 3  # the 3 waiters coalesced into one batch
    def test_error_isolation(self):
        """A failing song in a coalesced batch must not fail its peers,
        and the per-song fallback must go through transcribe_many — the
        path prepare_handler prewarms. handler.transcribe would route
        contiguous decode to the never-prewarmed local program under a
        mesh, so this handler deliberately has NO transcribe()."""
        import time

        release = threading.Event()
        calls = []

        class FlakyHandler:  # no transcribe() on purpose (see docstring)
            @staticmethod
            def _ns():
                class NS:
                    notes = []
                return NS()

            def transcribe_many(self, audios):
                calls.append(len(audios))
                if len(calls) == 1:  # hold the worker so peers coalesce
                    release.wait(timeout=10)
                    return [self._ns() for _ in audios]
                if any(len(a) == 1 for a in audios):
                    raise ValueError('bad song')
                return [self._ns() for _ in audios]

        batcher = serve.MicroBatcher(FlakyHandler())
        results = {}

        def run(name, audio):
            try:
                results[name] = batcher.transcribe(audio)
            except Exception as e:  # noqa: BLE001
                results[name] = e

        warm = threading.Thread(
            target=run, args=('warm', np.zeros(100, np.float32)))
        warm.start()
        deadline = time.time() + 5
        while not calls and time.time() < deadline:
            # wait until the worker holds the first request
            time.sleep(0.005)
        assert calls, 'MicroBatcher worker never picked up the request'
        peers = [threading.Thread(
            target=run, args=(name, np.zeros(n, np.float32)))
            for name, n in (('good', 100), ('bad', 1))]
        for t in peers:
            t.start()
        deadline = time.time() + 5
        while batcher._q.qsize() < 2 and time.time() < deadline:
            time.sleep(0.005)
        release.set()
        for t in [warm] + peers:
            t.join(timeout=10)
        assert not isinstance(results['warm'], Exception)
        assert not isinstance(results['good'], Exception)
        assert isinstance(results['bad'], ValueError)
        # warm(1) -> coalesced batch of 2 raises -> per-song fallback 1+1
        assert calls == [1, 2, 1, 1]


class TestQuantizeGuard:
    def _handler(self, quantize='fused'):
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        return InferenceHandler(model=model, variables=variables,
                                max_length=12, batch_size=4,
                                quantize=quantize)

    def test_probe_flip_falls_back_to_exact(self, monkeypatch):
        """Any probe-token flip must demote the quantized serving default
        to exact bf16 before traffic is accepted."""
        handler = self._handler('fused')
        monkeypatch.setattr(serve, 'quantize_probe', lambda h: (3, 100))
        info = serve.prepare_handler(handler, prewarm=False)
        assert handler.quantize == 'none'
        assert handler._decode_fn is None  # stale compiled fn dropped
        assert info['quantize'] == 'none'
        assert info['probe_flips'] == 3

    def test_probe_clean_keeps_quantized_path(self, monkeypatch):
        handler = self._handler('fused')
        monkeypatch.setattr(serve, 'quantize_probe', lambda h: (0, 100))
        info = serve.prepare_handler(handler, prewarm=False)
        assert handler.quantize == 'fused'
        assert info['probe_flips'] == 0

    def test_probe_skipped_for_exact_path(self):
        handler = self._handler('none')
        info = serve.prepare_handler(handler, prewarm=False)
        assert 'probe_flips' not in info
        assert info['quantize'] == 'none'

    def test_real_probe_measures_flips(self):
        """quantize_probe on a random tiny model actually runs both decode
        paths and returns a well-formed measurement (random weights have
        near-uniform logits, so flips may be nonzero — the point of the
        guard)."""
        handler = self._handler('fused')
        flips, total = serve.quantize_probe(handler)
        assert total > 0
        assert 0 <= flips <= total

    def test_prewarm_failure_demotes_tier(self, monkeypatch):
        """A tier that probes clean at the short length but fails to
        compile at the full serving length must demote — the short probe
        cannot see full-length compile ceilings, so the prewarm failure
        re-enters the ladder instead of crashing startup."""
        handler = self._handler('fused')
        monkeypatch.setattr(serve, 'quantize_probe', lambda h: (0, 100))
        real = InferenceHandler.transcribe_many

        def flaky(self, audios):
            if handler.quantize == 'fused':
                raise RuntimeError('VMEM exceeded at full length')
            return real(self, audios)
        monkeypatch.setattr(InferenceHandler, 'transcribe_many', flaky)
        info = serve.prepare_handler(handler)
        assert handler.quantize == 'fused_bf16'
        assert info['quantize'] == 'fused_bf16'
        assert info['prewarmed'] is True
        assert any('prewarm failed' in d for d in info['demotions'])

    def test_prewarm_demotion_drops_stale_probe_info(self, monkeypatch):
        """When the prewarm demotes past the last probed tier (down to
        'none', which is never probed), /healthz must not keep the
        losing tier's clean probe counts — {quantize: 'none',
        probe_flips: 0} would read as 'probed clean' for a path that
        was never the probed one."""
        handler = self._handler('fused_bf16')
        monkeypatch.setattr(serve, 'quantize_probe', lambda h: (0, 100))

        def flaky(self, audios):
            if handler.quantize != 'none':
                raise RuntimeError('VMEM exceeded at full length')
            return real(self, audios)
        real = InferenceHandler.transcribe_many
        monkeypatch.setattr(InferenceHandler, 'transcribe_many', flaky)
        info = serve.prepare_handler(handler)
        assert handler.quantize == 'none'
        assert info['quantize'] == 'none'
        assert info['prewarmed'] is True
        assert 'probe_flips' not in info
        # the time burned compiling the losing tier stays in the
        # startup accounting (t0 is not reset per attempt)
        assert info['prewarm_seconds'] >= 0

    def test_prewarm_failure_at_exact_tier_raises(self, monkeypatch):
        """At 'none' there is no further fallback; the real error must
        surface instead of looping."""
        handler = self._handler('none')
        monkeypatch.setattr(
            InferenceHandler, 'transcribe_many',
            lambda self, audios: (_ for _ in ()).throw(
                RuntimeError('device lost')))
        with pytest.raises(RuntimeError, match='device lost'):
            serve.prepare_handler(handler, probe=False)

    def test_prewarm_runs_serving_program(self):
        handler = self._handler('none')
        info = serve.prepare_handler(handler, probe=False)
        assert info['prewarmed'] is True
        assert info['prewarm_seconds'] >= 0
        assert info['prewarm_buckets'] == [1]

    def test_prewarm_covers_contiguous_buckets(self):
        """Contiguous mode buckets the lockstep song axis to powers of
        two; prewarm must compile every coalesce bucket or the first
        coalesced request of each still stalls on program startup."""
        cfg = SMALL.replace(segmem_variant='encoder_append',
                            segmem_length=4)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32),
                               targets_prev=jnp.zeros((1, 4), jnp.int32))
        handler = InferenceHandler(model=model, variables=variables,
                                   max_length=8, batch_size=2,
                                   contiguous_inference=True,
                                   segment_bucket=1)
        info = serve.prepare_handler(handler, probe=False)
        assert info['prewarm_buckets'] == [1, 2, 4, 8]

    def test_prewarm_covers_chain_buckets(self):
        """Non-contiguous encoder_append: the padded device axis is the
        memory-CHAIN count (ceil(segments/batch_size) per song), and a
        single LONG song reaches chain buckets far beyond the 8-song
        coalesce cap — prewarm must cover the pow2 chain buckets up to
        _pow2_bucket's cap, not just song-count buckets."""
        cfg = SMALL.replace(segmem_variant='encoder_append',
                            segmem_length=4)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32),
                               targets_prev=jnp.zeros((1, 4), jnp.int32))
        handler = InferenceHandler(model=model, variables=variables,
                                   max_length=8, batch_size=2)
        info = serve.prepare_handler(handler, probe=False)
        # floor 4 absorbs counts 1-4; then each pow2 up to the cap is a
        # fresh compiled shape (uncapped 'none' tier, n_data=1)
        assert info['prewarm_buckets'] == [1, 8, 16, 32, 64]

    def test_healthz_reports_decode_path(self):
        """The server surfaces the chosen decode path + warm state."""
        handler = self._handler('none')
        info = serve.prepare_handler(handler, prewarm=False)
        srv = serve.make_server(handler, port=0, info=info)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        try:
            url = f'http://127.0.0.1:{srv.server_address[1]}/healthz'
            with urllib.request.urlopen(url, timeout=30) as r:
                payload = json.loads(r.read())
            assert payload['decode']['quantize'] == 'none'
            assert payload['decode']['prewarmed'] is False
        finally:
            srv.shutdown()


class TestBuildHandler:
    def test_quantize_default_and_override(self, tmp_path, monkeypatch):
        """build_handler defaults to the megakernel only on TPU and honors
        eval.quantize overrides."""
        import jax
        # on the CPU test backend the default must stay exact bf16/XLA
        handler = serve.build_handler(
            ['model=MT3Net', 'model.config.num_layers=1',
             'model.config.d_model=32', 'model.config.d_ff=48',
             'model.config.num_heads=2', 'model.config.d_kv=16'])
        assert jax.default_backend() != 'tpu'
        assert handler.quantize == 'none'
        handler = serve.build_handler(
            ['model=MT3Net', 'model.config.num_layers=1',
             'model.config.d_model=32', 'model.config.d_ff=48',
             'model.config.num_heads=2', 'model.config.d_kv=16',
             '+eval.quantize=int8'])
        assert handler.quantize == 'int8'
