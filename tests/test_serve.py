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

    def test_unknown_path_404(self, server):
        status, _, _ = _post(server + '/nope', b'')
        assert status == 404
