"""Pallas fused log-mel kernel vs the reference JAX frontend.

Runs in interpreter mode on CPU; the same kernel compiles on TPU.
"""

import numpy as np
import pytest

from mr_mt3_tpu.audio import SpectrogramConfig, compute_logmel
from mr_mt3_tpu.ops.mel_pallas import logmel_pallas


def _tone(n, sr=16000):
    t = np.arange(n) / sr
    x = (np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 1200 * t + 1))
    return (x / 1.5).astype(np.float32)


class TestLogmelPallas:
    @pytest.mark.parametrize('n', [32768, 16000])
    def test_matches_frontend(self, n):
        x = np.stack([_tone(n), _tone(n) * 0.3])
        cfg = SpectrogramConfig()
        oracle = np.asarray(compute_logmel(x, cfg))
        mine = np.asarray(logmel_pallas(x, cfg, interpret=True))
        assert mine.shape == oracle.shape
        # tight where there is energy; noise-floor bins only in mel space
        mask = oracle > -4
        assert mask.sum() > 1000
        assert np.abs(mine[mask] - oracle[mask]).max() < 2e-3
        assert np.abs(np.exp(mine) - np.exp(oracle)).max() < 0.02

    def test_tf_style_filterbank(self):
        x = _tone(32768)[None]
        cfg = SpectrogramConfig(filterbank_style='tf')
        oracle = np.asarray(compute_logmel(x, cfg))
        mine = np.asarray(logmel_pallas(x, cfg, interpret=True))
        mask = oracle > -4
        assert np.abs(mine[mask] - oracle[mask]).max() < 2e-3

    def test_zero_audio_log_floor(self):
        x = np.zeros((1, 4096), np.float32)
        out = np.asarray(logmel_pallas(x, interpret=True))
        assert out.shape == (1, 32, 512)
        np.testing.assert_allclose(out, np.log(1e-5), atol=1e-4)

    def test_rejects_1d(self):
        with pytest.raises(ValueError):
            logmel_pallas(np.zeros(100, np.float32), interpret=True)
