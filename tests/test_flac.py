"""Round-trip tests for the native FLAC codec.

The in-repo encoder produces spec-correct streams exercising every decoder
path (fixed orders 0-4, LPC, mid-side decorrelation, multi-frame files),
so the decoder is tested without external FLAC tooling.
"""

import numpy as np
import pytest

try:
    from mr_mt3_tpu.native.flac import (
        decode_flac_bytes,
        encode_flac_bytes,
        flac_available,
        read_flac,
    )
    HAVE = flac_available()
except Exception:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason='native FLAC not built')


def _tone(n, channels=1, sr=16000, amp=12000):
    t = np.arange(n) / sr
    base = np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 880 * t)
    out = np.stack([(amp * base * (1.0 - 0.2 * c)).astype(np.int32)
                    for c in range(channels)], axis=1)
    return out


class TestRoundTrip:
    @pytest.mark.parametrize('mode', [-1, 0, 1, 2, 3, 4, 102, 108])
    def test_mono_modes(self, mode):
        x = _tone(10000)
        data = encode_flac_bytes(x, 16000, force_mode=mode)
        y, sr = decode_flac_bytes(data)
        assert sr == 16000
        np.testing.assert_array_equal(
            (y * 32768.0).round().astype(np.int32), x)

    def test_stereo_independent(self):
        x = _tone(5000, channels=2)
        data = encode_flac_bytes(x, 44100)
        y, sr = decode_flac_bytes(data)
        assert sr == 44100
        np.testing.assert_array_equal(
            (y * 32768.0).round().astype(np.int32), x)

    @pytest.mark.parametrize('mode', [-1, 2, 104])
    def test_stereo_mid_side(self, mode):
        x = _tone(9000, channels=2)
        data = encode_flac_bytes(x, 44100, force_mode=mode, mid_side=True)
        y, sr = decode_flac_bytes(data)
        np.testing.assert_array_equal(
            (y * 32768.0).round().astype(np.int32), x)

    def test_multi_frame(self):
        # > 4096 samples forces several frames
        x = _tone(4096 * 3 + 123, channels=2)
        data = encode_flac_bytes(x, 44100, mid_side=True)
        y, _ = decode_flac_bytes(data)
        assert y.shape == x.shape
        np.testing.assert_array_equal(
            (y * 32768.0).round().astype(np.int32), x)

    def test_long_audio_past_2048_frames(self):
        """Frame numbers >= 2048 need the 3-byte UTF-8 form; a 2-byte-only
        encoder writes 0xE0 as a 2-byte lead, which the decoder parses as
        a 3-byte sequence and desyncs mid-stream (~3 min at 44.1 kHz)."""
        n = 4096 * 2050 + 17  # 2051 frames
        x = (np.arange(n, dtype=np.int64) % 997 - 498).astype(np.int32)
        data = encode_flac_bytes(x, 16000)
        y, sr = decode_flac_bytes(data)
        assert sr == 16000
        np.testing.assert_array_equal(
            (y[:, 0] * 32768.0).round().astype(np.int32), x)

    @pytest.mark.parametrize('mode,n', [(104, 4101), (4, 4097), (108, 4100)])
    def test_forced_order_short_final_block(self, mode, n):
        """A final block shorter than the forced predictor order must fall
        back to a fitting fixed order instead of reading warmup samples or
        coefficients out of bounds."""
        x = _tone(n)
        data = encode_flac_bytes(x, 16000, force_mode=mode)
        y, _ = decode_flac_bytes(data)
        np.testing.assert_array_equal(
            (y * 32768.0).round().astype(np.int32), x)

    def test_noise_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.integers(-30000, 30000, size=(8000, 2)).astype(np.int32)
        data = encode_flac_bytes(x, 22050)
        y, _ = decode_flac_bytes(data)
        np.testing.assert_array_equal(
            (y * 32768.0).round().astype(np.int32), x)

    def test_read_flac_mono_mix(self, tmp_path):
        x = _tone(6000, channels=2)
        path = tmp_path / 'test.flac'
        path.write_bytes(encode_flac_bytes(x, 16000, mid_side=True))
        mono, sr = read_flac(path)
        assert sr == 16000
        expect = (x / 32768.0).astype(np.float32).mean(axis=1)
        np.testing.assert_allclose(mono, expect, atol=1e-6)

    def test_garbage_raises(self):
        with pytest.raises(ValueError):
            decode_flac_bytes(b'not a flac stream at all')

    def test_lpc_compresses_tonal(self):
        x = _tone(20000)
        lpc = encode_flac_bytes(x, 16000, force_mode=108)
        verb_fixed0 = encode_flac_bytes(x, 16000, force_mode=0)
        assert len(lpc) < len(verb_fixed0)


class TestMalformedInput:
    """The decoder parses UNTRUSTED input (serve.py POST bodies): every
    malformed stream must return a clean error, never crash or hang.
    Memory safety is separately fuzzed under ASan/UBSan (see the slow
    fuzz test below and `make -C mr_mt3_tpu/native fuzz`)."""

    def test_truncations_of_valid_stream(self):
        data = encode_flac_bytes(_tone(6000), 16000)
        for cut in [4, 8, 20, 41, 42, 43, 100, len(data) // 2,
                    len(data) - 1]:
            try:
                decode_flac_bytes(data[:cut])
            except ValueError:
                pass  # rejected is fine; decoded-prefix is fine too

    def test_deterministic_mutations_never_crash(self):
        data = bytearray(encode_flac_bytes(_tone(6000, channels=2),
                                           16000, mid_side=True))
        rng = np.random.default_rng(11)
        for _ in range(200):
            corrupt = bytearray(data)
            for _ in range(int(rng.integers(1, 24))):
                corrupt[int(rng.integers(0, len(corrupt)))] = \
                    int(rng.integers(0, 256))
            try:
                decode_flac_bytes(bytes(corrupt))
            except ValueError:
                pass

    def test_frame_channel_count_exceeding_streaminfo_rejected(self):
        """A frame header claiming stereo against a mono STREAMINFO used
        to write out of bounds; it must now be a clean reject."""
        data = bytearray(encode_flac_bytes(_tone(6000, channels=1), 16000))
        # frame header starts right after the 4 + 38 byte metadata; the
        # channel code is the top nibble of header byte 3 plus 1 bit
        frame = 42
        data[frame + 3] = (data[frame + 3] & 0x0F) | (10 << 4)  # mid-side
        with pytest.raises(ValueError):
            decode_flac_bytes(bytes(data))

    def test_huge_total_samples_rejected(self):
        """STREAMINFO claiming ~2^36 samples must not attempt a 256 GiB
        allocation."""
        data = bytearray(encode_flac_bytes(_tone(600), 16000))
        data[17 + 4] |= 0x0F  # top 4 bits of the 36-bit total_samples
        with pytest.raises(ValueError):
            decode_flac_bytes(bytes(data))


@pytest.mark.slow
class TestFuzzUnderSanitizers:
    def test_asan_ubsan_fuzz(self):
        """Build the ASan+UBSan fuzz binary and run the deterministic
        mutation corpus; any sanitizer report fails the run."""
        import os
        import subprocess
        native = os.path.join(os.path.dirname(__file__), '..',
                              'mr_mt3_tpu', 'native')
        try:
            subprocess.run(['make', '-C', native, 'flac_fuzz'],
                           check=True, capture_output=True, timeout=120)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f'cannot build fuzz binary: {e}')
        proc = subprocess.run(
            [os.path.join(native, 'flac_fuzz'), '20000'],
            capture_output=True, timeout=600, text=True)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert 'fuzz ok' in proc.stdout
