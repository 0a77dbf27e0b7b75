"""Log-mel spectrogram frontend, implemented in JAX for TPU execution.

Replaces the reference's torchaudio / TF-ddsp dual frontend
(reference: contrib/spectrograms.py). Both variants share the same STFT
(2048-point hann-periodic window, hop 128, no centering, zero pad-end,
magnitude with power 1.0) — verified identical between torch and TF in the
reference setup — and differ only in mel-filterbank triangle interpolation:

  * 'torch': torchaudio.functional.melscale_fbanks semantics — HTK mel-spaced
    band edges, triangles interpolated in *Hz* space, no normalization.
    Used for models trained in the reference repo.
  * 'tf': tf.signal.linear_to_mel_weight_matrix semantics — same band edges,
    triangles interpolated in *mel* space, DC bin zeroed. Required for
    numerical parity with the official MT3 checkpoint
    (reference: contrib/spectrograms.py:114-127).

The mel projection is a (frames, 1025) x (1025, bins) matmul that XLA maps
onto the MXU; the whole pipeline is jit-compatible with static shapes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SAMPLE_RATE = 16000
DEFAULT_HOP_WIDTH = 128
DEFAULT_NUM_MEL_BINS = 512
FFT_SIZE = 2048
MEL_LO_HZ = 20.0
MEL_HI_HZ = 7600.0

# log-mel normalization range (reference: dataset/dataset_2_random.py:19-20)
MIN_LOG_MEL = -12.0
MAX_LOG_MEL = 5.0


@dataclasses.dataclass(frozen=True)
class SpectrogramConfig:
    """Spectrogram parameters (reference: contrib/spectrograms.py:44-65)."""
    sample_rate: int = DEFAULT_SAMPLE_RATE
    hop_width: int = DEFAULT_HOP_WIDTH
    num_mel_bins: int = DEFAULT_NUM_MEL_BINS
    fft_size: int = FFT_SIZE
    mel_lo_hz: float = MEL_LO_HZ
    mel_hi_hz: float = MEL_HI_HZ
    # 'torch' for in-repo-trained models, 'tf' for the official checkpoint
    filterbank_style: str = 'torch'

    @property
    def abbrev_str(self) -> str:
        s = ''
        if self.sample_rate != DEFAULT_SAMPLE_RATE:
            s += 'sr%d' % self.sample_rate
        if self.hop_width != DEFAULT_HOP_WIDTH:
            s += 'hw%d' % self.hop_width
        if self.num_mel_bins != DEFAULT_NUM_MEL_BINS:
            s += 'mb%d' % self.num_mel_bins
        return s

    @property
    def frames_per_second(self) -> float:
        return self.sample_rate / self.hop_width


def _hz_to_mel(freq):
    """HTK mel scale, used by both torchaudio (htk) and tf.signal."""
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def _mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    num_mel_bins: int,
    num_spectrogram_bins: int,
    sample_rate: float,
    lo_hz: float,
    hi_hz: float,
    style: str = 'torch',
) -> np.ndarray:
    """Triangular mel filterbank, shape (num_spectrogram_bins, num_mel_bins)."""
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)
    mel_edges = np.linspace(_hz_to_mel(lo_hz), _hz_to_mel(hi_hz),
                            num_mel_bins + 2)

    if style == 'torch':
        # Triangles interpolated in Hz between mel-spaced points.
        f_pts = _mel_to_hz(mel_edges)
        f_diff = np.diff(f_pts)
        slopes = f_pts[np.newaxis, :] - linear_freqs[:, np.newaxis]
        down = -slopes[:, :-2] / f_diff[:-1]
        up = slopes[:, 2:] / f_diff[1:]
        fb = np.maximum(0.0, np.minimum(down, up))
    elif style == 'tf':
        # Triangles interpolated in mel space; DC bin excluded.
        spec_mel = _hz_to_mel(linear_freqs[1:])[:, np.newaxis]
        lower = mel_edges[np.newaxis, :-2]
        center = mel_edges[np.newaxis, 1:-1]
        upper = mel_edges[np.newaxis, 2:]
        up_slope = (spec_mel - lower) / (center - lower)
        down_slope = (upper - spec_mel) / (upper - center)
        fb = np.maximum(0.0, np.minimum(up_slope, down_slope))
        fb = np.pad(fb, [[1, 0], [0, 0]])
    else:
        raise ValueError(f'unknown filterbank style: {style}')
    return fb.astype(np.float32)


def _hann_periodic(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(
        np.float32)


def num_stft_frames(num_samples: int, hop_width: int) -> int:
    """pad_end framing: one frame per hop while any input sample remains."""
    return -(-num_samples // hop_width)


@functools.partial(jax.jit, static_argnames=('hop_width', 'fft_size'))
def _stft_magnitude(samples: jnp.ndarray, window: jnp.ndarray,
                    hop_width: int, fft_size: int) -> jnp.ndarray:
    """|STFT| with no centering and zero pad-end. samples: (..., n).

    Framing uses shifted slices of hop-blocked audio instead of a gather
    (hop divides fft_size): frames[f, j*hop:(j+1)*hop] = blocks[f + j].
    On TPU the gather formulation was ~100x slower.
    """
    n = samples.shape[-1]
    n_frames = num_stft_frames(n, hop_width)
    chunks = fft_size // hop_width
    if fft_size % hop_width == 0:
        total_blocks = n_frames + chunks - 1
        pad = total_blocks * hop_width - n
        x = jnp.pad(samples, [(0, 0)] * (samples.ndim - 1) + [(0, pad)])
        blocks = x.reshape(x.shape[:-1] + (total_blocks, hop_width))
        frames = jnp.concatenate(
            [blocks[..., j:j + n_frames, :] for j in range(chunks)],
            axis=-1)
    else:
        pad = fft_size + hop_width * (n_frames - 1) - n
        x = jnp.pad(samples, [(0, 0)] * (samples.ndim - 1) + [(0, pad)])
        idx = (np.arange(n_frames)[:, None] * hop_width +
               np.arange(fft_size)[None, :])
        frames = x[..., idx]
    frames = frames * window
    return jnp.abs(jnp.fft.rfft(frames, n=fft_size, axis=-1))


def safe_log(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """log with non-positive inputs clamped to eps
    (reference: contrib/spectrograms.py:100-103)."""
    return jnp.log(jnp.where(x <= 0.0, eps, x))


@functools.lru_cache(maxsize=8)
def _frontend_constants(config: SpectrogramConfig):
    # numpy on purpose: this cache may be populated inside a jit trace, and
    # caching jnp arrays created there would leak tracers
    window = _hann_periodic(config.fft_size)
    fbank = mel_filterbank(
        num_mel_bins=config.num_mel_bins,
        num_spectrogram_bins=config.fft_size // 2 + 1,
        sample_rate=config.sample_rate,
        lo_hz=config.mel_lo_hz,
        hi_hz=config.mel_hi_hz,
        style=config.filterbank_style)
    return window, fbank


def compute_logmel(samples, config: SpectrogramConfig = SpectrogramConfig()):
    """samples (..., n) -> log-mel (..., n_frames, num_mel_bins).

    Matches the reference's torchaudio path for style='torch'
    (MelSpectrogram(power=1.0, center=False) on pad_end-ed audio + safe_log)
    and ddsp.spectral_ops.compute_logmel for style='tf'.
    """
    window, fbank = _frontend_constants(config)
    samples = jnp.asarray(samples, dtype=jnp.float32)
    squeeze = samples.ndim == 1
    if squeeze:
        samples = samples[None]
    mag = _stft_magnitude(samples, window, config.hop_width, config.fft_size)
    mel = jnp.einsum('...fb,bm->...fm', mag, fbank,
                     precision=jax.lax.Precision.HIGHEST)
    out = safe_log(mel)
    return out[0] if squeeze else out


def normalize_logmel(logmel: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [MIN_LOG_MEL, MAX_LOG_MEL] and rescale to [0, 1].

    Applied for models trained in this repo; skipped for the official MT3
    checkpoint (reference: test.py:123).
    """
    clipped = jnp.clip(logmel, MIN_LOG_MEL, MAX_LOG_MEL)
    return (clipped - MIN_LOG_MEL) / (MAX_LOG_MEL - MIN_LOG_MEL)


# ---- host-side framing helpers (numpy; feed the dataset/inference split) ----

def split_audio(samples: np.ndarray,
                config: SpectrogramConfig = SpectrogramConfig()) -> np.ndarray:
    """Frame audio into non-overlapping hop_width frames, zero-padding the
    tail (reference: contrib/spectrograms.py:68-90)."""
    samples = np.asarray(samples)
    hop = config.hop_width
    if samples.shape[0] % hop != 0:
        samples = np.pad(samples, (0, hop - samples.shape[0] % hop))
    return samples.reshape(-1, hop)


def flatten_frames(frames: np.ndarray) -> np.ndarray:
    return np.reshape(frames, (-1,))


def frame_times(num_frames: int,
                config: SpectrogramConfig = SpectrogramConfig()) -> np.ndarray:
    return np.arange(num_frames) / config.frames_per_second
