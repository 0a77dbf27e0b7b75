"""Fused log-mel spectrogram as a Pallas TPU kernel.

One kernel computes, per audio segment: overlapped framing (hop 128 within a
2048-sample window), hann windowing, the DFT as two MXU matmuls against
cos/-sin matrices, magnitude, the mel projection, and safe_log — without
materializing the (frames, 1025) spectrogram in HBM.

Grid is (batch, K-tiles of spectrogram bins): each step streams a
(2048, 128) slice of the DFT matrices and a (128, mel) slice of the
filterbank through VMEM and accumulates the mel partial products in a
scratch buffer; the final K-step applies the log and writes the output
block. Framing uses 16 shifted slices of the hop-blocked audio (hop divides
the window), avoiding gathers entirely.

Matches mr_mt3_tpu.audio.frontend.compute_logmel to ~1e-4 in log space at
signal level (fp32 DFT-by-matmul vs FFT rounding differs below the noise
floor, same as any two FFT implementations — see tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mr_mt3_tpu.ops._backend import on_tpu as _on_tpu
from mr_mt3_tpu.audio.frontend import (
    SpectrogramConfig,
    _hann_periodic,
    mel_filterbank,
)

_K_TILE = 128


@functools.lru_cache(maxsize=4)
def _dft_constants(config: SpectrogramConfig):
    """(cos, -sin, fbank) padded so the bin axis is a multiple of _K_TILE.

    numpy on purpose (see frontend._frontend_constants).
    """
    n = config.fft_size
    bins = n // 2 + 1
    padded = ((bins + _K_TILE - 1) // _K_TILE) * _K_TILE
    k = np.arange(bins)
    t = np.arange(n)
    angle = 2.0 * np.pi * np.outer(t, k) / n
    window = _hann_periodic(n).astype(np.float64)
    cos_m = np.cos(angle) * window[:, None]
    sin_m = -np.sin(angle) * window[:, None]
    cos_m = np.pad(cos_m, [(0, 0), (0, padded - bins)]).astype(np.float32)
    sin_m = np.pad(sin_m, [(0, 0), (0, padded - bins)]).astype(np.float32)
    fbank = mel_filterbank(
        num_mel_bins=config.num_mel_bins,
        num_spectrogram_bins=bins,
        sample_rate=config.sample_rate,
        lo_hz=config.mel_lo_hz,
        hi_hz=config.mel_hi_hz,
        style=config.filterbank_style)
    fbank = np.pad(fbank, [(0, padded - bins), (0, 0)]).astype(np.float32)
    return cos_m, sin_m, fbank


def _kernel(blocks_ref, cos_ref, sin_ref, fbank_ref, out_ref, acc_ref,
            *, num_frames: int, chunks: int, hop: int, eps: float):
    k = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # frames[f, j*hop:(j+1)*hop] = blocks[f + j], so the windowed DFT
    # decomposes into per-chunk matmuls accumulated over j — no frame
    # materialization or concat (Mosaic rejects concat of slices with
    # mismatched sublane offsets).
    blocks = blocks_ref[0]
    re = jnp.zeros((num_frames, cos_ref.shape[1]), jnp.float32)
    im = jnp.zeros((num_frames, cos_ref.shape[1]), jnp.float32)
    for j in range(chunks):
        chunk = blocks[j:j + num_frames]                  # (frames, hop)
        # HIGHEST precision: TPU default matmul precision is bf16-multiply,
        # which is far too lossy for a DFT
        re += jnp.dot(chunk, cos_ref[j * hop:(j + 1) * hop, :],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        im += jnp.dot(chunk, sin_ref[j * hop:(j + 1) * hop, :],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im)
    acc_ref[:] += jnp.dot(mag, fbank_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    @pl.when(k == num_k - 1)
    def _():
        mel = acc_ref[:]
        out_ref[0] = jnp.log(jnp.where(mel <= 0.0, eps, mel))


def logmel_pallas(samples: jnp.ndarray,
                  config: SpectrogramConfig = SpectrogramConfig(),
                  interpret: bool = False) -> jnp.ndarray:
    """samples (B, n) -> log-mel (B, n_frames, num_mel_bins).

    Same contract as frontend.compute_logmel for 2-D input (hop-aligned
    segment audio, pad_end framing).
    """
    samples = jnp.asarray(samples, dtype=jnp.float32)
    if samples.ndim != 2:
        raise ValueError('logmel_pallas expects (batch, samples)')
    b, n = samples.shape
    hop = config.hop_width
    fft = config.fft_size
    chunks = fft // hop
    if fft % hop:
        raise ValueError('hop must divide fft_size')
    num_frames = -(-n // hop)

    # hop-blocked audio with pad_end: (B, num_frames + chunks - 1, hop)
    total_blocks = num_frames + chunks - 1
    pad = total_blocks * hop - n
    blocks = jnp.pad(samples, ((0, 0), (0, pad))).reshape(
        b, total_blocks, hop)

    cos_m, sin_m, fbank = _dft_constants(config)
    num_k = cos_m.shape[1] // _K_TILE

    kernel = functools.partial(_kernel, num_frames=num_frames,
                               chunks=chunks, hop=hop, eps=1e-5)
    flops_per_step = 2 * num_frames * fft * _K_TILE * 2 \
        + 2 * num_frames * _K_TILE * config.num_mel_bins
    return pl.pallas_call(
        kernel,
        grid=(b, num_k),
        in_specs=[
            pl.BlockSpec((1, total_blocks, hop), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fft, _K_TILE), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fft, _K_TILE), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K_TILE, config.num_mel_bins),
                         lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_frames, config.num_mel_bins),
                               lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_frames, config.num_mel_bins),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((num_frames, config.num_mel_bins), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * b * num_k,
            bytes_accessed=(blocks.size + 2 * cos_m.size + fbank.size) * 4,
            transcendentals=b * num_frames * config.num_mel_bins),
        interpret=interpret or not _on_tpu(),
    )(blocks, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(fbank))
