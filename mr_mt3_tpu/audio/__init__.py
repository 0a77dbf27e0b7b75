"""Audio frontend: framing, log-mel spectrograms (JAX), and WAV I/O."""

from mr_mt3_tpu.audio.frontend import (
    MIN_LOG_MEL,
    MAX_LOG_MEL,
    SpectrogramConfig,
    compute_logmel,
    flatten_frames,
    frame_times,
    normalize_logmel,
    split_audio,
)
from mr_mt3_tpu.audio.io import (
    read_audio,
    read_wav,
    read_wav_bytes,
    resample,
    write_wav,
)
