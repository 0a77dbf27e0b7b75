"""Flax model family: MT3 T5 encoder-decoder + MR-MT3 segment memory."""

from mr_mt3_tpu.models.config import MT3Config
from mr_mt3_tpu.models.mt3 import MT3, shift_right
