"""Inference: audio -> multi-track MIDI transcription engine."""

from mr_mt3_tpu.infer.handler import InferenceHandler
from mr_mt3_tpu.infer.probe import quantize_probe, resolve_auto_quantize
