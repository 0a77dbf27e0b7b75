"""Inference: audio -> multi-track MIDI transcription engine."""

from mr_mt3_tpu.infer.handler import InferenceHandler
