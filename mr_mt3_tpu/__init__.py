"""mr_mt3_tpu — a TPU-native multi-track music transcription framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MR-MT3
(gudgud96/MR-MT3): T5-style encoder-decoder transcription of 16 kHz audio
into multi-track MIDI event tokens, with the MR-MT3 segment-memory family,
training, inference, and evaluation — designed TPU-first (static shapes,
scan-based decode with KV cache, pjit data-parallel meshes).

Layer map (bottom-up):
  codec/     token codec + MIDI event ontology (host-side, numpy)
  midi/      native Standard MIDI File reader/writer (no external deps)
  audio/     log-mel frontend (JAX + Pallas) and audio IO
  models/    Flax T5/MT3 model family incl. segment memory variants
  ops/       decode loops, Pallas kernels
  data/      Slakh / ComMU dataset pipelines (host-side, threaded)
  train/     losses, optimizer schedules, train loop, checkpointing
  infer/     InferenceHandler: audio -> MIDI transcription engine
  eval/      mir_eval-equivalent transcription metrics + program-aware F1
  parallel/  mesh / sharding helpers
  utils/     config system, profiling, misc
"""

__version__ = "0.1.0"
