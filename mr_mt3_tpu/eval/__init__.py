"""Transcription evaluation: onset matching + program-aware F1."""

from mr_mt3_tpu.eval.transcription import (
    f_measure,
    match_notes,
    midi_to_hz,
    precision_recall_f1_overlap,
)
from mr_mt3_tpu.eval.evaluate import (
    compute_transcription_metrics,
    evaluate_main,
    get_granular_program,
    loop_transcription_eval,
    program_aware_note_scores,
)
