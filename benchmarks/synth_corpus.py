"""Non-memorized synthetic corpus for generalization experiments.

Round-3's e2e corpus was 2 memorized songs — good for pipeline health,
useless for quality claims (exposure bias dominates, and the probe
ladder's tier question "does a CONVERGED checkpoint keep int4 margins?"
can't be answered on overfit weights). This generates a corpus large
enough to force generalization:

  * many songs (train/held-out split), each 1-2 stems from a bank of
    additive-synthesis instruments with distinct harmonic profiles
    (so program tokens carry real signal). Density is calibrated so a
    46M model converges within a ~15k-step single-chip budget: a first
    3-stem/denser variant left the model at F1 0.09 after its val
    plateau — transcription learning curves need either far more steps
    or an easier mixture;
  * melodies are random walks on diatonic scales with varied durations,
    including sustains crossing the 2.048 s segment boundary -- the
    regime segmem's cross-segment memory exists for (reference:
    models/t5_segmem_v2_with_prev.py:38-42);
  * fully deterministic given a seed; no external synth needed.

Used by benchmarks/dev_generalization_e2e.py. Audio layout on disk is
the Slakh layout SlakhDataset discovers (TrackNNNNN/mix_16k.wav +
MIDI/Sxx.mid + inst_names.json).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np

SR = 16000
SEGMENT_SECONDS = 256 * 128 / SR  # 2.048 s

# name -> (harmonic amplitudes, decay rate 1/s, pitch lo, pitch hi)
# Distinct spectra/envelopes so the model can identify the program from
# timbre; names must be keys of codec.slakh.SLAKH_CLASS_PROGRAMS.
INSTRUMENTS: Dict[str, Tuple[Tuple[float, ...], float, int, int]] = {
    'Acoustic Piano': ((1.0, 0.5, 0.33, 0.2, 0.12, 0.07), 2.5, 48, 84),
    'Organ': ((0.8, 0.0, 0.6, 0.0, 0.5, 0.0, 0.4), 0.0, 48, 79),
    'Acoustic Bass': ((1.0, 0.25, 0.08), 1.2, 28, 52),
    'Clarinet': ((0.9, 0.02, 0.55, 0.03, 0.3), 0.3, 50, 86),
}

MAJOR_SCALE = np.array([0, 2, 4, 5, 7, 9, 11])


def _scale_pitches(root: int, lo: int, hi: int) -> np.ndarray:
    octaves = np.arange(-2, 8)[:, None] * 12
    pitches = (root + octaves + MAJOR_SCALE[None, :]).ravel()
    return np.sort(pitches[(pitches >= lo) & (pitches <= hi)])


def synth_note(pitch: int, dur: float, harmonics, decay: float,
               velocity: float) -> np.ndarray:
    """Additive render; 10 ms attack, decay/release per instrument."""
    n = max(int(dur * SR), 1)
    t = np.arange(n, dtype=np.float32) / SR
    f0 = 440.0 * 2.0 ** ((pitch - 69) / 12.0)
    out = np.zeros(n, np.float32)
    for i, amp in enumerate(harmonics):
        f = f0 * (i + 1)
        if amp <= 0 or f >= SR / 2:
            continue
        out += amp * np.sin(2 * np.pi * f * t, dtype=np.float32)
    env = np.minimum(t / 0.01, 1.0)
    if decay > 0:
        env = env * np.exp(-decay * t)
    release = min(0.04, dur / 4)
    env = env * np.clip((dur - t) / release, 0.0, 1.0)
    return (velocity * env * out).astype(np.float32)


# difficulty presets: 'standard' is the generalization corpus; 'easy'
# slows the note rate, lengthens notes and restricts to two registrally
# separated instruments so a 46M model can MASTER it inside a ~10k-step
# single-chip budget — used to measure quantize-tier margins on a
# confident converged checkpoint (a budget-limited checkpoint on the
# standard corpus has razor-thin margins by construction)
PRESETS = {
    'standard': dict(insts=None, short_dur=(0.15, 0.8), gap=(0.6, 1.5),
                     walk=3),
    'easy': dict(insts=('Acoustic Piano', 'Acoustic Bass'),
                 short_dur=(0.3, 1.0), gap=(1.1, 1.9), walk=2),
}


def make_song(rng: np.random.Generator,
              duration: float = 8.0 * SEGMENT_SECONDS,
              n_stems: Tuple[int, int] = (1, 2),
              preset: str = 'standard',
              ) -> Tuple[np.ndarray, Dict[str, dict]]:
    """One multi-stem song.

    Returns (mix audio, stems) where stems maps 'S00'... to
    {'inst': name, 'notes': [(start, end, pitch, velocity), ...]}.
    Long notes (up to ~1.5 segments) are drawn with probability 0.15 so
    sustained-across-boundary ties appear in every song.
    """
    p = PRESETS[preset]
    names = list(p['insts'] or INSTRUMENTS)
    # inclusive range: (2, 3) means 2 or 3 stems
    n = min(int(rng.integers(n_stems[0], n_stems[1] + 1)), len(names))
    chosen = rng.choice(len(names), size=n, replace=False)
    root = int(rng.integers(0, 12))
    total = int(duration * SR)
    mix = rng.normal(size=total).astype(np.float32) * 1e-3  # -60 dB floor
    stems = {}
    for si, idx in enumerate(chosen):
        name = names[idx]
        harmonics, decay, lo, hi = INSTRUMENTS[name]
        pitches = _scale_pitches(root, lo, hi)
        pos = int(rng.integers(0, len(pitches)))
        t = float(rng.uniform(0.05, 0.6))
        notes = []
        while t < duration - 0.3:
            pos = int(np.clip(pos + rng.integers(-p['walk'], p['walk'] + 1),
                              0, len(pitches) - 1))
            pitch = int(pitches[pos])
            if rng.random() < 0.15:
                dur = float(rng.uniform(1.8, 3.2))  # crosses a boundary
            else:
                dur = float(rng.uniform(*p['short_dur']))
            dur = min(dur, duration - t - 0.05)
            vel = float(rng.uniform(0.35, 0.65))
            i0 = int(t * SR)
            wave = synth_note(pitch, dur, harmonics, decay, vel)
            mix[i0:i0 + len(wave)] += wave[:total - i0]
            notes.append((round(t, 4), round(t + dur, 4), pitch,
                          int(40 + 87 * vel)))
            t += dur * float(rng.uniform(*p['gap'])) + 0.1
        stems[f'S{si:02d}'] = {'inst': name, 'notes': notes}
    peak = np.abs(mix).max()
    if peak > 0.95:
        mix *= 0.95 / peak
    return mix, stems


def write_corpus(root_dir: str, n_songs: int, seed: int,
                 duration_segments: int = 8,
                 preset: str = 'standard') -> List[str]:
    """Render n_songs under root_dir in the Slakh on-disk layout."""
    from mr_mt3_tpu.audio import write_wav
    from mr_mt3_tpu.codec import note_sequences as nsq
    from mr_mt3_tpu.midi import note_sequence_to_midi_file

    rng = np.random.default_rng(seed)
    tracks = []
    for i in range(n_songs):
        d = os.path.join(root_dir, f'Track{i + 1:05d}')
        os.makedirs(os.path.join(d, 'MIDI'), exist_ok=True)
        mix, stems = make_song(
            rng, duration=duration_segments * SEGMENT_SECONDS,
            preset=preset)
        write_wav(os.path.join(d, 'mix_16k.wav'), mix, SR)
        inst_names = {}
        for stem_id, stem in stems.items():
            inst_names[stem_id] = stem['inst']
            ns = nsq.NoteSequence()
            for start, end, pitch, vel in stem['notes']:
                ns.add_note(start_time=start, end_time=end, pitch=pitch,
                            velocity=vel, program=0, is_drum=False,
                            instrument=0)
                ns.total_time = max(ns.total_time, end)
            note_sequence_to_midi_file(
                ns, os.path.join(d, 'MIDI', f'{stem_id}.mid'))
        with open(os.path.join(d, 'inst_names.json'), 'w') as f:
            json.dump(inst_names, f)
        tracks.append(d)
    return tracks
