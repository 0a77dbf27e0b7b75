"""Native Standard MIDI File I/O.

The reference delegates MIDI parsing/writing to pretty_midi / note_seq
(C-backed protobuf + mido). This package is a dependency-free rebuild with
matching semantics:

  reader.py  — SMF -> MidiFile (instrument view) / NoteSequence (flat view),
               following pretty_midi's note-pairing and tempo-map rules.
  writer.py  — NoteSequence -> SMF, following note_seq.sequence_proto_to_
               midi_file (tpq from sequence, 120 qpm, drums on channel 9).
  sustain.py — sustain-pedal (CC64) note extension, following
               note_seq.apply_sustain_control_changes.
"""

from mr_mt3_tpu.midi.reader import MidiFile, MidiInstrument, MidiNote, midi_file_to_note_sequence, read_midi
from mr_mt3_tpu.midi.writer import note_sequence_to_midi_file
from mr_mt3_tpu.midi.sustain import apply_sustain_control_changes
