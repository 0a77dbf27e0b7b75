"""Tests for the native MIDI reader/writer and sustain processing."""

import numpy as np
import pytest

from mr_mt3_tpu.codec.note_sequences import (
    ControlChange,
    NoteSequence,
)
from mr_mt3_tpu.midi import (
    apply_sustain_control_changes,
    midi_file_to_note_sequence,
    note_sequence_to_midi_file,
    read_midi,
)
from mr_mt3_tpu.midi.reader import midi_to_note_sequence
from mr_mt3_tpu.midi.writer import note_sequence_to_midi_bytes


def _make_ns(note_specs):
    ns = NoteSequence()
    for (start, end, pitch, vel, program, is_drum, instrument) in note_specs:
        ns.add_note(start_time=start, end_time=end, pitch=pitch, velocity=vel,
                    program=program, is_drum=is_drum, instrument=instrument)
        ns.total_time = max(ns.total_time, end)
    return ns


class TestRoundTrip:
    def test_simple_roundtrip(self, tmp_path):
        src = _make_ns([
            (0.0, 0.5, 60, 100, 5, False, 0),
            (0.25, 0.75, 64, 90, 5, False, 0),
            (0.1, 0.6, 40, 80, 33, False, 1),
            (0.3, 0.31, 36, 110, 0, True, 9),
        ])
        path = tmp_path / 'test.mid'
        note_sequence_to_midi_file(src, path)
        midi = read_midi(path)
        # three instruments: two melodic programs + drums
        assert len(midi.instruments) == 3
        programs = sorted((i.program, i.is_drum) for i in midi.instruments)
        assert programs == [(0, True), (5, False), (33, False)]

        ns = midi_to_note_sequence(midi)
        assert len(ns.notes) == 4
        by_pitch = {n.pitch: n for n in ns.notes}
        # 220 tpq at 120 bpm = 440 ticks/s -> ~2.3 ms resolution
        assert by_pitch[60].start_time == pytest.approx(0.0, abs=0.003)
        assert by_pitch[60].end_time == pytest.approx(0.5, abs=0.003)
        assert by_pitch[60].velocity == 100
        assert by_pitch[36].is_drum
        assert by_pitch[40].program == 33

    def test_read_via_note_sequence_helper(self, tmp_path):
        src = _make_ns([(0.0, 1.0, 72, 64, 0, False, 0)])
        path = tmp_path / 'x.mid'
        note_sequence_to_midi_file(src, path)
        ns = midi_file_to_note_sequence(path)
        assert len(ns.notes) == 1
        assert ns.notes[0].pitch == 72

    def test_many_programs_channels_cycle(self, tmp_path):
        # 20 distinct programs forces channel reuse; programs must survive
        src = _make_ns([
            (0.1 * i, 0.1 * i + 0.05, 30 + i, 100, i * 4, False, i)
            for i in range(20)])
        path = tmp_path / 'many.mid'
        note_sequence_to_midi_file(src, path)
        ns = midi_file_to_note_sequence(path)
        assert sorted(n.program for n in ns.notes) == sorted(
            i * 4 for i in range(20))

    def test_same_tick_repeat_notes(self, tmp_path):
        # back-to-back same pitch: off of first lands on same tick as on of
        # second; note-off-first ordering must keep both notes
        src = _make_ns([
            (0.0, 0.5, 60, 100, 0, False, 0),
            (0.5, 1.0, 60, 100, 0, False, 0),
        ])
        path = tmp_path / 'rep.mid'
        note_sequence_to_midi_file(src, path)
        ns = midi_file_to_note_sequence(path)
        assert len(ns.notes) == 2

    def test_zero_length_note_dropped_on_read(self, tmp_path):
        # a note quantizing to zero ticks stays open and is never emitted
        src = _make_ns([(0.0, 0.0005, 60, 100, 0, False, 0)])
        path = tmp_path / 'zero.mid'
        note_sequence_to_midi_file(src, path)
        ns = midi_file_to_note_sequence(path)
        assert len(ns.notes) == 0


class TestTempoHandling:
    def test_tempo_change_affects_times(self):
        # hand-build a two-track file: tempo 120 then 60 bpm at beat 2
        tpq = 480

        def varlen(v):
            out = [v & 0x7F]
            v >>= 7
            while v:
                out.append((v & 0x7F) | 0x80)
                v >>= 7
            return bytes(reversed(out))

        tempo_track = (
            varlen(0) + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, 'big')
            + varlen(2 * tpq) + bytes([0xFF, 0x51, 0x03])
            + (1000000).to_bytes(3, 'big')
            + varlen(0) + bytes([0xFF, 0x2F, 0x00]))
        # note at beat 3 (after the slowdown): t = 1.0s + 1 beat at 60bpm
        note_track = (
            varlen(3 * tpq) + bytes([0x90, 60, 100])
            + varlen(tpq) + bytes([0x80, 60, 0])
            + varlen(0) + bytes([0xFF, 0x2F, 0x00]))

        def chunk(body):
            return b'MTrk' + len(body).to_bytes(4, 'big') + body

        data = (b'MThd' + (6).to_bytes(4, 'big') + (1).to_bytes(2, 'big') +
                (2).to_bytes(2, 'big') + tpq.to_bytes(2, 'big') +
                chunk(tempo_track) + chunk(note_track))
        midi = read_midi(data)
        note = midi.instruments[0].notes[0]
        assert note.start == pytest.approx(2.0)  # 2 beats @120 + 1 beat @60
        assert note.end == pytest.approx(3.0)

    def test_running_status(self):
        tpq = 220
        # two note-ons sharing a status byte (running status)
        def varlen(v):
            return bytes([v]) if v < 128 else b'\x81' + bytes([v & 0x7F])

        track = (varlen(0) + bytes([0x90, 60, 100]) +
                 varlen(0) + bytes([64, 100]) +       # running status note-on
                 varlen(110) + bytes([60, 0]) +        # running: vel-0 = off
                 varlen(0) + bytes([64, 0]) +
                 varlen(0) + bytes([0xFF, 0x2F, 0x00]))
        data = (b'MThd' + (6).to_bytes(4, 'big') + (0).to_bytes(2, 'big') +
                (1).to_bytes(2, 'big') + tpq.to_bytes(2, 'big') +
                b'MTrk' + len(track).to_bytes(4, 'big') + track)
        midi = read_midi(data)
        assert len(midi.instruments[0].notes) == 2


class TestSustain:
    def test_sustain_extends_notes(self):
        ns = _make_ns([(0.0, 0.5, 60, 100, 0, False, 0)])
        ns.control_changes.append(ControlChange(
            time=0.1, control_number=64, control_value=100, instrument=0))
        ns.control_changes.append(ControlChange(
            time=1.0, control_number=64, control_value=0, instrument=0))
        out = apply_sustain_control_changes(ns)
        assert out.notes[0].end_time == pytest.approx(1.0)
        # original untouched
        assert ns.notes[0].end_time == pytest.approx(0.5)

    def test_sustain_other_instrument_unaffected(self):
        ns = _make_ns([(0.0, 0.5, 60, 100, 0, False, 1)])
        ns.control_changes.append(ControlChange(
            time=0.1, control_number=64, control_value=100, instrument=0))
        ns.control_changes.append(ControlChange(
            time=1.0, control_number=64, control_value=0, instrument=0))
        out = apply_sustain_control_changes(ns)
        assert out.notes[0].end_time == pytest.approx(0.5)

    def test_reonset_truncates_sustained_note(self):
        ns = _make_ns([
            (0.0, 0.2, 60, 100, 0, False, 0),
            (0.6, 0.8, 60, 100, 0, False, 0),
        ])
        ns.control_changes.append(ControlChange(
            time=0.0, control_number=64, control_value=127, instrument=0))
        ns.control_changes.append(ControlChange(
            time=2.0, control_number=64, control_value=0, instrument=0))
        out = apply_sustain_control_changes(ns)
        first = min(out.notes, key=lambda n: n.start_time)
        second = max(out.notes, key=lambda n: n.start_time)
        assert first.end_time == pytest.approx(0.6)  # truncated by re-onset
        assert second.end_time == pytest.approx(2.0)  # held to pedal release

    def test_note_ending_after_release_unchanged(self):
        ns = _make_ns([(0.0, 1.5, 60, 100, 0, False, 0)])
        ns.control_changes.append(ControlChange(
            time=0.1, control_number=64, control_value=100, instrument=0))
        ns.control_changes.append(ControlChange(
            time=1.0, control_number=64, control_value=0, instrument=0))
        out = apply_sustain_control_changes(ns)
        assert out.notes[0].end_time == pytest.approx(1.5)

    def test_non_sustain_cc_ignored(self):
        ns = _make_ns([(0.0, 0.5, 60, 100, 0, False, 0)])
        ns.control_changes.append(ControlChange(
            time=0.1, control_number=7, control_value=100, instrument=0))
        out = apply_sustain_control_changes(ns)
        assert out.notes[0].end_time == pytest.approx(0.5)

    def test_same_time_release_and_repress_leaves_pedal_off(self):
        """note_seq sorts events by (time, type) with SUSTAIN_ON before
        SUSTAIN_OFF, so a release+re-press at the same timestamp nets to
        pedal OFF regardless of CC list order — a list-order tie-break
        would leave the pedal stuck ON and extend every later note."""
        ns = _make_ns([(0.0, 0.5, 60, 100, 0, False, 0),
                       (2.5, 2.7, 62, 100, 0, False, 0)])
        ns.control_changes.append(ControlChange(
            time=0.1, control_number=64, control_value=100, instrument=0))
        # same-time pair listed OFF-then-ON (the adversarial order); a
        # list-order tie-break would process OFF first and leave the
        # pedal stuck ON, so the 3.5 s release would extend note 2
        ns.control_changes.append(ControlChange(
            time=2.0, control_number=64, control_value=0, instrument=0))
        ns.control_changes.append(ControlChange(
            time=2.0, control_number=64, control_value=100, instrument=0))
        ns.control_changes.append(ControlChange(
            time=3.5, control_number=64, control_value=0, instrument=0))
        out = apply_sustain_control_changes(ns)
        first = min(out.notes, key=lambda n: n.start_time)
        later = max(out.notes, key=lambda n: n.start_time)
        assert first.end_time == pytest.approx(2.0)  # released at 2.0
        assert later.end_time == pytest.approx(2.7)  # pedal OFF after 2.0

    def test_sustain_roundtrip_through_midi(self, tmp_path):
        # write CCs to MIDI, read back, apply sustain
        ns = _make_ns([(0.0, 0.5, 60, 100, 5, False, 0)])
        ns.control_changes.append(ControlChange(
            time=0.1, control_number=64, control_value=100, instrument=0,
            program=5))
        ns.control_changes.append(ControlChange(
            time=1.2, control_number=64, control_value=0, instrument=0,
            program=5))
        path = tmp_path / 'sus.mid'
        note_sequence_to_midi_file(ns, path)
        back = midi_file_to_note_sequence(path)
        assert len(back.control_changes) == 2
        out = apply_sustain_control_changes(back)
        assert out.notes[0].end_time == pytest.approx(1.2, abs=0.003)


def _smf(track_events: bytes, tpq: int = 220) -> bytes:
    """Minimal single-track SMF wrapper for hand-ordered event bytes."""
    track = track_events + bytes([0x00, 0xFF, 0x2F, 0x00])
    return (b'MThd' + (6).to_bytes(4, 'big') + (0).to_bytes(2, 'big')
            + (1).to_bytes(2, 'big') + tpq.to_bytes(2, 'big')
            + b'MTrk' + len(track).to_bytes(4, 'big') + track)


class TestStragglerSemantics:
    """pretty_midi's _load_instruments: CC/pitch-bend events never create
    real instruments — pre-note events are carried into the instrument
    the notes eventually create, and CC-only channels yield nothing."""

    def test_cc_before_program_change_joins_note_instrument(self):
        # CC64 arrives BEFORE the program change and the first note; a
        # naive reader would create a (program 0) instrument for the CC
        # and a (program 32) instrument for the notes, detaching the
        # sustain pedal from the notes it governs
        data = _smf(bytes([
            0x00, 0xB0, 0x40, 0x64,   # CC64=100 on ch0 (pre-note)
            0x00, 0xC0, 0x20,         # program change -> 32
            0x0A, 0x90, 0x3C, 0x64,   # note on
            0x64, 0x80, 0x3C, 0x00,   # note off
        ]))
        midi = read_midi(data)
        assert len(midi.instruments) == 1
        inst = midi.instruments[0]
        assert inst.program == 32
        assert len(inst.notes) == 1
        assert [cc.number for cc in inst.control_changes] == [64]
        # and through the NoteSequence view the CC shares the note's
        # instrument index, so apply_sustain_control_changes matches them
        ns = midi_to_note_sequence(midi)
        assert ns.control_changes[0].instrument == 0

    def test_cc_only_channel_yields_no_instrument(self):
        data = _smf(bytes([
            0x00, 0xB1, 0x07, 0x7F,   # volume CC on ch1 — never any note
            0x00, 0xC0, 0x05,         # ch0: program 5
            0x00, 0x90, 0x3C, 0x64,
            0x64, 0x80, 0x3C, 0x00,
        ]))
        midi = read_midi(data)
        assert len(midi.instruments) == 1
        assert midi.instruments[0].program == 5


class TestPitchBendRoundTrip:
    def test_writer_preserves_pitch_bends(self, tmp_path):
        """A read-write round trip must not drop pitch bends
        (note_seq's writer emits them through pretty_midi)."""
        ns = _make_ns([(0.0, 0.5, 60, 100, 7, False, 0)])
        from mr_mt3_tpu.codec.note_sequences import PitchBend
        ns.pitch_bends.append(PitchBend(
            time=0.25, bend=1234, instrument=0, program=7))
        ns.pitch_bends.append(PitchBend(
            time=0.4, bend=-8192, instrument=0, program=7))
        path = tmp_path / 'bend.mid'
        note_sequence_to_midi_file(ns, path)
        back = midi_file_to_note_sequence(path)
        assert sorted(pb.bend for pb in back.pitch_bends) == [-8192, 1234]
        assert back.pitch_bends[0].instrument == 0
