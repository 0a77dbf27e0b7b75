"""Standard MIDI File reader (dependency-free).

Parses SMF format 0/1 and reproduces the views the reference pipeline uses:

  * a pretty_midi-style instrument view (`MidiFile.instruments`, each with
    program / is_drum / notes) — used by the program-aware evaluator
    (reference: evaluate.py:64-65,121-133);
  * a note_seq-style flat `NoteSequence` — used by the tokenizer
    (reference: dataset/dataset_2_random.py:100-107 via
    note_seq.midi_file_to_note_sequence).

Semantics follow pretty_midi: tempo map read from track 0 only, tick times
converted through the piecewise tempo map, note-ons paired with the next
note-off of the same (channel, pitch) closing *all* earlier onsets, drums on
channel 9, per-channel running program numbers.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

from mr_mt3_tpu.codec.note_sequences import (
    ControlChange,
    NoteSequence,
    PitchBend,
)

_DEFAULT_TEMPO_US = 500000  # 120 bpm


@dataclasses.dataclass
class MidiNote:
    velocity: int
    pitch: int
    start: float
    end: float


@dataclasses.dataclass
class MidiControlChange:
    number: int
    value: int
    time: float


@dataclasses.dataclass
class MidiPitchBend:
    pitch: int  # bend amount, -8192..8191
    time: float


@dataclasses.dataclass
class MidiInstrument:
    program: int
    is_drum: bool = False
    name: str = ''
    notes: List[MidiNote] = dataclasses.field(default_factory=list)
    control_changes: List[MidiControlChange] = dataclasses.field(
        default_factory=list)
    pitch_bends: List[MidiPitchBend] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class MidiFile:
    instruments: List[MidiInstrument] = dataclasses.field(default_factory=list)
    ticks_per_quarter: int = 220
    # (time_s, tempo_qpm) pairs
    tempo_changes: List[Tuple[float, float]] = dataclasses.field(
        default_factory=list)

    def get_end_time(self) -> float:
        end = 0.0
        for inst in self.instruments:
            for n in inst.notes:
                end = max(end, n.end)
        return end


class _ByteReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) < n:
            raise ValueError('unexpected end of MIDI data')
        self.pos += n
        return out

    def u8(self) -> int:
        return self.read(1)[0]

    def peek_u8(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError('unexpected end of MIDI data')
        return self.data[self.pos]

    def u16(self) -> int:
        b = self.read(2)
        return (b[0] << 8) | b[1]

    def u32(self) -> int:
        b = self.read(4)
        return (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]

    def varlen(self) -> int:
        value = 0
        while True:
            b = self.u8()
            value = (value << 7) | (b & 0x7F)
            if not b & 0x80:
                return value

    @property
    def remaining(self) -> int:
        return len(self.data) - self.pos


@dataclasses.dataclass
class _RawEvent:
    tick: int
    kind: str
    channel: int = 0
    a: int = 0  # pitch / controller / program / bend low
    b: int = 0  # velocity / value / bend high


def _parse_track(reader: _ByteReader, length: int):
    """Parse one MTrk chunk into raw events + tempo meta events."""
    end_pos = reader.pos + length
    events: List[_RawEvent] = []
    tempos: List[Tuple[int, int]] = []  # (tick, tempo_us)
    track_name = ''
    tick = 0
    running_status = 0
    while reader.pos < end_pos:
        tick += reader.varlen()
        status = reader.peek_u8()
        if status & 0x80:
            reader.u8()
            if status < 0xF0:
                running_status = status
        else:
            status = running_status
            if not status & 0x80:
                raise ValueError('running status without prior status byte')

        if status == 0xFF:  # meta
            meta_type = reader.u8()
            meta_len = reader.varlen()
            payload = reader.read(meta_len)
            if meta_type == 0x51 and meta_len == 3:
                tempo_us = (payload[0] << 16) | (payload[1] << 8) | payload[2]
                tempos.append((tick, tempo_us))
            elif meta_type == 0x03 and not track_name:
                track_name = payload.decode('latin-1', errors='replace')
            elif meta_type == 0x2F:
                break
        elif status in (0xF0, 0xF7):  # sysex
            sysex_len = reader.varlen()
            reader.read(sysex_len)
        else:
            kind = status & 0xF0
            channel = status & 0x0F
            if kind == 0x90:
                a, b = reader.u8(), reader.u8()
                events.append(_RawEvent(tick, 'note_on', channel, a, b))
            elif kind == 0x80:
                a, b = reader.u8(), reader.u8()
                events.append(_RawEvent(tick, 'note_off', channel, a, b))
            elif kind == 0xB0:
                a, b = reader.u8(), reader.u8()
                events.append(_RawEvent(tick, 'control', channel, a, b))
            elif kind == 0xC0:
                a = reader.u8()
                events.append(_RawEvent(tick, 'program', channel, a))
            elif kind == 0xE0:
                a, b = reader.u8(), reader.u8()
                events.append(_RawEvent(tick, 'pitch_bend', channel, a, b))
            elif kind in (0xA0, 0xD0):
                # aftertouch: polyphonic has 2 data bytes, channel has 1
                reader.u8()
                if kind == 0xA0:
                    reader.u8()
            else:
                raise ValueError(f'unknown MIDI status byte: {status:#x}')
    reader.pos = end_pos
    return events, tempos, track_name


class _TempoMap:
    """Piecewise-linear tick -> seconds conversion."""

    def __init__(self, tempo_events: List[Tuple[int, int]], tpq: int):
        # Consolidate: implicit 120 bpm at tick 0 unless overridden there.
        changes: List[Tuple[int, int]] = []
        if not tempo_events or tempo_events[0][0] != 0:
            changes.append((0, _DEFAULT_TEMPO_US))
        changes.extend(sorted(tempo_events))
        self._ticks: List[int] = []
        self._times: List[float] = []
        self._scales: List[float] = []
        t = 0.0
        prev_tick = 0
        prev_scale = changes[0][1] / 1e6 / tpq
        self._ticks.append(0)
        self._times.append(0.0)
        self._scales.append(prev_scale)
        for tick, tempo_us in changes[1:]:
            t += (tick - prev_tick) * prev_scale
            prev_tick = tick
            prev_scale = tempo_us / 1e6 / tpq
            self._ticks.append(tick)
            self._times.append(t)
            self._scales.append(prev_scale)
        self.tempo_changes_qpm = [
            (time, 6e7 / (scale * tpq * 1e6))
            for time, scale in zip(self._times, self._scales)]

    def time(self, tick: int) -> float:
        # Linear scan from the end is fine: few tempo changes in practice.
        i = len(self._ticks) - 1
        while i > 0 and self._ticks[i] > tick:
            i -= 1
        return self._times[i] + (tick - self._ticks[i]) * self._scales[i]


def read_midi(path_or_bytes) -> MidiFile:
    """Parse an SMF file into a pretty_midi-style MidiFile."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, 'rb') as f:
            data = f.read()
    reader = _ByteReader(data)
    if reader.read(4) != b'MThd':
        raise ValueError('not a MIDI file (missing MThd)')
    header_len = reader.u32()
    fmt = reader.u16()
    ntracks = reader.u16()
    division = reader.u16()
    if header_len > 6:
        reader.read(header_len - 6)
    if division & 0x8000:
        raise ValueError('SMPTE time division is not supported')
    tpq = division

    all_tracks = []
    tempo_events: List[Tuple[int, int]] = []
    for track_idx in range(ntracks):
        while reader.remaining >= 8 and reader.read(4) != b'MTrk':
            # skip unknown chunk
            reader.read(reader.u32())
        if reader.remaining < 4:
            break
        length = reader.u32()
        events, tempos, name = _parse_track(reader, length)
        all_tracks.append((events, name))
        if track_idx == 0:
            # pretty_midi reads the tempo map from the first track only.
            tempo_events = tempos

    tempo_map = _TempoMap(tempo_events, tpq)

    midi = MidiFile(ticks_per_quarter=tpq,
                    tempo_changes=tempo_map.tempo_changes_qpm)
    instrument_map: Dict[Tuple[int, int, int], MidiInstrument] = {}
    # pretty_midi's "straggler" semantics (PrettyMIDI._load_instruments):
    # a CC/pitch-bend NEVER creates a real instrument — before the first
    # note on a (channel, track) it lands on a straggler, whose event
    # lists are carried (as the same list objects, matching pretty_midi's
    # aliasing) into each instrument later created on that channel/track.
    # Stragglers that never see a note are dropped entirely, so CC-only
    # channels do not fabricate empty instruments, and a sustain pedal
    # recorded before the first note still governs that instrument's
    # notes in apply_sustain_control_changes.
    stragglers: Dict[Tuple[int, int], MidiInstrument] = {}

    def get_instrument(program: int, channel: int, track: int,
                       name: str, create_new: bool) -> MidiInstrument:
        key = (program, channel, track)
        if key in instrument_map:
            return instrument_map[key]
        skey = (channel, track)
        if not create_new and skey in stragglers:
            return stragglers[skey]
        inst = MidiInstrument(program=program, is_drum=(channel == 9),
                              name=name)
        if skey in stragglers:
            straggler = stragglers[skey]
            inst.control_changes = straggler.control_changes
            inst.pitch_bends = straggler.pitch_bends
        if create_new:
            instrument_map[key] = inst
            midi.instruments.append(inst)
        else:
            stragglers[skey] = inst
        return inst

    for track_idx, (events, name) in enumerate(all_tracks):
        # open note-ons per (channel, pitch): list of (start_tick, velocity)
        last_note_on: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        channel_program = [0] * 16
        for ev in events:
            if ev.kind == 'program':
                channel_program[ev.channel] = ev.a
            elif ev.kind == 'note_on' and ev.b > 0:
                last_note_on.setdefault((ev.channel, ev.a), []).append(
                    (ev.tick, ev.b))
            elif ev.kind == 'note_off' or (ev.kind == 'note_on' and ev.b == 0):
                key = (ev.channel, ev.a)
                if key in last_note_on:
                    end_tick = ev.tick
                    open_notes = last_note_on[key]
                    # close all earlier onsets; zero-length ones stay open
                    to_close = [(s, v) for s, v in open_notes if s != end_tick]
                    to_keep = [(s, v) for s, v in open_notes if s == end_tick]
                    for start_tick, velocity in to_close:
                        inst = get_instrument(channel_program[ev.channel],
                                              ev.channel, track_idx, name,
                                              create_new=True)
                        inst.notes.append(MidiNote(
                            velocity=velocity, pitch=ev.a,
                            start=tempo_map.time(start_tick),
                            end=tempo_map.time(end_tick)))
                    if to_close and to_keep:
                        last_note_on[key] = to_keep
                    else:
                        del last_note_on[key]
            elif ev.kind == 'control':
                inst = get_instrument(channel_program[ev.channel], ev.channel,
                                      track_idx, name, create_new=False)
                inst.control_changes.append(MidiControlChange(
                    number=ev.a, value=ev.b, time=tempo_map.time(ev.tick)))
            elif ev.kind == 'pitch_bend':
                inst = get_instrument(channel_program[ev.channel], ev.channel,
                                      track_idx, name, create_new=False)
                bend = ((ev.b << 7) | ev.a) - 8192
                inst.pitch_bends.append(MidiPitchBend(
                    pitch=bend, time=tempo_map.time(ev.tick)))
    return midi


def midi_to_note_sequence(midi: MidiFile) -> NoteSequence:
    """Flatten a MidiFile into a NoteSequence (note_seq.midi_to_note_sequence)."""
    ns = NoteSequence(ticks_per_quarter=midi.ticks_per_quarter)
    for inst_idx, inst in enumerate(midi.instruments):
        for n in inst.notes:
            ns.add_note(
                pitch=n.pitch, velocity=n.velocity,
                start_time=n.start, end_time=n.end,
                program=inst.program, is_drum=inst.is_drum,
                instrument=inst_idx)
            ns.total_time = max(ns.total_time, n.end)
        for cc in inst.control_changes:
            ns.control_changes.append(ControlChange(
                time=cc.time, control_number=cc.number,
                control_value=cc.value, instrument=inst_idx,
                program=inst.program, is_drum=inst.is_drum))
        for pb in inst.pitch_bends:
            ns.pitch_bends.append(PitchBend(
                time=pb.time, bend=pb.pitch, instrument=inst_idx,
                program=inst.program, is_drum=inst.is_drum))
    return ns


def midi_file_to_note_sequence(path) -> NoteSequence:
    """Read an SMF file directly into a NoteSequence."""
    return midi_to_note_sequence(read_midi(path))
