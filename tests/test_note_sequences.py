"""Tests for the note-sequence helpers and the decode state machine."""

import numpy as np
import pytest

from mr_mt3_tpu.codec import VocabularyConfig, build_codec
from mr_mt3_tpu.codec import note_sequences as ns_lib
from mr_mt3_tpu.codec import rle
from mr_mt3_tpu.codec.combine import event_predictions_to_ns
from mr_mt3_tpu.codec.events import Event


@pytest.fixture(scope='module')
def codec():
    return build_codec(VocabularyConfig(num_velocity_bins=1))


def _make_ns(note_specs):
    ns = ns_lib.NoteSequence()
    for (start, end, pitch, vel, program, is_drum) in note_specs:
        ns.add_note(start_time=start, end_time=end, pitch=pitch, velocity=vel,
                    program=program, is_drum=is_drum)
        ns.total_time = max(ns.total_time, end)
    return ns



def _encode_song(src, codec, frame_times):
    """Full-song RLE encoding with tie-state indexing (the dataset's
    tokenize step)."""
    times, values = (
        ns_lib.note_sequence_to_onsets_and_offsets_and_programs(src))
    return rle.encode_and_index_events(
        state=ns_lib.NoteEncodingState(),
        event_times=times, event_values=values,
        encode_event_fn=ns_lib.note_event_data_to_events,
        codec=codec, frame_times=frame_times,
        encoding_state_to_events_fn=ns_lib.note_encoding_state_to_events)


def _segment_tokens(encoded, codec, f0, f1):
    """Token span for frames [f0, f1) with its tie-state prefix, the way
    the dataset slicer does (reference: dataset_2_random.py:174-196)."""
    events, starts, ends, state_events, state_idx = encoded
    tok = events[starts[f0]:ends[f1 - 1]]
    s0 = state_idx[f0]
    s1 = s0 + 1
    while state_events[s1 - 1] != 1131:
        s1 += 1
    seg = np.concatenate([state_events[s0:s1], tok])
    return rle.run_length_encode_shifts(seg, codec)


class TestHelpers:
    def test_trim_overlapping_notes(self):
        ns = _make_ns([
            (0.0, 1.0, 60, 100, 0, False),
            (0.5, 1.5, 60, 100, 0, False),   # same channel: trims the first
            (0.5, 1.5, 62, 100, 0, False),   # different pitch: untouched
            (0.5, 0.5, 64, 100, 0, False),   # zero length: dropped
        ])
        trimmed = ns_lib.trim_overlapping_notes(ns)
        by_pitch = {n.pitch: n for n in trimmed.notes if n.pitch != 60}
        firsts = sorted([n for n in trimmed.notes if n.pitch == 60],
                        key=lambda n: n.start_time)
        assert firsts[0].end_time == 0.5
        assert firsts[1].end_time == 1.5
        assert 62 in by_pitch and 64 not in by_pitch

    def test_assign_instruments(self):
        ns = _make_ns([
            (0.0, 1.0, 60, 100, 5, False),
            (0.0, 1.0, 40, 100, 3, False),
            (0.0, 1.0, 36, 100, 0, True),
            (1.0, 2.0, 61, 100, 5, False),
        ])
        ns_lib.assign_instruments(ns)
        assert ns.notes[0].instrument == 0
        assert ns.notes[1].instrument == 1
        assert ns.notes[2].instrument == 9  # drums
        assert ns.notes[3].instrument == 0  # same program as first

    def test_assign_instruments_skips_nine(self):
        ns = _make_ns([(0.0, 1.0, 50 + p, 100, p, False) for p in range(11)])
        ns_lib.assign_instruments(ns)
        instruments = [n.instrument for n in ns.notes]
        assert instruments == [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11]

    def test_validate(self):
        with pytest.raises(ValueError):
            ns_lib.validate_note_sequence(
                _make_ns([(1.0, 0.5, 60, 100, 0, False)]))
        with pytest.raises(ValueError):
            ns_lib.validate_note_sequence(
                _make_ns([(0.0, 0.5, 60, 0, 0, False)]))

    def test_onsets_offsets_programs_ordering(self):
        ns = _make_ns([
            (0.0, 1.0, 60, 100, 5, False),
            (0.2, 0.8, 36, 90, 0, True),
        ])
        times, values = (
            ns_lib.note_sequence_to_onsets_and_offsets_and_programs(ns))
        # one offset (non-drum only) + two onsets
        assert len(times) == 3
        assert values[0].velocity == 0 and values[0].pitch == 60
        drum_values = [v for v in values if v.is_drum]
        assert len(drum_values) == 1 and drum_values[0].velocity == 90


class TestEventDataToEvents:
    def test_full_triple(self, codec):
        state = ns_lib.NoteEncodingState()
        events = ns_lib.note_event_data_to_events(
            state, ns_lib.NoteEventData(pitch=60, velocity=100, program=5),
            codec)
        assert events == [Event('program', 5), Event('velocity', 1),
                          Event('pitch', 60)]
        assert state.active_pitches[(60, 5)] == 1

    def test_drum(self, codec):
        events = ns_lib.note_event_data_to_events(
            None, ns_lib.NoteEventData(pitch=36, velocity=90, program=0,
                                       is_drum=True), codec)
        assert events == [Event('velocity', 1), Event('drum', 36)]

    def test_offset(self, codec):
        state = ns_lib.NoteEncodingState()
        events = ns_lib.note_event_data_to_events(
            state, ns_lib.NoteEventData(pitch=60, velocity=0, program=5),
            codec)
        assert events == [Event('program', 5), Event('velocity', 0),
                          Event('pitch', 60)]
        assert state.active_pitches[(60, 5)] == 0

    def test_state_to_events_order(self):
        state = ns_lib.NoteEncodingState()
        state.active_pitches = {(60, 5): 1, (40, 3): 1, (70, 3): 1,
                                (50, 5): 0}
        events = ns_lib.note_encoding_state_to_events(state)
        # sorted by (program, pitch); zero-velocity (inactive) pairs dropped
        assert events == [Event('program', 3), Event('pitch', 40),
                          Event('program', 3), Event('pitch', 70),
                          Event('program', 5), Event('pitch', 60),
                          Event('tie', 0)]


class TestDecodingStateMachine:
    def test_onset_offset_note(self, codec):
        state = ns_lib.NoteDecodingState()
        ns_lib.decode_note_event(state, 0.0, Event('program', 5), codec)
        ns_lib.decode_note_event(state, 0.0, Event('velocity', 1), codec)
        ns_lib.decode_note_event(state, 0.0, Event('pitch', 60), codec)
        ns_lib.decode_note_event(state, 0.5, Event('velocity', 0), codec)
        ns_lib.decode_note_event(state, 0.5, Event('pitch', 60), codec)
        result = ns_lib.flush_note_decoding_state(state)
        assert len(result.notes) == 1
        n = result.notes[0]
        assert (n.start_time, n.end_time, n.pitch, n.program) == (
            0.0, 0.5, 60, 5)
        assert n.velocity == 127  # bin 1 of 1 -> 127

    def test_time_regression_raises(self, codec):
        state = ns_lib.NoteDecodingState()
        ns_lib.decode_note_event(state, 1.0, Event('velocity', 1), codec)
        with pytest.raises(ValueError):
            ns_lib.decode_note_event(state, 0.5, Event('pitch', 60), codec)

    def test_offset_for_inactive_raises(self, codec):
        state = ns_lib.NoteDecodingState()
        ns_lib.decode_note_event(state, 0.0, Event('velocity', 0), codec)
        with pytest.raises(ValueError):
            ns_lib.decode_note_event(state, 0.0, Event('pitch', 60), codec)

    def test_double_onset_closes_previous(self, codec):
        state = ns_lib.NoteDecodingState()
        ns_lib.decode_note_event(state, 0.0, Event('velocity', 1), codec)
        ns_lib.decode_note_event(state, 0.0, Event('pitch', 60), codec)
        ns_lib.decode_note_event(state, 0.4, Event('pitch', 60), codec)
        result = ns_lib.flush_note_decoding_state(state)
        assert len(result.notes) == 2
        assert result.notes[0].end_time == pytest.approx(0.4)

    def test_drum_fixed_duration(self, codec):
        state = ns_lib.NoteDecodingState()
        ns_lib.decode_note_event(state, 0.0, Event('velocity', 1), codec)
        ns_lib.decode_note_event(state, 0.0, Event('drum', 36), codec)
        result = ns_lib.flush_note_decoding_state(state)
        assert result.notes[0].is_drum
        assert result.notes[0].end_time == pytest.approx(0.01)

    def test_drum_zero_velocity_raises(self, codec):
        state = ns_lib.NoteDecodingState()
        ns_lib.decode_note_event(state, 0.0, Event('velocity', 0), codec)
        with pytest.raises(ValueError):
            ns_lib.decode_note_event(state, 0.0, Event('drum', 36), codec)

    def test_tie_section(self, codec):
        state = ns_lib.NoteDecodingState()
        # segment 1: onset at 0.0, no offset
        ns_lib.decode_note_event(state, 0.0, Event('program', 5), codec)
        ns_lib.decode_note_event(state, 0.0, Event('velocity', 1), codec)
        ns_lib.decode_note_event(state, 0.0, Event('pitch', 60), codec)
        # segment 2 declares the note tied, then ends it at 2.0
        ns_lib.begin_tied_pitches_section(state)
        ns_lib.decode_note_event(state, 1.0, Event('program', 5), codec)
        ns_lib.decode_note_event(state, 1.0, Event('pitch', 60), codec)
        ns_lib.decode_note_event(state, 1.0, Event('tie', 0), codec)
        ns_lib.decode_note_event(state, 2.0, Event('velocity', 0), codec)
        ns_lib.decode_note_event(state, 2.0, Event('pitch', 60), codec)
        result = ns_lib.flush_note_decoding_state(state)
        assert len(result.notes) == 1
        assert result.notes[0].end_time == pytest.approx(2.0)

    def test_untied_notes_end_at_tie(self, codec):
        state = ns_lib.NoteDecodingState()
        ns_lib.decode_note_event(state, 0.0, Event('velocity', 1), codec)
        ns_lib.decode_note_event(state, 0.0, Event('pitch', 60), codec)
        # next segment does not re-declare the note -> it ends at tie time
        ns_lib.begin_tied_pitches_section(state)
        ns_lib.decode_note_event(state, 1.5, Event('tie', 0), codec)
        result = ns_lib.flush_note_decoding_state(state)
        assert len(result.notes) == 1
        assert result.notes[0].end_time == pytest.approx(1.5)

    def test_tie_without_section_raises(self, codec):
        state = ns_lib.NoteDecodingState()
        with pytest.raises(ValueError):
            ns_lib.decode_note_event(state, 0.0, Event('tie', 0), codec)


class TestEndToEndRoundTrip:
    """Encode a NoteSequence to tokens, decode back, compare notes."""

    def test_roundtrip_with_ties(self, codec):
        src = _make_ns([
            (0.00, 0.50, 60, 100, 5, False),
            (0.10, 0.60, 64, 100, 5, False),
            (0.25, 0.75, 40, 100, 33, False),
            (0.30, 0.31, 36, 100, 0, True),
        ])
        ns_lib.assign_instruments(src)
        frame_times = np.arange(100) * 0.008  # 0.8 s of 125 fps frames

        encoded = _encode_song(src, codec, frame_times)
        # a whole-song segment starts with an empty tie section (just 'tie')
        tokens = rle.run_length_encode_shifts(
            np.concatenate([[1131], encoded[0]]), codec)

        pred = [{'est_tokens': tokens, 'start_time': 0.0, 'raw_inputs': []}]
        result = event_predictions_to_ns(
            pred, codec, ns_lib.NoteEncodingWithTiesSpec)
        assert result['est_invalid_events'] == 0
        decoded = result['est_ns']
        assert len(decoded.notes) == 4

        def key(n):
            return (n.is_drum, n.program, n.pitch, round(n.start_time, 2))

        src_keys = sorted(key(n) for n in src.notes)
        dec_keys = sorted(key(n) for n in decoded.notes)
        assert src_keys == dec_keys
        # non-drum offsets survive the round trip at step resolution
        for n in decoded.notes:
            if not n.is_drum:
                matching = [m for m in src.notes
                            if key(m) == key(n)]
                assert matching[0].end_time == pytest.approx(n.end_time,
                                                             abs=0.005)

    def test_two_segment_roundtrip(self, codec):
        """A note spanning a segment boundary survives via the tie section."""
        src = _make_ns([
            (0.00, 1.50, 60, 100, 5, False),
            (1.20, 1.80, 64, 100, 5, False),
        ])
        frame_times = np.arange(250) * 0.008  # 2.0 s
        encoded = _encode_song(src, codec, frame_times)

        # split at frame 125 (t=1.0) the way the dataset slicer does

        preds = [
            {'est_tokens': _segment_tokens(encoded, codec, 0, 125), 'start_time': 0.0,
             'raw_inputs': []},
            {'est_tokens': _segment_tokens(encoded, codec, 125, 250), 'start_time': 1.0,
             'raw_inputs': []},
        ]
        result = event_predictions_to_ns(
            preds, codec, ns_lib.NoteEncodingWithTiesSpec)
        decoded = result['est_ns']
        assert result['est_invalid_events'] == 0
        assert len(decoded.notes) == 2
        long_note = [n for n in decoded.notes if n.pitch == 60][0]
        assert long_note.start_time == pytest.approx(0.0)
        assert long_note.end_time == pytest.approx(1.5, abs=0.005)


class TestRandomSongRoundTrip:
    """Property fuzz over the full tokenize -> segment-slice -> RLE ->
    decode -> combine pipeline: random polyphonic multi-program songs cut
    at random segment boundaries must decode back to the source notes at
    codec resolution (drums onset-only; overlaps trimmed like the
    training pipeline does). This pins the parity-critical core against
    structures the hand-written cases don't enumerate — dense chords,
    notes spanning several segments, many programs, boundary-adjacent
    onsets/offsets."""

    @pytest.mark.parametrize('seed', range(25))
    def test_random_song_roundtrip(self, codec, seed):
        rng = np.random.default_rng(seed)
        n_frames = 1000  # 8.0 s of 125 fps frames
        frame_times = np.arange(n_frames) * 0.008
        seen = set()
        notes = []
        for _ in range(int(rng.integers(1, 50))):
            start = round(float(rng.uniform(0.0, 6.0)), 2)
            pitch = int(rng.integers(21, 109))
            is_drum = bool(rng.random() < 0.15)
            # drums are program-less in the codec (drum events carry only
            # pitch; decode assigns program 0)
            program = 0 if is_drum else int(rng.choice([0, 5, 33, 48, 80]))
            if (pitch, program, is_drum, start) in seen:
                continue  # identical onsets are ill-defined under trim
            seen.add((pitch, program, is_drum, start))
            dur = round(float(rng.uniform(0.02, 1.5)), 2)
            notes.append((start, min(start + dur, 7.9), pitch, 100,
                          program, is_drum))
        # anchor note so the song's last event lies beyond every cut:
        # frames past the LAST event point at a stale state dump (taken
        # before that event — reference-identical indexing,
        # run_length_encoding.py:148-175), so a cut in the event-free
        # tail would re-declare a just-ended note in its tie section;
        # that quirk is pinned separately below
        notes.append((7.3, 7.9, 108, 100, 0, False))
        src = ns_lib.trim_overlapping_notes(_make_ns(notes))
        ns_lib.assign_instruments(src)

        encoded = _encode_song(src, codec, frame_times)


        # cuts align to the common grid of the 8 ms frame and 10 ms codec
        # step (lcm = 40 ms = 5 frames): an onset falling in the sliver
        # between a segment's snapped codec step and its frame boundary
        # is clipped by the combiner's max_decode_time — the reference
        # behaves identically (metrics_utils.py:102-104 clips at the
        # next segment's start), so misaligned cuts can deliberately
        # lose a boundary-sliver note in BOTH implementations; aligned
        # cuts keep the round-trip property exact
        cuts = sorted({0, n_frames} | {
            5 * int(rng.integers(1, 180))  # cuts within the evented span
            for _ in range(int(rng.integers(0, 4)))})
        preds = [
            {'est_tokens': _segment_tokens(encoded, codec, a, b),
             'start_time': float(frame_times[a]), 'raw_inputs': []}
            for a, b in zip(cuts[:-1], cuts[1:])]
        result = event_predictions_to_ns(
            preds, codec, ns_lib.NoteEncodingWithTiesSpec)
        assert result['est_invalid_events'] == 0
        decoded = result['est_ns']

        def base(n):
            return (n.is_drum, n.program, n.pitch)

        assert sorted(map(base, decoded.notes)) == \
            sorted(map(base, src.notes))
        # pair per channel by onset order; times agree within one codec
        # step — a segment boundary falling between the 125 fps frame
        # grid and the 100 step/s codec grid shifts a boundary-adjacent
        # onset by <= 0.01 s (the reference's combiner snaps segment
        # start_time down to the codec grid the same way)
        import collections
        dec_by = collections.defaultdict(list)
        src_by = collections.defaultdict(list)
        for n in decoded.notes:
            dec_by[base(n)].append(n)
        for n in src.notes:
            src_by[base(n)].append(n)
        for k, ss in src_by.items():
            ds = sorted(dec_by[k], key=lambda n: n.start_time)
            ss = sorted(ss, key=lambda n: n.start_time)
            for d, s in zip(ds, ss):
                assert d.start_time == pytest.approx(
                    s.start_time, abs=0.011), k
                if not d.is_drum:
                    assert d.end_time == pytest.approx(
                        s.end_time, abs=0.021), k


    def test_stale_tail_tie_section_quirk(self, codec):
        """Reference-identical quirk, pinned: frames past the song's LAST
        event keep pointing at the state dump taken BEFORE that event
        (the encoder only advances its state index between events —
        run_length_encoding.py:148-175), so a segment starting in the
        event-free tail re-declares the just-ended note in its tie
        section; the tolerant decoder counts one invalid event and drops
        the declaration, and the note itself still decodes correctly
        from its own segment."""
        src = _make_ns([(1.0, 2.0, 60, 100, 5, False)])
        frame_times = np.arange(500) * 0.008  # 4.0 s, events end at 2.0
        encoded = _encode_song(src, codec, frame_times)


        # cut at 3.0 s — well past the last event (the 2.0 s offset)
        preds = [
            {'est_tokens': _segment_tokens(encoded, codec, 0, 375), 'start_time': 0.0,
             'raw_inputs': []},
            {'est_tokens': _segment_tokens(encoded, codec, 375, 500), 'start_time': 3.0,
             'raw_inputs': []},
        ]
        result = event_predictions_to_ns(
            preds, codec, ns_lib.NoteEncodingWithTiesSpec)
        assert result['est_invalid_events'] == 1  # the stale declaration
        decoded = result['est_ns']
        assert len(decoded.notes) == 1
        assert decoded.notes[0].end_time == pytest.approx(2.0, abs=0.005)


class TestDecoderFuzz:
    """The combiner must survive arbitrary token garbage, counting invalid
    events instead of crashing (reference: run_length_encoding.py:216-248)."""

    @pytest.mark.parametrize('seed', range(8))
    def test_random_streams_never_crash(self, codec, seed):
        rng = np.random.default_rng(seed)
        preds = []
        for i in range(3):
            n = int(rng.integers(0, 200))
            tokens = rng.integers(-5, 1600, n)
            preds.append({'est_tokens': tokens, 'start_time': i * 2.048,
                          'raw_inputs': []})
        result = event_predictions_to_ns(
            preds, codec, ns_lib.NoteEncodingWithTiesSpec)
        ns = result['est_ns']
        assert result['est_invalid_events'] >= 0
        for note in ns.notes:
            assert note.start_time <= note.end_time
            assert 0 <= note.pitch <= 127

    def test_all_invalid_stream(self, codec):
        preds = [{'est_tokens': np.full(50, 9999), 'start_time': 0.0,
                  'raw_inputs': []}]
        result = event_predictions_to_ns(
            preds, codec, ns_lib.NoteEncodingWithTiesSpec)
        assert result['est_invalid_events'] == 50
        assert len(result['est_ns'].notes) == 0
