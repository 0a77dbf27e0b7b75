"""Tests for the event codec / vocabulary / RLE layer.

Locks the token table to the reference layout (verified against
reference contrib/vocabularies.py:118-139 and the decoded-id table at
reference dataset/dataset_2_random.py:460-477).
"""

import numpy as np
import pytest

from mr_mt3_tpu.codec import (
    Codec,
    Event,
    EventRange,
    TokenVocabulary,
    VocabularyConfig,
    build_codec,
    num_embeddings,
    vocabulary_from_codec,
)
from mr_mt3_tpu.codec import rle
from mr_mt3_tpu.codec.events import token_from_name, token_name
from mr_mt3_tpu.codec.vocabulary import (
    DECODED_EOS_ID,
    DECODED_INVALID_ID,
    drop_programs,
    programs_to_midi_classes,
)


@pytest.fixture(scope='module')
def codec():
    return build_codec(VocabularyConfig(num_velocity_bins=1))


class TestTokenTable:
    def test_ranges(self, codec):
        assert codec.event_type_range('shift') == (0, 1000)
        assert codec.event_type_range('pitch') == (1001, 1128)
        assert codec.event_type_range('velocity') == (1129, 1130)
        assert codec.event_type_range('tie') == (1131, 1131)
        assert codec.event_type_range('program') == (1132, 1259)
        assert codec.event_type_range('drum') == (1260, 1387)
        assert codec.num_classes == 1388
        assert codec.max_shift_steps == 1000
        assert codec.steps_per_second == 100

    def test_vocab_sizes(self, codec):
        vocab = vocabulary_from_codec(codec)
        assert vocab.vocab_size == 3 + 1388 + 100
        assert num_embeddings(vocab) == 1536

    def test_encode_decode_roundtrip(self, codec):
        for idx in range(codec.num_classes):
            ev = codec.decode_event_index(idx)
            assert codec.encode_event(ev) == idx

    def test_encode_specific(self, codec):
        assert codec.encode_event(Event('shift', 1)) == 1
        assert codec.encode_event(Event('pitch', 60)) == 1061
        assert codec.encode_event(Event('velocity', 0)) == 1129
        assert codec.encode_event(Event('velocity', 1)) == 1130
        assert codec.encode_event(Event('tie', 0)) == 1131
        assert codec.encode_event(Event('program', 32)) == 1164
        assert codec.encode_event(Event('drum', 36)) == 1296

    def test_encode_out_of_range_raises(self, codec):
        with pytest.raises(ValueError):
            codec.encode_event(Event('pitch', 128))
        with pytest.raises(ValueError):
            codec.encode_event(Event('bogus', 0))
        with pytest.raises(ValueError):
            codec.decode_event_index(1388)

    def test_is_shift(self, codec):
        assert codec.is_shift_event_index(0)
        assert codec.is_shift_event_index(1000)
        assert not codec.is_shift_event_index(1001)

    def test_token_names(self, codec):
        assert token_name(1061) == 'pitch_60'
        assert token_name(1131) == 'tie'
        assert token_name(55) == 'shift_55'
        assert token_name(1388) == 'invalid_1388'
        for idx in [0, 55, 999, 1001, 1130, 1131, 1132, 1259, 1260, 1387]:
            assert token_from_name(token_name(idx)) == idx
        # the last shift id (1000) is a VALID codec token but the debug
        # table calls it invalid — bug-compatible with the reference's
        # own off-by-one (run_length_encoding.py:73)
        assert codec.is_shift_event_index(1000)
        assert token_name(1000) == 'invalid_1000'


class TestVocabulary:
    def test_encode_offsets_by_specials(self, codec):
        vocab = vocabulary_from_codec(codec)
        assert vocab.encode([0, 5, 1387]) == [3, 8, 1390]
        with pytest.raises(ValueError):
            vocab.encode([1388])
        with pytest.raises(ValueError):
            vocab.encode([-1])

    def test_decode(self, codec):
        vocab = vocabulary_from_codec(codec)
        # PAD/UNK -> invalid; EOS -> -1; OOV (beyond base vocab) -> invalid
        assert vocab.decode([0, 1, 2, 3, 1390, 1391, 2000]) == [
            DECODED_INVALID_ID, DECODED_EOS_ID, DECODED_INVALID_ID, 0, 1387,
            DECODED_INVALID_ID, DECODED_INVALID_ID]

    def test_decode_array_matches_scalar(self, codec):
        vocab = vocabulary_from_codec(codec)
        ids = np.arange(-2, 1600)
        np.testing.assert_array_equal(
            vocab.decode_array(ids), np.array(vocab.decode(ids)))

    def test_program_granularity_maps(self, codec):
        tokens = np.array([10, 1132 + 3, 1132 + 8, 1061, 1132 + 127])
        dropped = drop_programs(tokens, codec)
        np.testing.assert_array_equal(dropped, [10, 1061])
        mapped = programs_to_midi_classes(tokens, codec)
        np.testing.assert_array_equal(
            mapped, [10, 1132 + 0, 1132 + 8, 1061, 1132 + 120])


class TestEncodeAndIndexEvents:
    def _simple_encode(self, state, value, codec):
        return [Event('pitch', value)]

    def test_shift_structure(self, codec):
        # two events at t=0.02 and t=0.04; frames every 8 ms for 50 ms
        frame_times = np.arange(6) * 0.008
        events, starts, ends, state_events, state_idx = (
            rle.encode_and_index_events(
                state=None,
                event_times=[0.02, 0.04],
                event_values=[60, 62],
                encode_event_fn=self._simple_encode,
                codec=codec,
                frame_times=frame_times))
        # steps: shift,shift,[pitch60],shift,shift,[pitch62], then trailing
        # shifts to cover frame times <= 0.04
        assert list(events[:6]) == [1, 1, 1061, 1, 1, 1063]
        # every frame must have a start/end index; ends[i] == starts[i+1]
        assert len(starts) == len(frame_times)
        np.testing.assert_array_equal(ends[:-1], starts[1:])
        assert ends[-1] == len(events)
        # frame times before the first event step map to event idx 0
        assert starts[0] == 0

    def test_events_sorted_stably(self, codec):
        frame_times = np.arange(4) * 0.008
        events, *_ = rle.encode_and_index_events(
            state=None,
            event_times=[0.01, 0.0, 0.01],
            event_values=[70, 60, 71],
            encode_event_fn=self._simple_encode,
            codec=codec,
            frame_times=frame_times)
        # t=0 event first, then one shift, then the two t=0.01 events in
        # original order (stable sort)
        assert list(events[:4]) == [1061, 1, 1071, 1072]

    def test_state_events_with_ties(self, codec):
        from mr_mt3_tpu.codec import note_sequences as ns_lib
        state = ns_lib.NoteEncodingState()
        frame_times = np.arange(10) * 0.008
        values = [
            ns_lib.NoteEventData(pitch=60, velocity=100, program=5),
            ns_lib.NoteEventData(pitch=60, velocity=0, program=5),
        ]
        events, starts, ends, state_events, state_idx = (
            rle.encode_and_index_events(
                state=state,
                event_times=[0.0, 0.05],
                event_values=values,
                encode_event_fn=ns_lib.note_event_data_to_events,
                codec=codec,
                frame_times=frame_times,
                encoding_state_to_events_fn=(
                    ns_lib.note_encoding_state_to_events)))
        # First event dumps empty state -> just a tie token
        assert state_events[0] == 1131
        # Second dump declares program 5 / pitch 60 active, then tie
        assert list(state_events[1:4]) == [1132 + 5, 1061, 1131]
        assert len(state_idx) == len(frame_times)


class TestRunLengthEncodeShifts:
    def test_absolute_shift_emission(self, codec):
        # unit shifts then a pitch: emits the *absolute* step count
        tokens = np.array([1, 1, 1, 1061, 1, 1, 1062])
        out = rle.run_length_encode_shifts(tokens, codec)
        np.testing.assert_array_equal(out, [3, 1061, 5, 1062])

    def test_trailing_shifts_dropped(self, codec):
        tokens = np.array([1, 1061, 1, 1, 1])
        out = rle.run_length_encode_shifts(tokens, codec)
        np.testing.assert_array_equal(out, [1, 1061])

    def test_redundant_state_changes_dropped(self, codec):
        vel1 = 1130
        tokens = np.array([vel1, 1061, 1, vel1, 1062])
        out = rle.run_length_encode_shifts(tokens, codec)
        np.testing.assert_array_equal(out, [vel1, 1061, 1, 1062])

    def test_redundancy_filter_disabled(self, codec):
        vel1 = 1130
        tokens = np.array([vel1, 1061, 1, vel1, 1062])
        out = rle.run_length_encode_shifts(
            tokens, codec, drop_redundant_state_changes=False)
        np.testing.assert_array_equal(out, [vel1, 1061, 1, vel1, 1062])

    def test_chunking_at_max_shift(self):
        codec = Codec(max_shift_steps=10, steps_per_second=100,
                      event_ranges=[EventRange('pitch', 0, 127)])
        pitch0 = codec.encode_event(Event('pitch', 0))
        tokens = np.array([1] * 25 + [pitch0])
        out = rle.run_length_encode_shifts(
            tokens, codec, state_change_event_types=())
        np.testing.assert_array_equal(out, [10, 10, 5, pitch0])

    def test_remove_redundant_standalone(self, codec):
        vel0, vel1 = 1129, 1130
        tokens = np.array([vel1, 1061, vel1, 1062, vel0, 1061, vel0, 1062])
        out = rle.remove_redundant_state_changes(tokens, codec)
        np.testing.assert_array_equal(
            out, [vel1, 1061, 1062, vel0, 1061, 1062])


class TestRandomizeTokenOrder:
    def test_preserves_multiset_and_structure(self, codec):
        rng = np.random.default_rng(0)
        # prefix [tie], then shift, two 3-token groups, shift, one 2-group
        tokens = np.array([
            1131,
            5, 1132 + 1, 1130, 1061, 1132 + 2, 1130, 1062,
            9, 1129, 1063,
        ])
        out = rle.randomize_token_order(tokens, codec, rng)
        assert sorted(out.tolist()) == sorted(tokens.tolist())
        # prefix, shifts, and the final shift-onward tail are fixed
        assert out[0] == 1131
        assert out[1] == 5
        np.testing.assert_array_equal(out[-3:], [9, 1129, 1063])

    def test_groups_stay_contiguous(self, codec):
        rng = np.random.default_rng(1)
        groups = [[1132 + p, 1130, 1001 + p] for p in range(6)]
        tokens = np.array([3] + [t for g in groups for t in g])
        out = rle.randomize_token_order(tokens, codec, rng).tolist()
        assert out[0] == 3
        body = out[1:]
        seen = []
        for i in range(0, len(body), 3):
            seen.append(body[i:i + 3])
        assert sorted(seen) == sorted(groups)

    def test_no_shifts_identity(self, codec):
        tokens = np.array([1131, 1061])
        out = rle.randomize_token_order(tokens, codec,
                                        np.random.default_rng(2))
        np.testing.assert_array_equal(out, tokens)


class TestDecodeEvents:
    def test_invalid_tokens_counted(self, codec):
        seen = []

        def decode_fn(state, time, event, codec):
            seen.append((time, event))

        invalid, dropped = rle.decode_events(
            state=None, tokens=np.array([9999, 2, 1061]), start_time=0.0,
            max_time=None, codec=codec, decode_event_fn=decode_fn)
        assert invalid == 1
        assert dropped == 0
        assert seen[0][0] == pytest.approx(0.02)
        assert seen[0][1] == Event('pitch', 60)

    def test_max_time_drops_remainder(self, codec):
        seen = []

        def decode_fn(state, time, event, codec):
            seen.append(event)

        # shift 100 steps = 1.0 s beyond max_time 0.5
        invalid, dropped = rle.decode_events(
            state=None, tokens=np.array([1061, 100, 1062, 1063]),
            start_time=0.0, max_time=0.5, codec=codec,
            decode_event_fn=decode_fn)
        assert dropped == 3  # the shift token and everything after
        assert seen == [Event('pitch', 60)]

    def test_absolute_shift_semantics(self, codec):
        times = []

        def decode_fn(state, time, event, codec):
            times.append(time)

        # successive shift tokens accumulate: 10 then 25 -> 0.35 s total
        rle.decode_events(
            state=None, tokens=np.array([10, 1061, 10, 25, 1062]),
            start_time=1.0, max_time=None, codec=codec,
            decode_event_fn=decode_fn)
        assert times == [pytest.approx(1.1), pytest.approx(1.35)]


class TestTolerantDecodeFuzz:
    """Randomized streams through the full tolerant decode pipeline.

    The reference's detokenizer is deliberately tolerant of invalid tokens
    (reference: run_length_encoding.py:216-248,
    note_sequences.py:310-385); a model emitting garbage must degrade to
    counted invalid/dropped events, never crash, and always yield a
    structurally valid NoteSequence. This is the fuzz seam SURVEY §4 calls
    out."""

    def test_random_token_streams_never_crash(self, codec):
        from mr_mt3_tpu.codec import DECODED_EOS_ID, DECODED_INVALID_ID
        from mr_mt3_tpu.codec import note_sequences as nsq
        from mr_mt3_tpu.codec.combine import event_predictions_to_ns

        for seed in range(25):
            rng = np.random.default_rng(seed)
            predictions = []
            for seg in range(3):
                n = int(rng.integers(0, 60))
                # mix: valid codec range, decoder sentinels, and way
                # out-of-range ids
                tokens = rng.integers(-2, codec.num_classes + 50, size=n)
                tokens = np.where(rng.random(n) < 0.1,
                                  DECODED_INVALID_ID, tokens)
                predictions.append({
                    'est_tokens': tokens,
                    'start_time': seg * 2.048,
                    'raw_inputs': [],
                })
            result = event_predictions_to_ns(
                predictions, codec=codec,
                encoding_spec=nsq.NoteEncodingWithTiesSpec)
            ns = result['est_ns']
            for note in ns.notes:
                assert note.end_time >= note.start_time >= 0.0
                assert 0 <= note.pitch <= 127
                assert 0 <= note.velocity <= 127
            assert result['est_invalid_events'] >= 0
            assert result['est_dropped_events'] >= 0

    def test_pure_garbage_yields_empty_or_valid(self, codec):
        from mr_mt3_tpu.codec import note_sequences as nsq
        from mr_mt3_tpu.codec.combine import event_predictions_to_ns
        rng = np.random.default_rng(99)
        predictions = [{
            'est_tokens': rng.integers(codec.num_classes,
                                       codec.num_classes + 200, size=40),
            'start_time': 0.0,
            'raw_inputs': [],
        }]
        result = event_predictions_to_ns(
            predictions, codec=codec,
            encoding_spec=nsq.NoteEncodingWithTiesSpec)
        assert len(result['est_ns'].notes) == 0
        assert result['est_invalid_events'] == 40
