"""Parity tests: native C++ tokenizer core vs the Python reference path."""

import numpy as np
import pytest

from mr_mt3_tpu.codec import VocabularyConfig, build_codec
from mr_mt3_tpu.codec import note_sequences as nsq
from mr_mt3_tpu.codec import rle
from mr_mt3_tpu.data.transforms import encode_note_events

try:
    from mr_mt3_tpu.native.tokenizer import native_available
    HAVE_NATIVE = native_available()
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason='native tokenizer not built')


def _python_encode(times, values, codec, frame_times, include_ties=True):
    return rle.encode_and_index_events(
        state=nsq.NoteEncodingState() if include_ties else None,
        event_times=times,
        event_values=values,
        encode_event_fn=nsq.note_event_data_to_events,
        codec=codec,
        frame_times=frame_times,
        encoding_state_to_events_fn=(
            nsq.note_encoding_state_to_events if include_ties else None))


def _random_song(rng, n_notes, duration):
    ns = nsq.NoteSequence()
    for _ in range(n_notes):
        start = float(rng.uniform(0, duration - 0.2))
        ns.add_note(start_time=start,
                    end_time=start + float(rng.uniform(0.05, 2.0)),
                    pitch=int(rng.integers(21, 108)),
                    velocity=int(rng.integers(1, 128)),
                    program=int(rng.choice([0, 8, 24, 32, 40, 56])),
                    is_drum=bool(rng.random() < 0.25))
    ns.total_time = duration
    return ns


@pytest.fixture(scope='module')
def codec():
    return build_codec(VocabularyConfig(num_velocity_bins=1))


class TestNativeParity:
    @pytest.mark.parametrize('seed', [0, 1, 2])
    def test_matches_python_exactly(self, codec, seed):
        rng = np.random.default_rng(seed)
        ns = _random_song(rng, n_notes=120, duration=20.0)
        nsq.assign_instruments(ns)
        ns = nsq.trim_overlapping_notes(ns)
        times, values = (
            nsq.note_sequence_to_onsets_and_offsets_and_programs(ns))
        frame_times = np.arange(int(20.0 * 125)) * 0.008

        py = _python_encode(times, values, codec, frame_times)
        nat = encode_note_events(times, values, codec, frame_times,
                                 use_native=True)
        for name, a, b in zip(
                ['events', 'starts', 'ends', 'state_events', 'state_idx'],
                py, nat):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)

    def test_empty_song(self, codec):
        frame_times = np.arange(10) * 0.008
        py = _python_encode([], [], codec, frame_times)
        nat = encode_note_events([], [], codec, frame_times)
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_onsets_only(self, codec):
        rng = np.random.default_rng(3)
        ns = _random_song(rng, n_notes=30, duration=5.0)
        times, values = nsq.note_sequence_to_onsets(ns)
        frame_times = np.arange(int(5.0 * 125)) * 0.008
        py = rle.encode_and_index_events(
            state=None, event_times=times, event_values=values,
            encode_event_fn=nsq.note_event_data_to_events, codec=codec,
            frame_times=frame_times, encoding_state_to_events_fn=None)
        nat = encode_note_events(times, values, codec, frame_times,
                                 include_ties=False)
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_multi_velocity_bins(self):
        codec = build_codec(VocabularyConfig(num_velocity_bins=127))
        rng = np.random.default_rng(4)
        ns = _random_song(rng, n_notes=50, duration=8.0)
        times, values = (
            nsq.note_sequence_to_onsets_and_offsets_and_programs(ns))
        frame_times = np.arange(int(8.0 * 125)) * 0.008
        py = _python_encode(times, values, codec, frame_times)
        nat = encode_note_events(times, values, codec, frame_times)
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_speedup(self, codec):
        import time
        rng = np.random.default_rng(5)
        ns = _random_song(rng, n_notes=1500, duration=200.0)
        nsq.assign_instruments(ns)
        times, values = (
            nsq.note_sequence_to_onsets_and_offsets_and_programs(ns))
        frame_times = np.arange(int(200.0 * 125)) * 0.008
        t0 = time.time()
        _python_encode(times, values, codec, frame_times)
        t_py = time.time() - t0
        t0 = time.time()
        encode_note_events(times, values, codec, frame_times)
        t_nat = time.time() - t0
        assert t_nat < t_py  # typically 30-100x
