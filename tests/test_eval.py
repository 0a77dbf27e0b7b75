"""Tests for the transcription metric engine and the program-aware evaluator."""

import numpy as np
import pytest

from mr_mt3_tpu.codec.note_sequences import NoteSequence
from mr_mt3_tpu.eval import (
    evaluate_main,
    get_granular_program,
    match_notes,
    midi_to_hz,
    precision_recall_f1_overlap,
    program_aware_note_scores,
)
from mr_mt3_tpu.midi import note_sequence_to_midi_file


def _iv(*pairs):
    return np.array(pairs, dtype=float).reshape(-1, 2)


class TestMatchNotes:
    def test_perfect_match(self):
        iv = _iv((0, 1), (1, 2), (2, 3))
        p = midi_to_hz([60, 64, 67])
        m = match_notes(iv, p, iv, p, offset_ratio=None)
        assert sorted(m) == [(0, 0), (1, 1), (2, 2)]

    def test_onset_tolerance_edge(self):
        ref = _iv((0.0, 1.0))
        est_in = _iv((0.05, 1.0))    # exactly at tolerance: matches
        est_out = _iv((0.0501, 1.0))
        p = midi_to_hz([60])
        assert match_notes(ref, p, est_in, p, offset_ratio=None)
        assert not match_notes(ref, p, est_out, p, offset_ratio=None)

    def test_pitch_tolerance_cents(self):
        iv = _iv((0, 1))
        ref_hz = midi_to_hz([60])
        close = ref_hz * 2 ** (49 / 1200)   # 49 cents: match
        far = ref_hz * 2 ** (51 / 1200)     # 51 cents: no match
        assert match_notes(iv, ref_hz, iv, close, offset_ratio=None)
        assert not match_notes(iv, ref_hz, iv, far, offset_ratio=None)

    def test_midi_number_pitch_quirk(self):
        """The reference's flat scores pass raw MIDI numbers; adjacent
        semitones at pitch 60/61 are within 50 'cents' of the number ratio
        and therefore match — replicate exactly."""
        iv = _iv((0, 1))
        assert match_notes(iv, np.array([60]), iv, np.array([61]),
                           offset_ratio=None)
        # in Hz space they do not match
        assert not match_notes(iv, midi_to_hz([60]), iv, midi_to_hz([61]),
                               offset_ratio=None)

    def test_offset_condition(self):
        ref = _iv((0.0, 1.0))
        p = midi_to_hz([60])
        est_good = _iv((0.0, 1.15))   # within 0.2 * 1.0s
        est_bad = _iv((0.0, 1.30))
        assert match_notes(ref, p, est_good, p, offset_ratio=0.2)
        assert not match_notes(ref, p, est_bad, p, offset_ratio=0.2)
        # offset ignored entirely when offset_ratio is None
        assert match_notes(ref, p, est_bad, p, offset_ratio=None)

    def test_maximum_matching_cardinality(self):
        """Greedy would pair ref0-est0 and strand ref1; maximum matching
        must pair ref0-est1 and ref1-est0 if that covers both."""
        ref = _iv((0.00, 1.0), (0.04, 1.0))
        est = _iv((0.04, 1.0), (0.00, 1.0))
        p = midi_to_hz([60, 60])
        # ref0 matches both ests; ref1 matches est0 only (|0.04-0.0|<=0.05
        # and |0.04-0.04|<=0.05 -> actually both match both). Force
        # asymmetry:
        ref = _iv((0.00, 1.0), (0.09, 1.0))
        est = _iv((0.05, 1.0), (0.00, 1.0))
        # ref0-est0 (0.05 ok), ref0-est1 (0.0 ok), ref1-est0 (0.04 ok),
        # ref1-est1 (0.09 no)
        m = match_notes(ref, p, est, p, offset_ratio=None)
        assert len(m) == 2
        assert sorted(m) == [(0, 1), (1, 0)]

    def test_empty_inputs(self):
        p, r, f, o = precision_recall_f1_overlap(
            _iv(), np.array([]), _iv((0, 1)), midi_to_hz([60]))
        assert (p, r, f, o) == (0, 0, 0, 0)


class TestPRF:
    def test_partial_scores(self):
        ref = _iv((0, 1), (1, 2), (2, 3), (3, 4))
        est = _iv((0, 1), (1, 2))
        p = midi_to_hz([60, 62, 64, 65])
        precision, recall, f1, _ = precision_recall_f1_overlap(
            ref, p, est, p[:2], offset_ratio=None)
        assert precision == 1.0
        assert recall == 0.5
        assert f1 == pytest.approx(2 / 3)

    def test_overlap_ratio(self):
        ref = _iv((0.0, 1.0))
        est = _iv((0.0, 0.5))
        p = midi_to_hz([60])
        _, _, _, overlap = precision_recall_f1_overlap(ref, p, est, p,
                                                       offset_ratio=None)
        assert overlap == pytest.approx(0.5)


class TestGranularity:
    def test_mapping(self):
        assert get_granular_program(26, False, 'full') == 26
        assert get_granular_program(26, False, 'midi_class') == 24
        assert get_granular_program(26, False, 'flat') == 0
        assert get_granular_program(0, True, 'flat') == 1


def _write_song(path, note_specs):
    ns = NoteSequence()
    for (start, end, pitch, program, is_drum, inst) in note_specs:
        ns.add_note(start_time=start, end_time=end, pitch=pitch, velocity=100,
                    program=program, is_drum=is_drum, instrument=inst)
        ns.total_time = max(ns.total_time, end)
    note_sequence_to_midi_file(ns, path)


class TestProgramAwareScores:
    def test_identical_files_perfect(self, tmp_path):
        notes = [
            (0.0, 0.5, 60, 0, False, 0),
            (0.5, 1.0, 64, 0, False, 0),
            (0.0, 0.6, 40, 33, False, 1),
            (0.2, 0.21, 36, 0, True, 9),
        ]
        ref = tmp_path / 'ref.mid'
        est = tmp_path / 'est.mid'
        _write_song(ref, notes)
        _write_song(est, notes)
        for granularity in ['flat', 'midi_class', 'full']:
            res = program_aware_note_scores(ref, est, granularity)
            assert res['Onset F1'] == 1.0
            assert res[f'Onset + program F1 ({granularity})'] == 1.0

    def test_wrong_program_hurts_program_scores_only(self, tmp_path):
        ref = tmp_path / 'ref.mid'
        est = tmp_path / 'est.mid'
        _write_song(ref, [(0.0, 0.5, 60, 0, False, 0)])
        # same notes, program 26 (Clean Electric Guitar) instead of 0
        _write_song(est, [(0.0, 0.5, 60, 26, False, 0)])
        res = program_aware_note_scores(ref, est, 'midi_class')
        assert res['Onset F1'] == 1.0            # instrument-agnostic
        assert res['Onset + program F1 (midi_class)'] == 0.0
        # flat granularity collapses programs -> perfect again
        res_flat = program_aware_note_scores(ref, est, 'flat')
        assert res_flat['Onset + program F1 (flat)'] == 1.0

    def test_drums_separated_from_pitched(self, tmp_path):
        ref = tmp_path / 'ref.mid'
        est = tmp_path / 'est.mid'
        _write_song(ref, [(0.0, 0.01, 36, 0, True, 9)])
        # same pitch/onset but non-drum
        _write_song(est, [(0.0, 0.01, 36, 0, False, 0)])
        res = program_aware_note_scores(ref, est, 'flat')
        assert res['Onset + program F1 (flat)'] == 0.0

    def test_evaluate_main_slakh_layout(self, tmp_path):
        gt = tmp_path / 'gt'
        out = tmp_path / 'out'
        for song in ['Track00001', 'Track00002']:
            (gt / song).mkdir(parents=True)
            (out / song).mkdir(parents=True)
            notes = [(0.0, 0.5, 60, 0, False, 0), (0.3, 0.8, 43, 33, False, 1)]
            _write_song(gt / song / 'all_src_v2.mid', notes)
            _write_song(out / song / 'mix.mid', notes)
        scores = evaluate_main('Slakh', str(out), str(gt))
        assert scores['Onset F1'] == 1.0
        assert scores['Onset + program F1 (midi_class)'] == 1.0
        assert scores['Onset + program F1 (full)'] == 1.0

    def test_evaluate_main_first_n(self, tmp_path):
        gt = tmp_path / 'gt'
        out = tmp_path / 'out'
        specs = {'TrackA': 1.0, 'TrackB': 0.0}
        for song, match in specs.items():
            (gt / song).mkdir(parents=True)
            (out / song).mkdir(parents=True)
            _write_song(gt / song / 'all_src_v2.mid',
                        [(0.0, 0.5, 60, 0, False, 0)])
            pitch = 60 if match else 72
            _write_song(out / song / 'mix.mid',
                        [(0.0, 0.5, pitch, 0, False, 0)])
        full = evaluate_main('Slakh', str(out), str(gt))
        assert full['Onset F1'] == pytest.approx(0.5)
        only_first = evaluate_main('Slakh', str(out), str(gt), first_n=1)
        assert only_first['Onset F1'] == 1.0


class TestBandedMatchingEquivalence:
    """match_notes builds its candidate set from an onset-sorted band
    (sparse) instead of dense (n_ref x n_est) matrices; the maximum
    maximum matching (the exact pairs; average_overlap_ratio consumes
    them) must equal the dense brute-force formulation on randomized
    instances."""

    @staticmethod
    def _brute_pairs(ref_i, ref_p, est_i, est_p, offset_ratio, strict):
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import maximum_bipartite_matching
        cmp = np.less if strict else np.less_equal
        hit = cmp(np.abs(ref_i[:, 0:1] - est_i[None, :, 0]), 0.05)
        with np.errstate(divide='ignore', invalid='ignore'):
            pd = np.abs(1200.0 * np.log2(
                ref_p[:, None].astype(float) / est_p[None, :]))
        hit &= cmp(pd, 50.0)
        if offset_ratio is not None:
            tol = np.maximum(offset_ratio * (ref_i[:, 1] - ref_i[:, 0]),
                             0.05)
            hit &= cmp(np.abs(ref_i[:, 1:2] - est_i[None, :, 1]),
                       tol[:, None])
        if not hit.any():
            return []
        m = maximum_bipartite_matching(csr_matrix(hit), perm_type='column')
        return [(r, int(e)) for r, e in enumerate(m) if e >= 0]

    def test_matches_dense_brute_force(self):
        from mr_mt3_tpu.eval.transcription import match_notes
        for seed in range(30):
            rng = np.random.default_rng(seed)
            nr, ne = rng.integers(0, 60, 2)
            ref_i = np.sort(rng.uniform(0, 10, (nr, 2)), axis=1)
            est_i = np.sort(rng.uniform(0, 10, (ne, 2)), axis=1)
            ref_p = rng.integers(50, 70, nr)
            est_p = rng.integers(50, 70, ne)
            for oratio in (None, 0.2):
                for strict in (False, True):
                    got = match_notes(ref_i, ref_p, est_i, est_p,
                                      offset_ratio=oratio, strict=strict)
                    want = (self._brute_pairs(ref_i, ref_p, est_i, est_p,
                                              oratio, strict)
                            if nr and ne else [])
                    # identical PAIRS, not just cardinality —
                    # average_overlap_ratio consumes the pairs
                    assert got == want, (seed, oratio, strict)


class TestAuxEvalHelpers:
    def _write(self, path, notes, program=0, is_drum=False):
        from mr_mt3_tpu.codec import note_sequences as nsq
        from mr_mt3_tpu.midi import note_sequence_to_midi_file
        ns = nsq.NoteSequence()
        for start, end, pitch in notes:
            ns.add_note(start_time=start, end_time=end, pitch=pitch,
                        velocity=100, program=program, is_drum=is_drum,
                        instrument=9 if is_drum else 0)
            ns.total_time = max(ns.total_time, end)
        note_sequence_to_midi_file(ns, path)

    def test_compute_transcription_metrics(self, tmp_path):
        """Onset-only vs onset+offset P/R/F1 helper
        (reference: evaluate.py:25-53)."""
        from mr_mt3_tpu.eval.evaluate import compute_transcription_metrics
        notes = [(0.5 * i, 0.5 * i + 0.3, 60 + i) for i in range(6)]
        ref = tmp_path / 'ref.mid'
        est = tmp_path / 'est.mid'
        self._write(ref, notes)
        # perturb offsets beyond tolerance but keep onsets matched
        self._write(est, [(s, e + 0.2, p) for s, e, p in notes])
        m = compute_transcription_metrics(str(ref), str(est))
        assert m['on_f1'] == 1.0
        assert m['onoff_f1'] < 1.0
        assert m['len_ref_intervals'] == 6
        assert m['len_est_intervals'] == 6

    def test_loop_transcription_eval_track_matching(self, tmp_path):
        """Track-separability metric: each ref instrument matched to its
        best est instrument (reference: evaluate.py:240-271)."""
        from mr_mt3_tpu.eval.evaluate import loop_transcription_eval
        from mr_mt3_tpu.midi import read_midi
        from mr_mt3_tpu.codec import note_sequences as nsq
        from mr_mt3_tpu.midi import note_sequence_to_midi_file

        ns = nsq.NoteSequence()
        for i in range(5):
            ns.add_note(start_time=0.5 * i, end_time=0.5 * i + 0.3,
                        pitch=60 + i, velocity=100, program=0,
                        is_drum=False, instrument=0)
        for i in range(5):
            ns.add_note(start_time=0.25 + 0.5 * i, end_time=0.6 + 0.5 * i,
                        pitch=40 + i, velocity=100, program=33,
                        is_drum=False, instrument=1)
        ns.total_time = 3.0
        ref = tmp_path / 'ref.mid'
        note_sequence_to_midi_file(ns, ref)
        f1, n_ref, n_est = loop_transcription_eval(read_midi(ref),
                                                   read_midi(ref))
        assert f1 == 1.0  # self-match: every track finds itself
        assert n_ref == n_est == 2

    def test_loop_transcription_eval_empty_est(self, tmp_path):
        """An empty transcription (untrained model, silent clip) scores 0
        instead of crashing np.max over a zero-size axis."""
        from mr_mt3_tpu.eval.evaluate import loop_transcription_eval
        from mr_mt3_tpu.midi import read_midi
        from mr_mt3_tpu.codec import note_sequences as nsq
        from mr_mt3_tpu.midi import note_sequence_to_midi_file

        ns = nsq.NoteSequence()
        ns.add_note(start_time=0.0, end_time=0.4, pitch=60, velocity=100,
                    program=0, is_drum=False, instrument=0)
        ns.total_time = 0.4
        ref = tmp_path / 'ref.mid'
        est = tmp_path / 'est.mid'
        note_sequence_to_midi_file(ns, ref)
        note_sequence_to_midi_file(nsq.NoteSequence(), est)
        f1, n_ref, n_est = loop_transcription_eval(read_midi(ref),
                                                   read_midi(est))
        assert f1 == 0.0
        assert (n_ref, n_est) == (1, 0)
