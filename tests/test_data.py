"""Dataset pipeline tests on a fabricated Slakh-format corpus."""

import json
import os

import numpy as np
import pytest

from mr_mt3_tpu.audio import write_wav
from mr_mt3_tpu.codec import DECODED_EOS_ID
from mr_mt3_tpu.codec import note_sequences as nsq
from mr_mt3_tpu.codec.combine import event_predictions_to_ns
from mr_mt3_tpu.data import (
    ComMUDataset,
    DataLoader,
    SlakhDataset,
    SlakhDatasetWithPrevSegmem,
    SlakhDatasetWithPrevSegmemAugment,
    collate_batch,
)
from mr_mt3_tpu.midi import note_sequence_to_midi_file


def _write_track(path, notes, program=0, is_drum=False):
    ns = nsq.NoteSequence()
    for start, end, pitch in notes:
        ns.add_note(start_time=start, end_time=end, pitch=pitch, velocity=100,
                    program=program, is_drum=is_drum,
                    instrument=9 if is_drum else 0)
        ns.total_time = max(ns.total_time, end)
    note_sequence_to_midi_file(ns, path)


@pytest.fixture(scope='module')
def slakh_root(tmp_path_factory):
    """Two-song Slakh-format corpus, ~20 s each at 16 kHz."""
    root = tmp_path_factory.mktemp('slakh')
    rng = np.random.default_rng(0)
    for si, song in enumerate(['Track00001', 'Track00002']):
        d = root / song
        (d / 'MIDI').mkdir(parents=True)
        dur = 20.0
        audio = (rng.normal(size=int(16000 * dur)) * 0.05).astype(np.float32)
        write_wav(d / 'mix_16k.wav', audio, 16000)
        piano = [(0.5 + i, 0.5 + i + 0.4, 60 + (i % 12)) for i in range(18)]
        _write_track(d / 'MIDI' / 'S00.mid', piano, program=0)
        bass = [(0.25 + 2 * i, 0.25 + 2 * i + 1.0, 40 + (i % 5))
                for i in range(9)]
        _write_track(d / 'MIDI' / 'S01.mid', bass, program=33)
        drums = [(0.5 * i, 0.5 * i + 0.05, 36) for i in range(36)]
        _write_track(d / 'MIDI' / 'S02.mid', drums, is_drum=True)
        with open(d / 'inst_names.json', 'w') as f:
            json.dump({'S00': 'Acoustic Piano', 'S01': 'Electric Bass',
                       'S02': 'Drums'}, f)
    return str(root)


class TestSlakhDataset:
    def test_item_shapes(self, slakh_root):
        ds = SlakhDataset(slakh_root, shuffle=False, num_rows_per_batch=4,
                          split_frame_length=256)
        assert len(ds) == 2
        item = ds[0]
        assert item['audio'].shape == (4, 256 * 128)
        assert item['targets'].shape == (4, 1024)
        assert item['valid_frames'].shape == (4,)
        assert item['targets'].dtype == np.int64
        # model-space targets: values are -100 pads or >= 1
        t = item['targets']
        assert ((t == -100) | (t >= 1)).all()
        # every row ends with EOS before the -100 padding
        for row in t:
            pads = np.where(row == -100)[0]
            if len(pads):
                assert row[pads[0] - 1] == 1

    def test_deterministic_mode_reproducible(self, slakh_root):
        ds1 = SlakhDataset(slakh_root, shuffle=False, is_deterministic=True,
                           is_randomize_tokens=False, num_rows_per_batch=2,
                           split_frame_length=256)
        ds2 = SlakhDataset(slakh_root, shuffle=False, is_deterministic=True,
                           is_randomize_tokens=False, num_rows_per_batch=2,
                           split_frame_length=256)
        a, b = ds1[0], ds2[0]
        np.testing.assert_array_equal(a['targets'], b['targets'])
        np.testing.assert_array_equal(a['audio'], b['audio'])

    def test_targets_decode_back_to_notes(self, slakh_root):
        """Segment targets, decoded as predictions, must reproduce the
        source notes in the segment's time range."""
        ds = SlakhDataset(slakh_root, shuffle=False, is_deterministic=True,
                          is_randomize_tokens=False, num_rows_per_batch=8,
                          split_frame_length=256)
        song = ds._load_song(0)
        item = ds[0]
        predictions = []
        for i, row in enumerate(item['targets']):
            # decode model-space -> codec space like the inference handler
            after_eos = np.cumsum(row == 1)
            toks = np.where(after_eos > 0, DECODED_EOS_ID, row - 3)
            toks = toks[:np.argmax(toks == DECODED_EOS_ID)]
            # deterministic mode: segment i starts at window i (256 frames)
            predictions.append({
                'est_tokens': toks,
                'start_time': i * 256 / 125.0,
                'raw_inputs': [],
            })
        result = event_predictions_to_ns(
            predictions, ds.codec, nsq.NoteEncodingWithTiesSpec)
        assert result['est_invalid_events'] == 0
        decoded = result['est_ns']
        # count onsets within the decoded time span vs the ground truth
        span_end = 8 * 256 / 125.0
        expect = [n for n in song_notes(slakh_root, 0)
                  if n[0] < span_end - 0.05]
        got = [n for n in decoded.notes]
        assert abs(len(got) - len(expect)) <= 2  # boundary-note slack

    def test_randomize_tokens_changes_order_not_content(self, slakh_root):
        ds_plain = SlakhDataset(slakh_root, shuffle=False,
                                is_deterministic=True,
                                is_randomize_tokens=False,
                                num_rows_per_batch=2,
                                split_frame_length=256)
        ds_rand = SlakhDataset(slakh_root, shuffle=False,
                               is_deterministic=False,
                               is_randomize_tokens=True,
                               num_rows_per_batch=2,
                               split_frame_length=256, seed=5)
        # compare multisets of non-pad tokens for the same first segment:
        # use deterministic sampling for both by pinning the rng choices
        # (rand ds samples random chunks, so just check it produces valid
        # targets)
        item = ds_rand[0]
        t = item['targets']
        assert ((t == -100) | (t >= 1)).all()


def song_notes(root, idx):
    """Ground-truth (start, end, pitch) tuples for fixture song idx."""
    notes = []
    for i in range(18):
        notes.append((0.5 + i, 0.5 + i + 0.4, 60 + (i % 12)))
    for i in range(9):
        notes.append((0.25 + 2 * i, 0.25 + 2 * i + 1.0, 40 + (i % 5)))
    for i in range(36):
        notes.append((0.5 * i, 0.5 * i + 0.05, 36))
    return notes


class TestPrevSegmem:
    def test_prev_targets_present(self, slakh_root):
        ds = SlakhDatasetWithPrevSegmem(
            slakh_root, shuffle=False, num_rows_per_batch=3,
            split_frame_length=2000, seed=1)
        item = ds[0]
        assert item['targets_prev'].shape == item['targets'].shape
        t = item['targets_prev']
        assert ((t == -100) | (t >= 1)).all()

    def test_empty_prev_is_tie_eos(self, slakh_root):
        """When the chunk starts < mel_length into the window, prev memory
        is the [tie, shift] placeholder (+3 offset, then EOS pad)."""
        ds = SlakhDatasetWithPrevSegmem(
            slakh_root, shuffle=False, num_rows_per_batch=2,
            split_frame_length=256,  # windows == mel_length: no slack
            is_randomize_tokens=False, seed=1)
        item = ds[0]
        for row in item['targets_prev']:
            np.testing.assert_array_equal(row[:3], [1134, 4, 1])

    def test_augment_variant(self, slakh_root):
        ds = SlakhDatasetWithPrevSegmemAugment(
            slakh_root, shuffle=False, num_rows_per_batch=2,
            split_frame_length=2000, prev_augment_frames=3, seed=2)
        item = ds[0]
        assert 'targets_prev' in item


class TestLoader:
    def test_collate_concatenates_rows(self, slakh_root):
        ds = SlakhDataset(slakh_root, shuffle=False, num_rows_per_batch=3,
                          split_frame_length=256)
        batch = collate_batch([ds[0], ds[1]])
        assert batch['audio'].shape[0] == 6
        assert batch['targets'].shape == (6, 1024)

    def test_loader_iterates_all(self, slakh_root):
        ds = SlakhDataset(slakh_root, shuffle=False, num_rows_per_batch=2,
                          split_frame_length=256)
        loader = DataLoader(ds, batch_size=1, shuffle=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        for b in batches:
            assert b['targets'].shape == (2, 1024)

    def test_loader_len(self, slakh_root):
        ds = SlakhDataset(slakh_root, shuffle=False, num_rows_per_batch=2,
                          split_frame_length=256)
        assert len(DataLoader(ds, batch_size=2)) == 1
        assert len(DataLoader(ds, batch_size=1)) == 2

    def test_sharded_ranks_get_equal_batch_counts(self):
        """SPMD invariant: with shard_count ranks, every rank must run
        the same number of identically-shaped steps — a rank with an
        extra or smaller batch deadlocks the gradient all-reduce. 5
        global batches over 2 ranks -> 2 each (remainder dropped), and
        the global partial batch is dropped even with drop_last=False."""

        class Counting:
            def __init__(self, n):
                self.n = n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return {'x': np.full((1, 2), i, np.int64)}

        # 11 items, batch 2 -> 5 full global batches + 1 partial
        per_rank = []
        seen = []
        for rank in (0, 1):
            loader = DataLoader(Counting(11), batch_size=2, shuffle=False,
                                num_workers=1, shard_rank=rank,
                                shard_count=2)
            batches = list(loader)
            assert len(loader) == len(batches)
            per_rank.append(len(batches))
            for b in batches:
                assert b['x'].shape == (2, 2)  # all full-size
                seen.extend(b['x'][:, 0].tolist())
        assert per_rank == [2, 2]
        assert len(seen) == len(set(seen))  # disjoint coverage

    def test_sharded_uneven_item_rows_fail_fast(self):
        """A short song yields fewer ROWS than its peers (reference
        parity); under multihost sharding that would diverge the global
        array shapes and hang the other ranks in a collective — the
        loader must raise with an actionable message instead."""

        class UnevenRows:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                rows = 1 if i == 2 else 3  # item 2 is the 'short song'
                return {'x': np.zeros((rows, 2), np.int64)}

        loader = DataLoader(UnevenRows(), batch_size=1, shuffle=False,
                            num_workers=1, shard_rank=0, shard_count=2)
        with pytest.raises(RuntimeError, match='multihost sharding'):
            list(loader)
        # single-host: variable rows are allowed (they only recompile)
        loader1 = DataLoader(UnevenRows(), batch_size=1, shuffle=False,
                             num_workers=1)
        assert [b['x'].shape[0] for b in loader1] == [3, 3, 1, 3]

    def test_abandoned_iterator_stops_producer(self):
        """Breaking out of iteration mid-epoch must not leave the producer
        thread blocked forever on a full prefetch queue."""
        import threading
        import time

        class Counting:
            def __init__(self, n):
                self.n = n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return {'x': np.full((1, 2), i, np.int64)}

        before = threading.active_count()
        loader = DataLoader(Counting(64), batch_size=1, shuffle=False,
                            num_workers=1, prefetch=1)
        it = iter(loader)
        next(it)
        it.close()  # abandon mid-epoch; generator finally sets stop
        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before


@pytest.fixture(scope='module')
def commu_root(tmp_path_factory):
    """ComMU-format corpus: commu_audio_v2/<split>/*.wav paired with
    commu_midi_v2/<split>/*.mid via path replacement."""
    root = tmp_path_factory.mktemp('commu')
    audio_dir = root / 'commu_audio_v2' / 'train'
    midi_dir = root / 'commu_midi_v2' / 'train'
    audio_dir.mkdir(parents=True)
    midi_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    for name in ['commu00001', 'commu00002']:
        audio = (rng.normal(size=16000 * 8) * 0.05).astype(np.float32)
        write_wav(audio_dir / f'{name}_16k.wav', audio, 16000)
        notes = [(0.5 * i, 0.5 * i + 0.3, 50 + i) for i in range(12)]
        _write_track(midi_dir / f'{name}.mid', notes, program=33)
    return str(audio_dir)


class TestComMUDataset:
    def test_item_shapes_and_program(self, commu_root):
        ds = ComMUDataset(commu_root, shuffle=False, num_rows_per_batch=3)
        assert len(ds) == 2
        item = ds[0]
        assert item['audio'].shape == (3, 256 * 128)
        assert item['targets'].shape == (3, 1024)
        # program token for program 33 (+1132 codec, +3 specials) appears
        assert (item['targets'] == 33 + 1132 + 3).any()

    def test_contiguous_windows(self, commu_root):
        """ComMU splits into contiguous mel_length windows (split length =
        mel_length), unlike Slakh's 2000-frame windows."""
        ds = ComMUDataset(commu_root, shuffle=False, num_rows_per_batch=8)
        assert ds.split_frame_length == ds.mel_length

    def test_base_class_kwargs_forwarded(self, commu_root):
        """Options like is_deterministic must reach the base class, not
        vanish into **kwargs — a 'deterministic' pipeline silently
        sampling random windows would be a debugging trap."""
        ds = ComMUDataset(commu_root, shuffle=False, num_rows_per_batch=2,
                          is_deterministic=True)
        assert ds.is_deterministic
        a = ds[0]['targets']
        b = ds[0]['targets']
        np.testing.assert_array_equal(a, b)
        # the ComMU-pinned values stay pinned
        with pytest.raises(TypeError):
            ComMUDataset(commu_root, is_randomize_tokens=False)


class TestDiskTokenCache:
    """Persistent tokenization cache (data/disk_cache.py): a process
    restart must reuse the tokenized arrays instead of re-running the
    MIDI parse + RLE hot loop (the reference re-parses every epoch —
    dataset_2_random.py:109-172; we beat it durably)."""

    def _ds(self, slakh_root, cache_dir, **kw):
        return SlakhDataset(slakh_root, shuffle=False, is_deterministic=True,
                            num_rows_per_batch=2, cache_dir=str(cache_dir),
                            **kw)

    def test_warm_restart_identical_and_no_retokenize(
            self, slakh_root, tmp_path, monkeypatch):
        cache = tmp_path / 'tok_cache'
        cold = self._ds(slakh_root, cache)
        items_cold = [cold[i] for i in range(len(cold))]
        assert any(f.suffix == '.npz' for f in cache.iterdir())

        # "restart": new instance, tokenize_song forbidden — every song
        # must come from disk
        from mr_mt3_tpu.data import transforms as tf_mod

        def boom(*a, **k):
            raise AssertionError('tokenize_song called on warm restart')

        monkeypatch.setattr(tf_mod, 'tokenize_song', boom)
        warm = self._ds(slakh_root, cache)
        for i, cold_item in enumerate(items_cold):
            warm_item = warm[i]
            for k in cold_item:
                np.testing.assert_array_equal(warm_item[k], cold_item[k])

    def test_key_invalidation_on_midi_and_config(self, slakh_root, tmp_path):
        cache = tmp_path / 'tok_cache'
        ds = self._ds(slakh_root, cache)
        k0 = ds._song_key(ds.df[0])
        # different config -> different key
        ds_ot = self._ds(slakh_root, cache, onsets_only=True)
        assert ds_ot._song_key(ds_ot.df[0]) != k0
        # touching a stem's bytes -> different key (content, not mtime)
        stem_path = os.path.join(ds.df[0]['midi_path'], 'S00.mid')
        with open(stem_path, 'rb') as f:
            orig = f.read()
        try:
            with open(stem_path, 'ab') as f:
                f.write(b'\x00')
            assert ds._song_key(ds.df[0]) != k0
        finally:
            with open(stem_path, 'wb') as f:
                f.write(orig)
        assert ds._song_key(ds.df[0]) == k0

    def test_num_frames_mismatch_is_miss(self, slakh_root, tmp_path):
        """A stored entry for a different audio length re-tokenizes (the
        per-frame index arrays are only valid for their frame grid)."""
        cache = tmp_path / 'tok_cache'
        ds = self._ds(slakh_root, cache)
        song = ds._load_song(0)
        key = ds._song_key(ds.df[0])
        entry = ds._disk.get(key)
        assert entry['num_frames'] == song.num_frames
        # corrupt the stored frame count; a fresh instance must fall back
        # to tokenizing and then heal the entry
        arrays = {k: entry[k] for k in
                  ('events', 'event_start_indices', 'event_end_indices',
                   'state_events', 'state_event_indices')}
        ds._disk.put(key, arrays, num_frames=entry['num_frames'] + 7)
        fresh = self._ds(slakh_root, cache)
        song2 = fresh._load_song(0)
        np.testing.assert_array_equal(song2.events, song.events)
        assert fresh._disk.get(key)['num_frames'] == song.num_frames

    def test_corrupt_entry_degrades_to_miss(self, slakh_root, tmp_path):
        cache = tmp_path / 'tok_cache'
        ds = self._ds(slakh_root, cache)
        ds._load_song(0)
        key = ds._song_key(ds.df[0])
        path = ds._disk._path(key)
        with open(path, 'wb') as f:
            f.write(b'not an npz')
        fresh = self._ds(slakh_root, cache)
        assert fresh._disk.get(key) is None      # dropped, not raised
        assert fresh._load_song(0) is not None   # re-tokenized fine

    def test_env_var_enables_cache(self, slakh_root, tmp_path, monkeypatch):
        cache = tmp_path / 'env_cache'
        monkeypatch.setenv('MR_MT3_TOKEN_CACHE', str(cache))
        ds = SlakhDataset(slakh_root, shuffle=False, is_deterministic=True,
                          num_rows_per_batch=2)
        ds._load_song(0)
        assert any(f.suffix == '.npz' for f in cache.iterdir())
        monkeypatch.delenv('MR_MT3_TOKEN_CACHE')
        off = SlakhDataset(slakh_root, shuffle=False, num_rows_per_batch=2)
        assert off._disk is None

    def test_commu_shares_cache_flow(self, commu_root, tmp_path, monkeypatch):
        cache = tmp_path / 'commu_cache'
        cold = ComMUDataset(commu_root, shuffle=False, num_rows_per_batch=2,
                            is_deterministic=True, cache_dir=str(cache))
        item_cold = cold[0]
        from mr_mt3_tpu.data import transforms as tf_mod
        monkeypatch.setattr(tf_mod, 'tokenize_song', lambda *a, **k: (_ for _ in ()).throw(
            AssertionError('tokenize_song called on warm restart')))
        warm = ComMUDataset(commu_root, shuffle=False, num_rows_per_batch=2,
                            is_deterministic=True, cache_dir=str(cache))
        for k in item_cold:
            np.testing.assert_array_equal(warm[0][k], item_cold[k])
