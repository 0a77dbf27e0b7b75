"""Is the production train step input-bound? Measure the host loader.

The train roofline (dev_train_roofline.py) feeds synthetic device
batches, so it proves the STEP sustains 614 seg/s (B=96, bf16, bucketed,
hardware RNG) but not that the host pipeline can feed it. This drives
the real SlakhDataset + threaded DataLoader on a synthetic Slakh-format
corpus (the tests' fixture layout) and reports steady-state segments/s
for the cold first epoch (WAV read + MIDI tokenize) and the cached
steady state (epochs 2+, which is what training actually sees).

    python benchmarks/dev_loader_feed.py [songs] [rows_per_item]

CPU-only; prints one JSON line.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, '.')


def build_corpus(root: Path, n_songs: int, dur_s: float = 180.0):
    """Slakh-shaped songs at realistic length (~3 min) and note density."""
    from mr_mt3_tpu.audio.io import write_wav
    from mr_mt3_tpu.codec import note_sequences as nsq
    from mr_mt3_tpu.midi import note_sequence_to_midi_file

    rng = np.random.default_rng(0)
    for si in range(n_songs):
        d = root / f'Track{si:05d}'
        (d / 'MIDI').mkdir(parents=True)
        audio = (rng.normal(size=int(16000 * dur_s)) * 0.05
                 ).astype(np.float32)
        write_wav(d / 'mix_16k.wav', audio, 16000)
        # a realistically dense song: ~8 notes/s across 3 stems
        stems = {'S00': (0, False), 'S01': (33, False), 'S02': (0, True)}
        names = {}
        for stem, (program, drum) in stems.items():
            ns = nsq.NoteSequence()
            for i in range(int(dur_s * 8 / len(stems))):
                t0 = i * len(stems) / 8 + rng.uniform(0, 0.1)
                ns.add_note(start_time=t0, end_time=t0 + 0.3,
                            pitch=int(rng.integers(36, 84)), velocity=100,
                            program=program, is_drum=drum,
                            instrument=9 if drum else 0)
                ns.total_time = max(ns.total_time, t0 + 0.3)
            note_sequence_to_midi_file(ns, d / 'MIDI' / f'{stem}.mid')
            names[stem] = 'Drums' if drum else 'Acoustic Piano'
        with open(d / 'inst_names.json', 'w') as f:
            json.dump(names, f)


def main(n_songs: int = 8, rows: int = 12):
    from mr_mt3_tpu.data.loader import DataLoader
    from mr_mt3_tpu.data.slakh import SlakhDataset

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        build_corpus(root, n_songs)
        cache_dir = str(root / '.token_cache')

        def epoch_rate(ds):
            loader = DataLoader(ds, batch_size=8, shuffle=True,
                                num_workers=4)
            t0 = time.monotonic()
            segs = 0
            for batch in loader:
                segs += batch['audio'].shape[0]
            return segs, time.monotonic() - t0

        ds = SlakhDataset(str(root), shuffle=True,
                          num_rows_per_batch=rows,
                          split_frame_length=2000, cache_dir=cache_dir)
        segs1, t1 = epoch_rate(ds)   # cold: WAV read + MIDI tokenize
        segs2, t2 = epoch_rate(ds)   # in-memory cached tokenizations
        segs3, t3 = epoch_rate(ds)
        warm = min(t2, t3)
        # process "restart": a FRESH dataset instance whose first epoch
        # loads tokenizations from the on-disk cache (data/disk_cache.py)
        # instead of re-parsing MIDI — the durable win over the
        # reference's per-epoch re-parse
        ds_restart = SlakhDataset(str(root), shuffle=True,
                                  num_rows_per_batch=rows,
                                  split_frame_length=2000,
                                  cache_dir=cache_dir)
        segs4, t4 = epoch_rate(ds_restart)
        print(json.dumps({
            'case': f'loader_feed_{n_songs}songs_x{rows}rows',
            'cold_seg_s': round(segs1 / t1, 1),
            'warm_seg_s': round(segs2 / warm, 1),
            'restart_seg_s': round(segs4 / t4, 1),
            'segments_per_epoch': segs1,
            'step_demand_seg_s': 614,
            'headroom_x': round(segs2 / warm / 614, 1)}), flush=True)


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
