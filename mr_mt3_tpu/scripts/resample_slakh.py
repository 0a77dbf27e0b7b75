"""Resample Slakh mixes to 16 kHz PCM_24 wavs (mix_16k.wav).

(reference: resample.py) The reference reads mix.flac via librosa; this
image ships no FLAC decoder, so FLAC inputs raise with a pointer to
convert externally — wav inputs are handled natively. Threaded like the
reference (ThreadPool of 12).

Usage: python -m mr_mt3_tpu.scripts.resample_slakh <slakh_root>
"""

from __future__ import annotations

import concurrent.futures
import glob
import os
import sys
import traceback

from mr_mt3_tpu.audio import read_wav, resample, write_wav


def convert_one(fname: str) -> None:
    if fname.endswith('.flac'):
        raise NotImplementedError(
            'no FLAC decoder in this environment; convert to wav first '
            '(e.g. ffmpeg -i mix.flac mix.wav) or point the dataset at wavs')
    audio, sr = read_wav(fname)
    if sr != 16000:
        audio = resample(audio, sr, 16000)
    out = fname.rsplit('.', 1)[0] + '_16k.wav'
    write_wav(out, audio, 16000, subtype='PCM_24')


def main(root: str, mix_name: str = 'mix.wav') -> None:
    for split in ['train', 'validation', 'test']:
        files = sorted(glob.glob(
            os.path.join(root, split, '**', mix_name), recursive=True))
        print(f'{split}: {len(files)} files')
        with concurrent.futures.ThreadPoolExecutor(max_workers=12) as pool:
            futures = {pool.submit(convert_one, f): f for f in files}
            for future in concurrent.futures.as_completed(futures):
                try:
                    future.result()
                except Exception:
                    traceback.print_exc()


if __name__ == '__main__':
    main(sys.argv[1], *(sys.argv[2:] or []))
