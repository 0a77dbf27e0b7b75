"""System test: the full loop learns.

Train a small model to overfit two short tonal songs (deterministic
segment sampling), then run the real inference engine + evaluator and
require a high onset F1 against ground truth. This exercises dataset
tokenization -> on-device mel -> training -> KV-cache decoding -> token
postprocess -> MIDI writing -> metric engine end to end with real signal.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mr_mt3_tpu.audio import write_wav
from mr_mt3_tpu.codec import note_sequences as nsq
from mr_mt3_tpu.data import SlakhDataset, collate_batch
from mr_mt3_tpu.eval import program_aware_note_scores
from mr_mt3_tpu.infer import InferenceHandler
from mr_mt3_tpu.midi import note_sequence_to_midi_file
from mr_mt3_tpu.models import MT3, MT3Config
from mr_mt3_tpu.scripts.merge_slakh_midi import merge_song_midis
from mr_mt3_tpu.train.optim import make_optimizer
from mr_mt3_tpu.train.trainer import create_train_state, make_train_step


def _tonal_song(rng, duration=6.25, sr=16000, n_notes=9, program=0):
    """(audio, notes) where each note is a sine at its MIDI pitch.

    Notes stay within the first 3 x 256-frame windows (the dataset's
    splitter drops the trailing partial window, so that region is never
    trained).
    """
    t_total = int(duration * sr)
    audio = np.zeros(t_total, np.float32)
    notes = []
    starts = np.sort(rng.choice(np.arange(1, 11),
                                size=n_notes, replace=False)) / 2.0
    for s in starts:
        pitch = int(rng.integers(55, 76))
        length = 0.4
        f = 440.0 * 2 ** ((pitch - 69) / 12)
        i0, i1 = int(s * sr), int((s + length) * sr)
        seg_t = np.arange(i1 - i0) / sr
        env = np.minimum(1, np.minimum(seg_t / 0.02, (length - seg_t) / 0.05))
        audio[i0:i1] += (0.5 * np.sin(2 * np.pi * f * seg_t) * env).astype(
            np.float32)
        notes.append((s, s + length, pitch))
    return audio, notes


@pytest.fixture(scope='module')
def tonal_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('tonal')
    rng = np.random.default_rng(0)
    for song in ['Track00001', 'Track00002']:
        d = root / song
        (d / 'MIDI').mkdir(parents=True)
        audio, notes = _tonal_song(rng)
        write_wav(d / 'mix_16k.wav', audio, 16000)
        ns = nsq.NoteSequence()
        for start, end, pitch in notes:
            ns.add_note(start_time=start, end_time=end, pitch=pitch,
                        velocity=100, program=0, is_drum=False, instrument=0)
            ns.total_time = max(ns.total_time, end)
        note_sequence_to_midi_file(ns, d / 'MIDI' / 'S00.mid')
        with open(d / 'inst_names.json', 'w') as f:
            json.dump({'S00': 'Acoustic Piano'}, f)
        merge_song_midis(str(d))
    return str(root)


@pytest.mark.slow
def test_overfit_then_transcribe(tonal_root):
    cfg = MT3Config(d_model=96, d_kv=24, d_ff=192, num_heads=4,
                    num_encoder_layers=2, num_decoder_layers=2,
                    dropout_rate=0.0)
    model = MT3(cfg)

    ds = SlakhDataset(tonal_root, shuffle=False, is_deterministic=True,
                      is_randomize_tokens=False, num_rows_per_batch=3,
                      split_frame_length=256, event_length=256)
    batch = collate_batch([ds[0], ds[1]])  # 6 fixed segments
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 512)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32))
    optimizer = make_optimizer(2e-3, use_schedule=False, weight_decay=0.0)
    state = create_train_state(variables['params'], optimizer)
    step = make_train_step(model, optimizer)

    key = jax.random.PRNGKey(1)
    loss = None
    for i in range(400):
        state, metrics = step(state, jb, key)
        loss = float(metrics['loss'])
        if loss < 0.02:
            break
    assert loss < 0.2, f'did not overfit: final loss {loss}'

    handler = InferenceHandler(model=model, variables={'params': state.params},
                               max_length=256, batch_size=4)
    scores = []
    for song in ['Track00001', 'Track00002']:
        audio_path = os.path.join(tonal_root, song, 'mix_16k.wav')
        from mr_mt3_tpu.audio import read_wav
        audio, _ = read_wav(audio_path)
        # transcribe exactly the trained span (3 x 256-frame windows)
        audio = audio[:768 * 128]
        out = os.path.join(tonal_root, song, 'transcribed.mid')
        ns = handler.inference(audio, outpath=out)
        assert ns is not None and len(ns.notes) > 0
        res = program_aware_note_scores(
            os.path.join(tonal_root, song, 'all_src_v2.mid'), out, 'flat')
        scores.append(res['Onset F1'])
    mean_f1 = float(np.mean(scores))
    assert mean_f1 > 0.8, f'transcription F1 too low: {scores}'
