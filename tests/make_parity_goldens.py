"""Regenerate the end-to-end parity goldens in tests/goldens/.

Run manually when the harness design changes:

    python tests/make_parity_goldens.py

Trains the two tiny parity models (vanilla MT3 and segmem v2-with-prev) to
overfit the fixed synthetic corpus, verifies the greedy decode path is
confident (min top-2 logit margin), runs this framework's full inference
pipeline, and freezes {weights, token streams, margins, audio hash} into
tests/goldens/parity_{vanilla,withprev}.npz. tests/test_parity_e2e.py then
requires both the repo pipeline and the reference-wired torch oracle to
reproduce these token streams exactly.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault('JAX_DEFAULT_MATMUL_PRECISION', 'float32')

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from mr_mt3_tpu.codec import note_sequences as nsq
from mr_mt3_tpu.audio import write_wav
from mr_mt3_tpu.data import (
    SlakhDataset,
    SlakhDatasetWithPrevSegmem,
    collate_batch,
)
from mr_mt3_tpu.infer import InferenceHandler
from mr_mt3_tpu.midi import note_sequence_to_midi_file
from mr_mt3_tpu.models import MT3
from mr_mt3_tpu.ops.decode import initial_segmem_tokens
from mr_mt3_tpu.train.optim import make_optimizer
from mr_mt3_tpu.train.trainer import create_train_state, make_train_step

from tests.parity_common import (
    GOLDEN_DIR,
    MAX_LENGTH,
    NUM_SEGMENTS,
    V1_CFG,
    VANILLA_CFG,
    WITHPREV_CFG,
    audio_sha,
    decode_margin,
    full_scale_inputs,
    full_scale_params,
    parity_corpus,
    save_golden,
)

MIN_MARGIN = 0.25  # fp32 cross-impl noise is ~2e-4; 0.25 is >1000x headroom


def build_corpus(tmp_root):
    audios, note_lists = parity_corpus()
    for i, (audio, notes) in enumerate(zip(audios, note_lists)):
        d = os.path.join(tmp_root, f'Track0000{i + 1}')
        os.makedirs(os.path.join(d, 'MIDI'), exist_ok=True)
        write_wav(os.path.join(d, 'mix_16k.wav'), audio, 16000)
        ns = nsq.NoteSequence()
        for start, end, pitch in notes:
            ns.add_note(start_time=start, end_time=end, pitch=pitch,
                        velocity=100, program=0, is_drum=False, instrument=0)
            ns.total_time = max(ns.total_time, end)
        note_sequence_to_midi_file(ns, os.path.join(d, 'MIDI', 'S00.mid'))
        with open(os.path.join(d, 'inst_names.json'), 'w') as f:
            json.dump({'S00': 'Acoustic Piano'}, f)
    return audios


def overfit(model, batch, seed=0, max_steps=2000, target_loss=0.005):
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 256, 512)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
                           **({'targets_prev': jnp.zeros((1, 4), jnp.int32)}
                              if model.cfg.has_segmem else {}))
    optimizer = make_optimizer(2e-3, use_schedule=False, weight_decay=0.0)
    state = create_train_state(variables['params'], optimizer)
    step = make_train_step(model, optimizer)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    loss = None
    for i in range(max_steps):
        state, metrics = step(state, jb, key)
        loss = float(metrics['loss'])
        if i % 100 == 0:
            print(f'  step {i} loss {loss:.4f}', flush=True)
        if loss < target_loss:
            break
    print(f'  final loss {loss:.5f}')
    assert loss < 0.05, f'did not overfit (loss {loss})'
    return jax.tree.map(np.asarray, state.params)


def main():
    import tempfile
    tmp_root = tempfile.mkdtemp(prefix='parity_corpus_')
    audios = build_corpus(tmp_root)
    sha = audio_sha(audios)
    print('corpus sha', sha)

    # ---------- vanilla ----------
    print('training vanilla parity model')
    ds = SlakhDataset(tmp_root, shuffle=False, is_deterministic=True,
                      is_randomize_tokens=False,
                      num_rows_per_batch=NUM_SEGMENTS,
                      split_frame_length=256, event_length=256)
    batch = collate_batch([ds[0], ds[1]])
    model = MT3(VANILLA_CFG)
    params = overfit(model, batch)

    handler = InferenceHandler(model=model, variables={'params': params},
                               max_length=MAX_LENGTH,
                               batch_size=NUM_SEGMENTS)
    tokens, margins = [], []
    for audio in audios:
        segments, _, valid = handler._audio_to_segments(audio)
        mel = handler._compute_mel(segments, valid)
        toks = handler._decode_all(mel)
        tokens.append(toks)
        margins.append(decode_margin(model, params, mel, toks))
    tokens = np.stack(tokens).astype(np.int32)  # (2, 3, 1025)
    margin = float(min(margins))
    print(f'vanilla margin {margin:.3f}, '
          f'tokens/seg {[(r == 1).argmax() for r in tokens.reshape(-1, tokens.shape[-1])]}')
    assert margin > MIN_MARGIN, f'vanilla decode not confident: {margin}'
    save_golden('parity_vanilla.npz', params, tokens=tokens,
                margin=np.float32(margin), audio_sha=np.bytes_(sha),
                max_length=np.int32(MAX_LENGTH))

    # ---------- segmem v2-with-prev, contiguous ----------
    print('training with-prev parity model')
    dsp = SlakhDatasetWithPrevSegmem(
        tmp_root, shuffle=False, is_deterministic=True,
        is_randomize_tokens=False, num_rows_per_batch=NUM_SEGMENTS,
        split_frame_length=256, event_length=256)
    batchp = collate_batch([dsp[0], dsp[1]])
    modelp = MT3(WITHPREV_CFG)
    paramsp = overfit(modelp, batchp)

    handlerp = InferenceHandler(model=modelp,
                                variables={'params': paramsp},
                                max_length=MAX_LENGTH,
                                contiguous_inference=True,
                                segment_bucket=1)
    tokensp, marginsp = [], []
    for audio in audios:
        segments, _, valid = handlerp._audio_to_segments(audio)
        mel = handlerp._compute_mel(segments, valid)
        toks = handlerp._decode_all(mel)  # (3, 1025) sequential chain
        tokensp.append(toks)
        # margin per segment, teacher-forced with its actual memory
        prev = np.asarray(initial_segmem_tokens(
            modelp.cfg, 1, MAX_LENGTH, codec=handlerp.codec,
            vocab=handlerp.vocab))
        for i in range(toks.shape[0]):
            marginsp.append(decode_margin(
                modelp, paramsp, mel[i:i + 1], toks[i:i + 1],
                targets_prev=prev))
            prev = toks[i:i + 1, :MAX_LENGTH]
    tokensp = np.stack(tokensp).astype(np.int32)
    marginp = float(min(marginsp))
    print(f'withprev margin {marginp:.3f}')
    assert marginp > MIN_MARGIN, f'withprev decode not confident: {marginp}'
    save_golden('parity_withprev.npz', paramsp, tokens=tokensp,
                margin=np.float32(marginp), audio_sha=np.bytes_(sha),
                max_length=np.int32(MAX_LENGTH))

    # ---------- segmem v1 (decoder-prepend), contiguous generate_2 ----------
    print('training v1 (decoder_prepend) parity model')
    # v1 trains with batch-internal memory (no targets_prev in the batch —
    # reference: models/t5_segmem.py:125-132), on the plain dataset
    model1 = MT3(V1_CFG)
    params1 = overfit(model1, batch)  # same plain-Slakh batch as vanilla

    handler1 = InferenceHandler(model=model1,
                                variables={'params': params1},
                                max_length=MAX_LENGTH,
                                contiguous_inference=True,
                                segment_bucket=1)
    tokens1, margins1 = [], []
    for audio in audios:
        segments, _, valid = handler1._audio_to_segments(audio)
        mel = handler1._compute_mel(segments, valid)
        toks = handler1._decode_all(mel)
        tokens1.append(toks)
        prev = np.asarray(initial_segmem_tokens(
            model1.cfg, 1, MAX_LENGTH))
        for i in range(toks.shape[0]):
            margins1.append(decode_margin(
                model1, params1, mel[i:i + 1], toks[i:i + 1],
                targets_prev=prev))
            prev = toks[i:i + 1, :MAX_LENGTH]
    tokens1 = np.stack(tokens1).astype(np.int32)
    margin1 = float(min(margins1))
    print(f'v1 margin {margin1:.3f}')
    assert margin1 > MIN_MARGIN, f'v1 decode not confident: {margin1}'
    save_golden('parity_v1.npz', params1, tokens=tokens1,
                margin=np.float32(margin1), audio_sha=np.bytes_(sha),
                max_length=np.int32(MAX_LENGTH))

    make_46m_logits_golden()
    print('goldens written to tests/goldens/')


def make_46m_logits_golden():
    """Freeze the production-scale (46M-config) teacher-forced logits slab.

    Weights regenerate deterministically from PRNGKey(0) (no weights are
    stored — see parity_common.FULL_CFG for why); only the (1, 64, 1536)
    logits go into the golden."""
    print('generating 46M-config logits golden')
    model, params = full_scale_params()
    mel, ids = full_scale_inputs()
    logits = np.asarray(model.apply(
        {'params': params}, jnp.asarray(mel),
        decoder_input_ids=jnp.asarray(ids), deterministic=True),
        np.float32)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, 'parity_46m_logits.npz'),
        logits=logits, decoder_ids=ids,
        audio_sha=np.bytes_(audio_sha([full_scale_inputs()[0]])))
    print(f'  logits scale |max| = {np.abs(logits).max():.3f}')


if __name__ == '__main__':
    main()
