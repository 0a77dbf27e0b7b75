"""Shared scaffolding for the end-to-end token parity harness.

The north star is F1 within 0.001 of the reference, which reduces to the
token stream out of `audio -> mel -> encode -> greedy decode -> postprocess`
being identical (the detokenizer and metrics are deterministic host code,
locked by their own golden tests). No real Slakh data or official weights
exist in this environment and the reference cannot run under transformers
4.57, so the proof is differential: a tiny model is overfit on synthetic
tonal audio until its decode path is CONFIDENT (large top-2 logit margins,
so fp32-level noise cannot flip argmax), its weights are frozen into
tests/goldens/, and the same weights drive

  (a) this framework's full pipeline (InferenceHandler), and
  (b) a PyTorch oracle wired exactly like the reference fork
      (stock HF T5Blocks, zeroed relative bias, additive sinusoidal
      positions, no KV cache, reference generate loops
      — reference: models/t5.py:251-302, 478-702,
        models/t5_segmem_v2_with_prev.py:226-297, inference.py:64-127).

Both must reproduce the frozen golden token streams exactly.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Tuple

import numpy as np

from mr_mt3_tpu.models import MT3Config

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')

# large enough to overfit confidently, small enough to run on one CPU core
VANILLA_CFG = MT3Config(d_model=96, d_kv=24, d_ff=192, num_heads=4,
                        num_encoder_layers=2, num_decoder_layers=2,
                        dropout_rate=0.0)
WITHPREV_CFG = VANILLA_CFG.replace(segmem_variant='encoder_append',
                                   segmem_length=16)
V1_CFG = VANILLA_CFG.replace(segmem_variant='decoder_prepend',
                             segmem_length=16, segmem_seed='eos')
MAX_LENGTH = 1024  # reference decode budget (inference.py:187)
NUM_SEGMENTS = 3   # trained/transcribed span per song, 256 frames each

# The PRODUCTION dimensions (46M params: d_model 512, 8+8 layers, 6 heads
# — reference: models/t5.py:37-72, config/model/MT3Net.yaml). Storing
# trained 46M weights in-repo is impossible (~183 MB), so production-scale
# parity is pinned differentially: weights derive DETERMINISTICALLY from
# PRNGKey(0) (flax init is pure threefry, platform-stable), a short
# teacher-forced logits slab is frozen as a small golden, and the torch
# oracle must reproduce the same logits from the same weights. Argmax
# flip-rate on real trained 46M checkpoints is guarded at runtime by the
# serving probe (serve.quantize_probe).
FULL_CFG = MT3Config(dropout_rate=0.0)
FULL_DECODE_STEPS = 64


def full_scale_params():
    """Deterministic 46M-config parameter tree (seed 0)."""
    import jax
    import jax.numpy as jnp

    from mr_mt3_tpu.models import MT3
    model = MT3(FULL_CFG)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, FULL_CFG.mel_bins)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32))
    return model, variables['params']


def full_scale_inputs():
    """Deterministic (mel (1, 256, 512), decoder_ids (1, 64)) probe."""
    import jax.numpy as jnp

    from mr_mt3_tpu.audio import (
        SpectrogramConfig,
        compute_logmel,
        normalize_logmel,
    )
    audios, _ = parity_corpus()
    seg = audios[0][:256 * 128].reshape(1, -1)
    mel = normalize_logmel(compute_logmel(jnp.asarray(seg),
                                          SpectrogramConfig()))
    ids = np.random.default_rng(7).integers(
        3, 1389, size=(1, FULL_DECODE_STEPS)).astype(np.int32)
    ids[0, 0] = 0  # decoder start token
    return np.asarray(mel, np.float32), ids


def tonal_song(rng, n_notes=9, program=0):
    """Deterministic synthetic song: sine per MIDI pitch + broadband noise.

    The -60 dB noise floor keeps every mel bin above the fp32 FFT noise
    floor so the JAX and torch frontends agree tightly everywhere (silent
    bins otherwise sit on implementation-defined log values — the reference
    notes the same sensitivity: contrib/spectrograms.py:114-118).
    """
    sr = 16000
    t_total = NUM_SEGMENTS * 256 * 128  # exactly the transcribed span
    audio = rng.normal(size=t_total).astype(np.float32) * 1e-3
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


def parity_corpus() -> Tuple[list, list]:
    """Two fixed songs; returns (audios, note_lists)."""
    rng = np.random.default_rng(2024)
    songs = [tonal_song(rng) for _ in range(2)]
    return [a for a, _ in songs], [n for _, n in songs]


def audio_sha(audios) -> str:
    h = hashlib.sha256()
    for a in audios:
        h.update(np.ascontiguousarray(a, np.float32).tobytes())
    return h.hexdigest()


def flatten_params(params, prefix='') -> Dict[str, np.ndarray]:
    out = {}
    for key, value in params.items():
        path = f'{prefix}/{key}' if prefix else key
        if isinstance(value, dict):
            out.update(flatten_params(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    params: Dict = {}
    for key, value in flat.items():
        node = params
        parts = key.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)
    return params


def load_golden(name: str):
    path = os.path.join(GOLDEN_DIR, name)
    blob = np.load(path, allow_pickle=False)
    params = unflatten_params(
        {k[len('param:'):]: blob[k] for k in blob.files
         if k.startswith('param:')})
    meta = {k: blob[k] for k in blob.files if not k.startswith('param:')}
    return params, meta


def save_golden(name: str, params, **meta):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    flat = {f'param:{k}': v for k, v in flatten_params(params).items()}
    np.savez_compressed(os.path.join(GOLDEN_DIR, name), **flat, **meta)


def decode_margin(model, params, mel, tokens, targets_prev=None) -> float:
    """Min top-2 logit margin along the emitted path (teacher-forced
    re-score of the greedy tokens; identical logits by determinism).
    Tokens: (B, L+1) with leading start id. Margins are measured on every
    position up to and including the first EOS of each row."""
    import jax.numpy as jnp
    # trim the padded tail (everything after the last row's EOS) to keep
    # the teacher-forced re-score cheap
    out_full = tokens[:, 1:]
    if (out_full == 1).any():
        last = int(max(np.argmax(r == 1) if (r == 1).any()
                       else len(r) - 1 for r in out_full))
        tokens = tokens[:, :last + 2]
    kwargs = {}
    if targets_prev is not None:
        kwargs['targets_prev'] = jnp.asarray(targets_prev)
    logits = np.asarray(model.apply(
        {'params': params}, jnp.asarray(mel),
        decoder_input_ids=jnp.asarray(tokens[:, :-1]),
        deterministic=True, **kwargs))
    top2 = np.sort(logits, axis=-1)
    margins = top2[..., -1] - top2[..., -2]
    out = tokens[:, 1:]
    eos_pos = np.argmax(out == 1, axis=-1)
    has_eos = (out == 1).any(axis=-1)
    live = np.arange(out.shape[1])[None, :] <= np.where(
        has_eos, eos_pos, out.shape[1] - 1)[:, None]
    return float(margins[live].min())
