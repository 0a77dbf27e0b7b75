"""ops/train_attention.py: fused training attention vs the einsum oracle.

The kernel claims exact-attention numerics (fp32 scores/softmax, bf16
PV — the einsum path's contract), so forward and gradients must agree
with the plain-jnp reference to bf16 reassociation tolerance at every
production shape: self 256, cross 256x320 (kv padding + masking), and
the 1024-token segmem memory encoder, plus the causal decoder square.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mr_mt3_tpu.ops.train_attention import fused_attention


def einsum_attention(q, k, v, causal=False):
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k)
    if causal:
        lq, lk = q.shape[1], k.shape[1]
        tri = jnp.tril(jnp.ones((lq, lk), dtype=bool))
        scores = scores + jnp.where(tri, 0.0, -1e9).astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
        q.dtype)
    return jnp.einsum('bhqk,bkhd->bqhd', probs, v)


def make_qkv(rng, b, lq, lk, h=2, d=64, dtype=jnp.bfloat16):
    q = jnp.asarray(rng.normal(size=(b, lq, h, d)), dtype) * 0.3
    k = jnp.asarray(rng.normal(size=(b, lk, h, d)), dtype) * 0.3
    v = jnp.asarray(rng.normal(size=(b, lk, h, d)), dtype)
    return q, k, v


SHAPES = [
    pytest.param(64, 64, False, id='self64'),
    pytest.param(256, 256, False, id='self256'),
    pytest.param(256, 256, True, id='causal256'),
    pytest.param(256, 320, False, id='cross320_padded'),
    pytest.param(1024, 1024, False, id='memenc1024'),
]


@pytest.mark.parametrize('lq,lk,causal', SHAPES)
def test_forward_matches_einsum(lq, lk, causal):
    rng = np.random.default_rng(0)
    q, k, v = make_qkv(rng, 2, lq, lk)
    got = fused_attention(q, k, v, causal)
    want = einsum_attention(q, k, v, causal)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize('lq,lk,causal', [
    pytest.param(64, 64, False, id='self64'),
    pytest.param(64, 96, False, id='cross96_padded'),
    pytest.param(128, 128, True, id='causal128'),
])
def test_gradients_match_einsum(lq, lk, causal):
    rng = np.random.default_rng(1)
    q, k, v = make_qkv(rng, 2, lq, lk)
    do = jnp.asarray(rng.normal(size=(2, lq, q.shape[2], 64)),
                     jnp.bfloat16)

    def loss(fn):
        def inner(args):
            out = fn(*args, causal)
            return jnp.sum(out.astype(jnp.float32) *
                           do.astype(jnp.float32))
        return inner

    g_fused = jax.grad(loss(fused_attention))((q, k, v))
    g_ref = jax.grad(loss(einsum_attention))((q, k, v))
    for got, want, name in zip(g_fused, g_ref, 'qkv'):
        assert got.shape == want.shape, name
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=f'd{name}')


def test_padded_kv_grads_are_trimmed():
    rng = np.random.default_rng(2)
    q, k, v = make_qkv(rng, 1, 64, 96)

    def loss(args):
        return jnp.sum(fused_attention(*args).astype(jnp.float32) ** 2)

    dq, dk, dv = jax.grad(loss)((q, k, v))
    assert dk.shape == k.shape and dv.shape == v.shape


def test_fp32_inputs_work_in_interpret_mode():
    rng = np.random.default_rng(3)
    q, k, v = make_qkv(rng, 1, 64, 64, dtype=jnp.float32)
    got = fused_attention(q, k, v)
    want = einsum_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_model_fused_config_matches_einsum_logits():
    """End-to-end: a tiny MT3 with attention_kernel='fused' produces the
    same logits as 'einsum' (interpret mode on CPU)."""
    from mr_mt3_tpu.models import MT3, MT3Config

    logits = {}
    for kernel in ('einsum', 'fused'):
        cfg = MT3Config(d_model=32, num_heads=2, d_kv=16, d_ff=64,
                        num_encoder_layers=1, num_decoder_layers=1,
                        vocab_size=128, dtype='bfloat16',
                        attention_kernel=kernel)
        model = MT3(cfg)
        mel = jnp.asarray(
            np.random.default_rng(4).normal(size=(1, 256, cfg.mel_bins)),
            jnp.float32)
        ids = jnp.zeros((1, 256), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), mel,
                               decoder_input_ids=ids)
        logits[kernel] = np.asarray(model.apply(
            variables, mel, decoder_input_ids=ids), np.float32)
    # absolute tolerance only: the kernel keeps the MXU's fp32 score
    # accumulation where einsum rounds scores to bf16 first, so logits
    # differ by bf16-rounding noise (measured max 0.04 on ~2.0-scale
    # logits); relative comparison on near-zero logits is meaningless
    np.testing.assert_allclose(logits['fused'], logits['einsum'],
                               atol=8e-2)
