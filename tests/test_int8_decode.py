"""Int8 fused-kernel decode path: numerics and accuracy bounds.

On CPU the Pallas kernels run in interpreter mode — same math, so these
tests pin the quantization error itself, independent of the TPU.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mr_mt3_tpu.models import MT3, MT3Config
from mr_mt3_tpu.ops.decode import greedy_decode
from mr_mt3_tpu.ops.int8_matmul import (
    int8_gated_ff,
    int8_matmul,
    quantize_columns,
)


class TestKernels:
    def test_int8_matmul_matches_dequant_reference(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(512, 1536)), jnp.float32)
        w_q, scale = quantize_columns(w)
        got = np.asarray(int8_matmul(x, w_q, scale, interpret=True))
        want = np.asarray(x @ (w_q.astype(jnp.float32) * scale))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
        # quantization error itself is bounded: scale/2 per weight
        exact = np.asarray(x @ w)
        err = np.abs(got - exact).max()
        bound = float(np.abs(np.asarray(scale)).max()) * 0.5 * \
            np.abs(np.asarray(x)).sum(axis=1).max()
        assert err <= bound

    def test_gated_ff_matches_bf16_formula(self):
        from mr_mt3_tpu.models.mt3 import gelu_new
        rng = np.random.default_rng(1)
        h = jnp.asarray(rng.normal(size=(8, 512)) * 0.5, jnp.float32)
        w0 = jnp.asarray(rng.normal(size=(512, 1024)) * 0.05, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(512, 1024)) * 0.05, jnp.float32)
        wo = jnp.asarray(rng.normal(size=(1024, 512)) * 0.05, jnp.float32)
        q0, s0 = quantize_columns(w0)
        q1, s1 = quantize_columns(w1)
        qo, so = quantize_columns(wo)
        got = np.asarray(int8_gated_ff(h, q0, s0, q1, s1, qo, so,
                                       interpret=True))
        want = np.asarray(
            (gelu_new(h @ w0) * (h @ w1)) @ wo)
        # int8 + bf16 accumulate: relative agreement at the percent level
        denom = np.abs(want).max()
        assert np.abs(got - want).max() / denom < 0.05

    def test_row_padding(self):
        """Batches below the 16-sublane tile pad transparently."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(3, 512)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(512, 128)), jnp.float32)
        w_q, scale = quantize_columns(w)
        out = int8_matmul(x, w_q, scale, interpret=True)
        assert out.shape == (3, 128)


class TestInt8KvAttention:
    def test_kernel_matches_dense_attention(self):
        """Interpret-mode kernel vs plain softmax attention on dequantized
        values — the kernel additionally quantizes q and the (v-scale-
        folded) probabilities to int8 for the MXU dots, so agreement is at
        the ~1% level, not exact."""
        from mr_mt3_tpu.ops.int8_attention import (
            int8_decode_attention,
            quantize_kv_rows,
        )
        rng = np.random.default_rng(0)
        b, h, dk, klen = 2, 6, 64, 128
        q = jnp.asarray(rng.normal(size=(b, h, dk)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, h, dk, klen)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, h, dk, klen)), jnp.float32)
        kq, ks = quantize_kv_rows(k)
        vq, vs = quantize_kv_rows(v)
        position = 100  # slots 101..127 masked
        got = np.asarray(int8_decode_attention(q, kq, ks, vq, vs,
                                               position, interpret=True))
        k_dq = np.asarray(kq, np.float32) * np.asarray(ks)
        v_dq = np.asarray(vq, np.float32) * np.asarray(vs)
        scores = np.einsum('bhd,bhdk->bhk', np.asarray(q), k_dq)
        scores[..., position + 1:] = -1e9
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        want = np.einsum('bhk,bhdk->bhd', probs, v_dq).reshape(b, h * dk)
        # random q/k give maximally DIFFUSE attention — the worst case for
        # probability quantization (~0.06 abs on ~N(0,0.3) outputs);
        # trained peaked attention errs far less (see the zero-flip test)
        np.testing.assert_allclose(got, want, atol=0.08)
        # and close to the unquantized attention
        scores_f = np.einsum('bhd,bhdk->bhk', np.asarray(q), np.asarray(k))
        scores_f[..., position + 1:] = -1e9
        probs_f = np.exp(scores_f - scores_f.max(-1, keepdims=True))
        probs_f /= probs_f.sum(-1, keepdims=True)
        exact = np.einsum('bhk,bhdk->bhd', probs_f,
                          np.asarray(v)).reshape(b, h * dk)
        assert np.abs(got - exact).max() < 0.2

    def test_int8_kv_decode_runs_and_matches_shape(self):
        """Full greedy decode through the int8_kv path (interpret mode)."""
        from mr_mt3_tpu.ops.decode import greedy_decode
        cfg = MT3Config(vocab_size=1536, d_model=32, d_kv=8, d_ff=48,
                        num_heads=4, num_encoder_layers=1,
                        num_decoder_layers=1, mel_bins=512,
                        dropout_rate=0.0)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mel = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 256, 512)), jnp.float32)
        toks = np.asarray(greedy_decode(model, variables, mel,
                                        max_length=12,
                                        quantize='int8_kv'))
        assert toks.shape == (2, 13)
        assert (toks[:, 0] == 0).all()


class TestInt8DecodeAccuracy:
    @pytest.mark.skipif(
        not os.path.exists(os.path.join(os.path.dirname(__file__),
                                        'goldens', 'parity_vanilla.npz')),
        reason='parity goldens missing')
    def test_token_flip_rate_on_parity_model(self):
        """Int8 decode on the overfit parity model: the confident decode
        path must survive quantization with zero token flips (margin ~2.0
        vs per-step logit perturbation well under 0.5)."""
        from tests.parity_common import VANILLA_CFG, load_golden, parity_corpus
        from mr_mt3_tpu.infer import InferenceHandler
        params, meta = load_golden('parity_vanilla.npz')
        model = MT3(VANILLA_CFG)
        audios, _ = parity_corpus()
        handler = InferenceHandler(model=model, variables={'params': params},
                                   max_length=int(meta['max_length']),
                                   batch_size=4, quantize='int8')
        segments, _, valid = handler._audio_to_segments(audios[0])
        mel = handler._compute_mel(segments, valid)
        tokens = handler._decode_all(mel)
        golden = np.asarray(meta['tokens'][0])
        flips = int((tokens != golden).sum())
        total = golden.size
        assert flips == 0, f'{flips}/{total} tokens flipped under int8'

    @pytest.mark.skipif(
        not os.path.exists(os.path.join(os.path.dirname(__file__),
                                        'goldens', 'parity_vanilla.npz')),
        reason='parity goldens missing')
    def test_int8_kv_token_flip_rate_on_parity_model(self):
        """Int8 KV decode on the overfit parity model: per-position scales
        keep attention outputs within ~0.4% relative, far below the ~2.0
        decode margin — zero flips expected."""
        from tests.parity_common import VANILLA_CFG, load_golden, parity_corpus
        from mr_mt3_tpu.infer import InferenceHandler
        params, meta = load_golden('parity_vanilla.npz')
        model = MT3(VANILLA_CFG)
        audios, _ = parity_corpus()
        handler = InferenceHandler(model=model,
                                   variables={'params': params},
                                   max_length=int(meta['max_length']),
                                   batch_size=4, quantize='int8_kv')
        segments, _, valid = handler._audio_to_segments(audios[0])
        mel = handler._compute_mel(segments, valid)
        tokens = handler._decode_all(mel)
        golden = np.asarray(meta['tokens'][0])
        flips = int((tokens != golden).sum())
        assert flips == 0, \
            f'{flips}/{golden.size} tokens flipped under int8_kv'

class TestQuantizeValidation:
    def test_unknown_mode_rejected(self):
        from mr_mt3_tpu.ops.decode import greedy_decode, segmem_greedy_decode
        cfg = MT3Config(vocab_size=1536, d_model=32, d_kv=8, d_ff=48,
                        num_heads=4, num_encoder_layers=1,
                        num_decoder_layers=1, mel_bins=512,
                        dropout_rate=0.0)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mel = jnp.zeros((1, 256, 512))
        with pytest.raises(ValueError, match='unknown quantize'):
            greedy_decode(model, variables, mel, 8, quantize='int8-kv')
        scfg = cfg.replace(segmem_variant='encoder_append', segmem_length=8)
        smodel = MT3(scfg)
        svars = smodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512)),
                            decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
                            targets_prev=jnp.zeros((1, 4), jnp.int32))
        with pytest.raises(ValueError, match='unknown quantize'):
            segmem_greedy_decode(smodel, svars, mel[None], 8,
                                 quantize='INT8')

    def test_int8_kv_requires_bhdk_layout(self):
        from mr_mt3_tpu.ops.fast_decode import (
            greedy_loop_fast,
            stack_decode_params,
        )
        cfg = MT3Config(vocab_size=1536, d_model=32, d_kv=8, d_ff=48,
                        num_heads=4, num_encoder_layers=1,
                        num_decoder_layers=1, mel_bins=512,
                        dropout_rate=0.0)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        dp = stack_decode_params(variables['params'], cfg)
        with pytest.raises(ValueError, match='bhdk'):
            greedy_loop_fast(cfg, dp, jnp.zeros((1, 256, 32)), 8,
                             kv_layout='bkhd', quantize='int8_kv')
