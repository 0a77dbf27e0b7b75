"""Whole-decoder megakernel (quantize='fused'): numerics and accuracy.

On CPU the kernel runs in interpreter mode — same math as the TPU, so
these tests pin the fused int8 quantization error and the flash-chunking
algebra independent of hardware.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mr_mt3_tpu.models import MT3, MT3Config
from mr_mt3_tpu.ops.decode import greedy_decode
from mr_mt3_tpu.ops.fast_decode import (
    decode_step_fast,
    init_cache_stacked,
    precompute_cross_kv_stacked,
    stack_decode_params,
)
from mr_mt3_tpu.ops.fused_decode import (
    fused_decode_step,
    init_fused_cache,
    pack_fused_params,
    precompute_cross_kv_fused,
)

SMALL_CFG = MT3Config(vocab_size=256, d_model=32, d_kv=8, d_ff=48,
                      num_heads=4, num_encoder_layers=1,
                      num_decoder_layers=2, mel_bins=16, dropout_rate=0.0)


def _small_setup(batch=2, max_len=16, seed=0):
    model = MT3(SMALL_CFG)
    rng = np.random.default_rng(seed)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32))
    dp = stack_decode_params(variables['params'], SMALL_CFG,
                             dtype=jnp.float32)
    fp = pack_fused_params(variables['params'], SMALL_CFG)
    enc = jnp.asarray(rng.normal(size=(batch, 8, 32)), jnp.float32)
    cross = precompute_cross_kv_fused(dp, SMALL_CFG, enc)
    cache = init_fused_cache(SMALL_CFG, batch, max_len)
    return model, variables, dp, fp, enc, cross, cache


class TestFusedStep:
    def test_matches_f32_path_within_quantization_error(self):
        """Two steps of the megakernel vs the fp32 XLA body: the only
        differences are int8 weight/KV quantization, so agreement is at
        the percent level on random N(0,1) weights."""
        model, variables, dp, fp, enc, cross, cache = _small_setup()
        ck = precompute_cross_kv_stacked(dp, SMALL_CFG, enc)
        c_ref = init_cache_stacked(SMALL_CFG, 2, 16, dtype=jnp.float32)
        toks = [jnp.array([3, 5], jnp.int32), jnp.array([7, 9], jnp.int32)]
        for step, t in enumerate(toks):
            got, cache = fused_decode_step(SMALL_CFG, fp, dp, t,
                                           jnp.int32(step), cache, cross,
                                           interpret=True)
            want, c_ref = decode_step_fast(SMALL_CFG, dp, t,
                                           jnp.int32(step), c_ref, ck)
            rel = float(jnp.abs(got - want).max() / jnp.abs(want).max())
            assert rel < 0.05, f'step {step}: rel err {rel}'

    def test_flash_chunking_is_exact(self):
        """The same step with the cache split into 2 chunks vs 1 chunk:
        online-softmax accumulation must be algebraically identical (the
        extra chunk is fully masked)."""
        model, variables, dp, fp, enc, cross, _ = _small_setup()
        # build two caches with identical contents at positions 0..2
        cache1 = init_fused_cache(SMALL_CFG, 2, 16)     # 1 chunk
        cache2 = init_fused_cache(SMALL_CFG, 2, 512)    # 2 chunks of 256
        rng = np.random.default_rng(3)
        for step in range(3):
            t = jnp.asarray(rng.integers(1, 200, size=(2,)), jnp.int32)
            l1, cache1 = fused_decode_step(SMALL_CFG, fp, dp, t,
                                           jnp.int32(step), cache1, cross,
                                           interpret=True)
            l2, cache2 = fused_decode_step(SMALL_CFG, fp, dp, t,
                                           jnp.int32(step), cache2, cross,
                                           interpret=True)
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=1e-5, atol=1e-5)

    def test_cache_length_validation(self):
        model, variables, dp, fp, enc, cross, _ = _small_setup()
        bad = init_fused_cache(SMALL_CFG, 2, 300)  # not a chunk multiple
        with pytest.raises(ValueError, match='multiple'):
            fused_decode_step(SMALL_CFG, fp, dp, jnp.zeros((2,), jnp.int32),
                              jnp.int32(0), bad, cross, interpret=True)

    def test_greedy_decode_fused_runs(self):
        model = MT3(SMALL_CFG)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mel = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 8, 16)), jnp.float32)
        toks = np.asarray(greedy_decode(model, variables, mel,
                                        max_length=12, quantize='fused'))
        assert toks.shape == (2, 13)
        assert (toks[:, 0] == 0).all()

    def test_large_batch_splits_into_groups(self):
        """Batches beyond the 8-row VMEM ceiling run as groups-of-8
        unrolled in one trace; tokens must equal per-group calls."""
        model = MT3(SMALL_CFG)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mel = jnp.asarray(np.random.default_rng(9).normal(
            size=(16, 8, 16)), jnp.float32)
        got = np.asarray(greedy_decode(model, variables, mel, max_length=8,
                                       quantize='fused'))
        assert got.shape == (16, 9)
        for s in (0, 8):
            part = np.asarray(greedy_decode(model, variables, mel[s:s + 8],
                                            max_length=8, quantize='fused'))
            np.testing.assert_array_equal(got[s:s + 8], part)

    def test_batch_beyond_compile_ceiling_rejected(self):
        """16-group (128-row) programs fail remote compile on v5e
        (PERF.md); the loop rejects >64-row calls with guidance."""
        model = MT3(SMALL_CFG)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mel = jnp.zeros((72, 8, 16))
        with pytest.raises(ValueError, match='at most 64'):
            greedy_decode(model, variables, mel, max_length=8,
                          quantize='fused')

    def test_handler_caps_fused_device_batch(self):
        """batch_size beyond the fused 64-row ceiling splits across
        device calls instead of failing."""
        from mr_mt3_tpu.infer import InferenceHandler
        model = MT3(SMALL_CFG.replace(mel_bins=512))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        handler = InferenceHandler(model=model, variables=variables,
                                   max_length=8, batch_size=100,
                                   quantize='fused')
        mel = np.random.default_rng(2).normal(
            size=(72, 256, 512)).astype(np.float32)
        tokens = handler._decode_all(mel)
        assert tokens.shape == (72, 9)

    def test_large_batch_with_padding_rows(self):
        """A non-multiple-of-8 oversized batch pads, groups, and slices
        back — the all-padding tail group exits immediately."""
        model = MT3(SMALL_CFG)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mel = jnp.asarray(np.random.default_rng(10).normal(
            size=(11, 8, 16)), jnp.float32)
        got = np.asarray(greedy_decode(model, variables, mel, max_length=8,
                                       quantize='fused'))
        assert got.shape == (11, 9)
        ref = np.asarray(greedy_decode(model, variables, mel[:8],
                                       max_length=8, quantize='fused'))
        np.testing.assert_array_equal(got[:8], ref)

    def test_odd_max_length_works(self):
        """max_length need not align to chunks or windows — the cache is
        rounded up internally and the output sliced."""
        model = MT3(SMALL_CFG)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mel = jnp.asarray(np.random.default_rng(5).normal(
            size=(1, 8, 16)), jnp.float32)
        toks = np.asarray(greedy_decode(model, variables, mel,
                                        max_length=13, quantize='fused'))
        assert toks.shape == (1, 14)
        ref = np.asarray(greedy_decode(model, variables, mel,
                                       max_length=16, quantize='fused'))
        np.testing.assert_array_equal(toks, ref[:, :14])


class TestFusedWindow:
    def test_window_cache_matches_per_step(self):
        """The windows' int8 cache rows must be bit-identical to the
        per-step kernel's (same quantize_rows on the same K/V values) —
        cache state is what propagates across the decode, so this pins the
        handoff even though in-window ATTENTION numerics intentionally
        differ (bf16 scratch rows vs int8 cache rows; see the accuracy
        test below for token-level agreement on a confident model)."""
        from mr_mt3_tpu.ops.fused_decode import fused_decode_window
        model, variables, dp, fp, enc, cross, _ = _small_setup()
        cache = init_fused_cache(SMALL_CFG, 2, 16)
        # teacher-force the SAME token sequence through both kernels so
        # cache rows are comparable regardless of argmax differences
        forced = np.random.default_rng(7).integers(1, 200, size=(2, 16))
        for step in range(16):
            _, cache = fused_decode_step(SMALL_CFG, fp, dp,
                                         jnp.asarray(forced[:, step],
                                                     jnp.int32),
                                         jnp.int32(step), cache, cross,
                                         interpret=True)
        cache2 = init_fused_cache(SMALL_CFG, 2, 16)
        # windows pick their own argmax tokens; force alignment by running
        # window steps one at a time with the forced token as input
        for step in range(16):
            _, _, cache2 = fused_decode_window(
                SMALL_CFG, fp, dp, jnp.asarray(forced[:, step], jnp.int32),
                jnp.zeros((2,), bool), jnp.int32(step), cache2, cross,
                t_window=1, interpret=True)
        # codes may differ by an LSB or two: the window embeds via a bf16
        # one-hot matmul while the per-step path gathers f32 rows — compare
        # DEQUANTIZED values at quantization-noise tolerance
        for kq_key, ks_key in (('kq', 'ks'), ('vq', 'vs')):
            d1 = (np.asarray(cache[kq_key], np.float32)
                  * np.asarray(cache[ks_key])[..., None, :])
            d2 = (np.asarray(cache2[kq_key], np.float32)
                  * np.asarray(cache2[ks_key])[..., None, :])
            scale = np.abs(d1).max()
            assert np.abs(d1 - d2).max() < 0.05 * scale, kq_key

    def test_window_matches_per_step_on_confident_model(self):
        """On the overfit parity model (top-2 logit margins ~2.0) the
        window and per-step kernels must agree token-for-token — the
        in-window bf16-scratch attention differs from the per-step int8
        cache rows only at quantization-noise level, far below the
        margin. (On random weights with near-uniform logits the two can
        legitimately pick different argmaxes.)"""
        golden = os.path.join(os.path.dirname(__file__), 'goldens',
                              'parity_vanilla.npz')
        if not os.path.exists(golden):
            pytest.skip('parity goldens missing')
        from tests.parity_common import (
            VANILLA_CFG,
            load_golden,
            parity_corpus,
        )
        from mr_mt3_tpu.ops.fast_decode import stack_decode_params
        from mr_mt3_tpu.ops.fused_decode import (
            fused_decode_window,
            pack_fused_params,
            precompute_cross_kv_fused,
        )
        from mr_mt3_tpu.infer import InferenceHandler
        from mr_mt3_tpu.models.mt3 import MT3 as MT3Model
        params, _ = load_golden('parity_vanilla.npz')
        dp = stack_decode_params(params, VANILLA_CFG, dtype=jnp.float32)
        fp = pack_fused_params(params, VANILLA_CFG)
        # the model is only CONFIDENT on its trained corpus — random
        # encoder states give near-uniform logits where the two kernels'
        # (intentionally different) in-window numerics may argmax apart
        model = MT3Model(VANILLA_CFG)
        audios, _ = parity_corpus()
        handler = InferenceHandler(model=model, variables={'params': params},
                                   max_length=16, batch_size=4)
        segments, _, valid = handler._audio_to_segments(audios[0])
        mel = handler._compute_mel(segments, valid)[:2]
        enc_raw = model.apply({'params': params}, jnp.asarray(mel),
                              method=MT3Model.encode_audio)
        cross = precompute_cross_kv_fused(dp, VANILLA_CFG, enc_raw)

        cache = init_fused_cache(VANILLA_CFG, 2, 16)
        toks = jnp.zeros((2,), jnp.int32)
        seq = [toks]
        for step in range(16):
            logits, cache = fused_decode_step(VANILLA_CFG, fp, dp, seq[-1],
                                              jnp.int32(step), cache, cross,
                                              interpret=True)
            seq.append(jnp.argmax(logits, -1).astype(jnp.int32))
        ref = np.stack([np.asarray(s) for s in seq[1:]], axis=1)

        cache2 = init_fused_cache(VANILLA_CFG, 2, 16)
        w1, f1, cache2 = fused_decode_window(
            VANILLA_CFG, fp, dp, jnp.zeros((2,), jnp.int32),
            jnp.zeros((2,), bool), jnp.int32(0), cache2, cross,
            t_window=8, interpret=True)
        w2, f2, cache2 = fused_decode_window(
            VANILLA_CFG, fp, dp, w1[:, -1], f1, jnp.int32(8), cache2,
            cross, t_window=8, interpret=True)
        win = np.concatenate([np.asarray(w1), np.asarray(w2)], axis=1)
        np.testing.assert_array_equal(ref, win)

    def test_window_finished_masking(self):
        """A row finishing mid-window pads the rest of the window and the
        finished flag propagates out."""
        from mr_mt3_tpu.ops.fused_decode import fused_decode_window
        model, variables, dp, fp, enc, cross, _ = _small_setup()
        cache = init_fused_cache(SMALL_CFG, 2, 16)
        # start with row 1 already finished: it must emit only pads
        w, fin, _ = fused_decode_window(
            SMALL_CFG, fp, dp, jnp.zeros((2,), jnp.int32),
            jnp.array([False, True]), jnp.int32(0), cache, cross,
            t_window=8, interpret=True)
        assert (np.asarray(w)[1] == SMALL_CFG.pad_token_id).all()
        assert bool(fin[1])


class TestGroupedKernel:
    """Group-axis window kernel (fused_decode_window_grouped): G groups of
    8 on a grid axis so the layer weights stream once per (token, layer)
    instead of once per group."""

    def _grouped_setup(self, batch=16, max_len=16):
        from benchmarks.group_axis_kernel import (
            init_fused_cache_grouped,
            regroup_cross_kv,
        )
        model, variables, dp, fp, enc, cross, _ = _small_setup(
            batch=batch, max_len=max_len)
        n_groups = batch // 8
        cache = init_fused_cache_grouped(SMALL_CFG, n_groups, max_len)
        cross_g = regroup_cross_kv(cross, n_groups)
        return dp, fp, cross, cross_g, cache, n_groups

    def test_regroup_cross_kv_layout(self):
        """regroup_cross_kv: (L, H, B, ...) -> (L*G + g) leading axis with
        the group's 8 rows in batch position."""
        from benchmarks.group_axis_kernel import regroup_cross_kv
        _, _, dp, fp, enc, cross, _ = _small_setup(batch=16)
        out = regroup_cross_kv(cross, 2)
        L = SMALL_CFG.num_decoder_layers
        src = np.asarray(cross['ckq'])     # (L, H, 16, dk, Lenc)
        dst = np.asarray(out['ckq'])       # (L*2, H, 8, dk, Lenc)
        for i in range(L):
            for g in range(2):
                np.testing.assert_array_equal(
                    dst[i * 2 + g], src[i, :, g * 8:(g + 1) * 8])

    def test_grouped_kernel_rejects_non_int8_params(self):
        """The group-axis kernel writes an int8 KV cache unconditionally
        (it was only ever built for the int8 tier — PERF.md records the
        design as a negative result); bf16/int4 FusedParams must fail
        loudly instead of decoding silently wrong."""
        from benchmarks.group_axis_kernel import fused_decode_window_grouped
        dp, fp, cross, cross_g, cache, n_groups = self._grouped_setup()
        fp_bf16 = fp._replace(wqkv=fp.wqkv.astype(jnp.bfloat16))
        with pytest.raises(NotImplementedError, match='int8'):
            fused_decode_window_grouped(
                SMALL_CFG, fp_bf16, dp,
                jnp.zeros((n_groups * 8,), jnp.int32),
                jnp.zeros((n_groups * 8,), bool), jnp.int32(0),
                cache, cross_g, t_window=8, interpret=True)

    def test_grouped_cache_matches_per_step(self):
        """Teacher-forced grouped cache rows must match the per-step
        kernel's at quantization-noise level (the grouped kernel keeps its
        window rows int8 — same codes the cache receives)."""
        from benchmarks.group_axis_kernel import fused_decode_window_grouped
        dp, fp, cross, cross_g, cache_g, n_groups = self._grouped_setup()
        cache_ref = init_fused_cache(SMALL_CFG, 16, 16)
        forced = np.random.default_rng(7).integers(1, 200, size=(16, 8))
        for step in range(8):
            t = jnp.asarray(forced[:, step], jnp.int32)
            _, cache_ref = fused_decode_step(
                SMALL_CFG, fp, dp, t, jnp.int32(step), cache_ref, cross,
                interpret=True)
            _, _, cache_g = fused_decode_window_grouped(
                SMALL_CFG, fp, dp, t, jnp.zeros((16,), bool),
                jnp.int32(step), cache_g, cross_g, t_window=1,
                interpret=True)
        L, H = SMALL_CFG.num_decoder_layers, SMALL_CFG.num_heads
        dk = SMALL_CFG.d_kv
        for kq_key, ks_key in (('kq', 'ks'), ('vq', 'vs')):
            d_ref = (np.asarray(cache_ref[kq_key], np.float32)
                     * np.asarray(cache_ref[ks_key])[..., None, :])
            d_g = (np.asarray(cache_g[kq_key], np.float32)
                   * np.asarray(cache_g[ks_key])[..., None, :])
            # grouped layout (L*G, H, 8, ...) -> (L, H, 16, ...)
            d_g = d_g.reshape((L, 2, H, 8, dk, 16))
            d_g = np.moveaxis(d_g, 1, 2).reshape((L, H, 16, dk, 16))
            scale = np.abs(d_ref).max()
            assert np.abs(d_ref - d_g).max() < 0.05 * scale, kq_key

    def test_grouped_matches_window_on_confident_model(self):
        """On the overfit parity model the grouped kernel must agree
        token-for-token with the proven window kernel (margins ~2.0 dwarf
        the int8-vs-bf16 window-row difference)."""
        golden = os.path.join(os.path.dirname(__file__), 'goldens',
                              'parity_vanilla.npz')
        if not os.path.exists(golden):
            pytest.skip('parity goldens missing')
        from tests.parity_common import (
            VANILLA_CFG,
            load_golden,
            parity_corpus,
        )
        from mr_mt3_tpu.infer import InferenceHandler
        from mr_mt3_tpu.models.mt3 import MT3 as MT3Model
        from benchmarks.group_axis_kernel import (
            fused_decode_window_grouped,
            init_fused_cache_grouped,
            regroup_cross_kv,
        )
        from mr_mt3_tpu.ops.fused_decode import fused_decode_window
        params, _ = load_golden('parity_vanilla.npz')
        dp = stack_decode_params(params, VANILLA_CFG, dtype=jnp.float32)
        fp = pack_fused_params(params, VANILLA_CFG)
        model = MT3Model(VANILLA_CFG)
        audios, _ = parity_corpus()
        handler = InferenceHandler(model=model, variables={'params': params},
                                   max_length=16, batch_size=4)
        segments, _, valid = handler._audio_to_segments(audios[0])
        mel = handler._compute_mel(segments, valid)[:2]
        enc2 = model.apply({'params': params}, jnp.asarray(mel),
                           method=MT3Model.encode_audio)
        # tile the 2 confident rows to 16 = 2 groups of 8
        enc = jnp.tile(enc2, (8, 1, 1))
        cross = precompute_cross_kv_fused(dp, VANILLA_CFG, enc)

        ref_rows = []
        for s in (0, 8):
            crossg = {k: v[:, :, s:s + 8] for k, v in cross.items()}
            w1, f1, c = fused_decode_window(
                VANILLA_CFG, fp, dp, jnp.zeros((8,), jnp.int32),
                jnp.zeros((8,), bool), jnp.int32(0),
                init_fused_cache(VANILLA_CFG, 8, 16), crossg,
                t_window=8, interpret=True)
            w2, _, _ = fused_decode_window(
                VANILLA_CFG, fp, dp, w1[:, -1], f1, jnp.int32(8), c,
                crossg, t_window=8, interpret=True)
            ref_rows.append(np.concatenate([np.asarray(w1), np.asarray(w2)],
                                           axis=1))
        ref = np.concatenate(ref_rows)

        cache = init_fused_cache_grouped(VANILLA_CFG, 2, 16)
        cross_g = regroup_cross_kv(cross, 2)
        g1, f1, cache = fused_decode_window_grouped(
            VANILLA_CFG, fp, dp, jnp.zeros((16,), jnp.int32),
            jnp.zeros((16,), bool), jnp.int32(0), cache, cross_g,
            t_window=8, interpret=True)
        g2, _, _ = fused_decode_window_grouped(
            VANILLA_CFG, fp, dp, g1[:, -1], f1, jnp.int32(8), cache,
            cross_g, t_window=8, interpret=True)
        got = np.concatenate([np.asarray(g1), np.asarray(g2)], axis=1)
        np.testing.assert_array_equal(ref, got)

    def test_grouped_finished_masking(self):
        """Rows already finished emit only pads; the flag propagates."""
        from benchmarks.group_axis_kernel import fused_decode_window_grouped
        dp, fp, cross, cross_g, cache, n_groups = self._grouped_setup()
        fin0 = np.zeros((16,), bool)
        fin0[3] = True   # group 0
        fin0[12] = True  # group 1
        w, fin, _ = fused_decode_window_grouped(
            SMALL_CFG, fp, dp, jnp.zeros((16,), jnp.int32),
            jnp.asarray(fin0), jnp.int32(0), cache, cross_g,
            t_window=4, interpret=True)
        w = np.asarray(w)
        assert (w[3] == SMALL_CFG.pad_token_id).all()
        assert (w[12] == SMALL_CFG.pad_token_id).all()
        assert bool(fin[3]) and bool(fin[12])


class TestFusedHandlerBatching:
    def test_segmem_chained_splits_into_device_groups(self):
        """Long audio on a segmem model in fused mode produces more chains
        than the 8-row device cap — the handler must split them into
        groups instead of crashing (the pre-fix behavior)."""
        from mr_mt3_tpu.infer import InferenceHandler
        scfg = SMALL_CFG.replace(segmem_variant='encoder_append',
                                 segmem_length=4)
        model = MT3(scfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
            decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
            targets_prev=jnp.zeros((1, 4), jnp.int32))
        handler = InferenceHandler(model=model, variables=variables,
                                   max_length=8, batch_size=2,
                                   quantize='fused')
        rng = np.random.default_rng(0)
        # 20 segments / chains of 2 -> 10 chains -> 2 device groups of 8
        mel = rng.normal(size=(20, 8, scfg.mel_bins)).astype(np.float32)
        tokens = handler._decode_all(mel)
        assert tokens.shape == (20, 9)
        # and the grouped result matches an ungrouped bf16-path reference
        # shape-wise (token values differ by quantization)
        ref = InferenceHandler(model=model, variables=variables,
                               max_length=8,
                               batch_size=2)._decode_all(mel)
        assert ref.shape == tokens.shape

    def test_lockstep_songs_split_into_device_groups(self):
        """transcribe_many in contiguous fused mode groups songs by 8."""
        from mr_mt3_tpu.infer import InferenceHandler
        # real mel frontend -> the model needs the full 512 mel bins
        scfg = SMALL_CFG.replace(segmem_variant='encoder_append',
                                 segmem_length=4, mel_bins=512)
        model = MT3(scfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 512)),
            decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
            targets_prev=jnp.zeros((1, 4), jnp.int32))
        handler = InferenceHandler(model=model, variables=variables,
                                   max_length=8, batch_size=2,
                                   contiguous_inference=True,
                                   quantize='fused')
        rng = np.random.default_rng(1)
        audios = [rng.normal(size=(256 * 128,)).astype(np.float32) * 0.05
                  for _ in range(9)]  # 9 songs > the 8-song device cap
        results = handler.transcribe_many(audios)
        assert len(results) == 9


class TestFusedProductionScale:
    @pytest.mark.slow
    def test_fused_step_matches_f32_at_46m_dims(self):
        """The megakernel at the PRODUCTION dimensions (d_model 512, 8+8
        layers, 6 heads, vocab 1536 — reference models/t5.py:37-72):
        int8 weight+KV quantization error vs the fp32 XLA body stays at
        the percent level, pinning the kernel's numerics at real scale
        (the other tests only cover d_model 32/96)."""
        from tests.parity_common import FULL_CFG, full_scale_params
        model, params = full_scale_params()
        dp = stack_decode_params(params, FULL_CFG, dtype=jnp.float32)
        fp = pack_fused_params(params, FULL_CFG)
        rng = np.random.default_rng(0)
        enc = jnp.asarray(rng.normal(size=(2, 256, 512)) * 0.5, jnp.float32)
        cross = precompute_cross_kv_fused(dp, FULL_CFG, enc)
        cache = init_fused_cache(FULL_CFG, 2, 256)
        ck = precompute_cross_kv_stacked(dp, FULL_CFG, enc)
        c_ref = init_cache_stacked(FULL_CFG, 2, 256, dtype=jnp.float32)
        fp_x = pack_fused_params(params, FULL_CFG, exact=True)
        cross_x = precompute_cross_kv_fused(dp, FULL_CFG, enc, exact=True)
        cache_x = init_fused_cache(FULL_CFG, 2, 256, exact=True)
        fp_4 = pack_fused_params(params, FULL_CFG, wbits=4)
        cross_4 = precompute_cross_kv_fused(dp, FULL_CFG, enc, qmax=7)
        cache_4 = init_fused_cache(FULL_CFG, 2, 256, kv_dtype=jnp.int4)
        toks = [jnp.array([3, 900], jnp.int32), jnp.array([1100, 7],
                                                          jnp.int32)]
        for step, t in enumerate(toks):
            got, cache = fused_decode_step(FULL_CFG, fp, dp, t,
                                           jnp.int32(step), cache, cross,
                                           interpret=True)
            got_x, cache_x = fused_decode_step(FULL_CFG, fp_x, dp, t,
                                               jnp.int32(step), cache_x,
                                               cross_x, interpret=True)
            got_4, cache_4 = fused_decode_step(FULL_CFG, fp_4, dp, t,
                                               jnp.int32(step), cache_4,
                                               cross_4, interpret=True)
            want, c_ref = decode_step_fast(FULL_CFG, dp, t,
                                           jnp.int32(step), c_ref, ck)
            scale = float(jnp.abs(want).max())
            rel = float(jnp.abs(got - want).max()) / scale
            assert rel < 0.05, f'step {step}: rel err {rel}'
            # the unquantized (fused_bf16) tier at production dims: pure
            # bf16 rounding, an order of magnitude under the int8 error
            rel_x = float(jnp.abs(got_x - want).max()) / scale
            assert rel_x < 0.01, f'step {step}: bf16 rel err {rel_x}'
            assert rel_x < rel, f'step {step}: bf16 not tighter than int8'
            # the int4 serving default at production dims: bounded by the
            # ~18x-coarser grid, ordered between int8 and nonsense
            rel_4 = float(jnp.abs(got_4 - want).max()) / scale
            assert rel_4 < 0.6, f'step {step}: int4 rel err {rel_4}'
            assert rel_4 > rel, f'step {step}: int4 tighter than int8?'


class TestFusedBf16:
    """quantize='fused_bf16': the megakernel unquantized (bf16 weights/KV,
    f32 accumulation) — the probe ladder's middle tier."""

    def test_step_much_tighter_than_int8(self):
        """The exact kernel's error vs the fp32 XLA body is pure bf16
        rounding — an order of magnitude below the int8 kernel's
        quantization error on the same inputs."""
        model, variables, dp, fp_i8, enc, cross_i8, cache_i8 = _small_setup()
        fp = pack_fused_params(variables['params'], SMALL_CFG, exact=True)
        cross = precompute_cross_kv_fused(dp, SMALL_CFG, enc, exact=True)
        cache = init_fused_cache(SMALL_CFG, 2, 16, exact=True)
        assert fp.wqkv.dtype == jnp.bfloat16
        assert cache['kq'].dtype == jnp.bfloat16
        ck = precompute_cross_kv_stacked(dp, SMALL_CFG, enc)
        c_ref = init_cache_stacked(SMALL_CFG, 2, 16, dtype=jnp.float32)
        toks = [jnp.array([3, 5], jnp.int32), jnp.array([7, 9], jnp.int32)]
        for step, t in enumerate(toks):
            got, cache = fused_decode_step(SMALL_CFG, fp, dp, t,
                                           jnp.int32(step), cache, cross,
                                           interpret=True)
            got_i8, cache_i8 = fused_decode_step(SMALL_CFG, fp_i8, dp, t,
                                                 jnp.int32(step), cache_i8,
                                                 cross_i8, interpret=True)
            want, c_ref = decode_step_fast(SMALL_CFG, dp, t,
                                           jnp.int32(step), c_ref, ck)
            scale = float(jnp.abs(want).max())
            rel = float(jnp.abs(got - want).max()) / scale
            rel_i8 = float(jnp.abs(got_i8 - want).max()) / scale
            assert rel < 0.01, f'step {step}: bf16 rel err {rel}'
            assert rel < rel_i8, \
                f'step {step}: bf16 ({rel}) not tighter than int8 ({rel_i8})'

    def test_greedy_decode_fused_bf16_runs(self):
        model = MT3(SMALL_CFG)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mel = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 8, 16)), jnp.float32)
        toks = np.asarray(greedy_decode(model, variables, mel,
                                        max_length=12,
                                        quantize='fused_bf16'))
        assert toks.shape == (2, 13)
        assert (toks[:, 0] == 0).all()

    def test_segmem_chained_runs_fused_bf16(self):
        """The ladder can demote a segmem serving handler to fused_bf16;
        the chained decode path must run under it (same shapes/caps as
        'fused', bf16 cache plumbing throughout)."""
        from mr_mt3_tpu.infer import InferenceHandler
        scfg = SMALL_CFG.replace(segmem_variant='encoder_append',
                                 segmem_length=4)
        model = MT3(scfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
            decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
            targets_prev=jnp.zeros((1, 4), jnp.int32))
        handler = InferenceHandler(model=model, variables=variables,
                                   max_length=8, batch_size=2,
                                   quantize='fused_bf16')
        rng = np.random.default_rng(0)
        mel = rng.normal(size=(6, 8, scfg.mel_bins)).astype(np.float32)
        tokens = handler._decode_all(mel)
        assert tokens.shape == (6, 9)

    @pytest.mark.skipif(
        not os.path.exists(os.path.join(os.path.dirname(__file__),
                                        'goldens', 'parity_vanilla.npz')),
        reason='parity goldens missing')
    def test_fused_bf16_zero_flips_on_parity_model(self):
        """The unquantized megakernel on the overfit parity model must be
        token-identical to the golden (same gate as 'fused', but here any
        flip would indicate a kernel-math bug, not quantization)."""
        from tests.parity_common import (
            VANILLA_CFG,
            load_golden,
            parity_corpus,
        )
        from mr_mt3_tpu.infer import InferenceHandler
        params, meta = load_golden('parity_vanilla.npz')
        model = MT3(VANILLA_CFG)
        audios, _ = parity_corpus()
        handler = InferenceHandler(model=model, variables={'params': params},
                                   max_length=int(meta['max_length']),
                                   batch_size=4, quantize='fused_bf16')
        segments, _, valid = handler._audio_to_segments(audios[0])
        mel = handler._compute_mel(segments, valid)
        tokens = handler._decode_all(mel)
        golden = np.asarray(meta['tokens'][0])
        flips = int((tokens != golden).sum())
        assert flips == 0, \
            f'{flips}/{golden.size} tokens flipped under fused_bf16'


class TestFusedInt4:
    """quantize='fused_int4': int4 weights + int4 KV — halves the HBM
    bytes of the bandwidth-saturated megakernel (PERF.md roofline)."""

    def test_step_bounded_vs_int8(self):
        """int4's step error is bounded: larger than int8's (coarser
        codes) but the same order — the quantization grid is 18x coarser,
        not broken."""
        model, variables, dp, fp_i8, enc, cross_i8, cache_i8 = _small_setup()
        fp = pack_fused_params(variables['params'], SMALL_CFG, wbits=4)
        assert fp.wqkv.dtype == jnp.int4
        cross = precompute_cross_kv_fused(dp, SMALL_CFG, enc, qmax=7)
        cache = init_fused_cache(SMALL_CFG, 2, 16, kv_dtype=jnp.int4)
        ck = precompute_cross_kv_stacked(dp, SMALL_CFG, enc)
        c_ref = init_cache_stacked(SMALL_CFG, 2, 16, dtype=jnp.float32)
        toks = [jnp.array([3, 5], jnp.int32), jnp.array([7, 9], jnp.int32)]
        for step, t in enumerate(toks):
            got, cache = fused_decode_step(SMALL_CFG, fp, dp, t,
                                           jnp.int32(step), cache, cross,
                                           interpret=True)
            got_i8, cache_i8 = fused_decode_step(SMALL_CFG, fp_i8, dp, t,
                                                 jnp.int32(step), cache_i8,
                                                 cross_i8, interpret=True)
            want, c_ref = decode_step_fast(SMALL_CFG, dp, t,
                                           jnp.int32(step), c_ref, ck)
            scale = float(jnp.abs(want).max())
            rel = float(jnp.abs(got - want).max()) / scale
            rel_i8 = float(jnp.abs(got_i8 - want).max()) / scale
            assert rel < 0.6, f'step {step}: int4 rel err {rel}'
            assert rel > rel_i8, \
                f'step {step}: int4 ({rel}) unexpectedly tighter than int8'

    def test_greedy_decode_fused_int4_runs(self):
        model = MT3(SMALL_CFG)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mel = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 8, 16)), jnp.float32)
        toks = np.asarray(greedy_decode(model, variables, mel,
                                        max_length=12,
                                        quantize='fused_int4'))
        assert toks.shape == (2, 13)
        assert (toks[:, 0] == 0).all()

    @pytest.mark.skipif(
        not os.path.exists(os.path.join(os.path.dirname(__file__),
                                        'goldens', 'parity_vanilla.npz')),
        reason='parity goldens missing')
    def test_fused_int4_zero_flips_on_parity_model(self):
        """int4 weights + int4 KV still clear the overfit parity model's
        ~2.0 decode margin — zero flips (real checkpoints with thinner
        margins may flip; the probe ladder guards them)."""
        from tests.parity_common import (
            VANILLA_CFG,
            load_golden,
            parity_corpus,
        )
        from mr_mt3_tpu.infer import InferenceHandler
        params, meta = load_golden('parity_vanilla.npz')
        model = MT3(VANILLA_CFG)
        audios, _ = parity_corpus()
        handler = InferenceHandler(model=model, variables={'params': params},
                                   max_length=int(meta['max_length']),
                                   batch_size=4, quantize='fused_int4')
        segments, _, valid = handler._audio_to_segments(audios[0])
        mel = handler._compute_mel(segments, valid)
        tokens = handler._decode_all(mel)
        golden = np.asarray(meta['tokens'][0])
        flips = int((tokens != golden).sum())
        assert flips == 0, \
            f'{flips}/{golden.size} tokens flipped under fused_int4'

    @pytest.mark.skipif(
        not os.path.exists(os.path.join(os.path.dirname(__file__),
                                        'goldens', 'parity_withprev.npz')),
        reason='parity goldens missing')
    def test_fused_int4_zero_flips_on_withprev_lockstep(self):
        """The FLAGSHIP path under the serving default: segmem
        with-prev contiguous lockstep decode at int4 stays
        token-identical to the frozen golden."""
        from tests.parity_common import (
            WITHPREV_CFG,
            load_golden,
            parity_corpus,
        )
        from mr_mt3_tpu.infer import InferenceHandler
        params, meta = load_golden('parity_withprev.npz')
        model = MT3(WITHPREV_CFG)
        audios, _ = parity_corpus()
        handler = InferenceHandler(model=model, variables={'params': params},
                                   max_length=int(meta['max_length']),
                                   contiguous_inference=True,
                                   segment_bucket=1,
                                   quantize='fused_int4')
        audio, golden = audios[0], np.asarray(meta['tokens'][0])
        segments, _, valid = handler._audio_to_segments(audio)
        mel = handler._compute_mel(segments, valid)
        tokens = handler._decode_all(mel)
        flips = int((tokens != golden).sum())
        assert flips == 0, \
            f'{flips}/{golden.size} lockstep tokens flipped under int4'


class TestFusedAccuracy:
    @pytest.mark.skipif(
        not os.path.exists(os.path.join(os.path.dirname(__file__),
                                        'goldens', 'parity_vanilla.npz')),
        reason='parity goldens missing')
    def test_fused_token_flip_rate_on_parity_model(self):
        """The megakernel on the overfit parity model: int8 weights + int8
        KV together must still clear the ~2.0 decode margin — zero flips
        (mirrors the 'int8' and 'int8_kv' gates in test_int8_decode.py)."""
        from tests.parity_common import (
            VANILLA_CFG,
            load_golden,
            parity_corpus,
        )
        from mr_mt3_tpu.infer import InferenceHandler
        params, meta = load_golden('parity_vanilla.npz')
        model = MT3(VANILLA_CFG)
        audios, _ = parity_corpus()
        handler = InferenceHandler(model=model, variables={'params': params},
                                   max_length=int(meta['max_length']),
                                   batch_size=4, quantize='fused')
        segments, _, valid = handler._audio_to_segments(audios[0])
        mel = handler._compute_mel(segments, valid)
        tokens = handler._decode_all(mel)
        golden = np.asarray(meta['tokens'][0])
        flips = int((tokens != golden).sum())
        assert flips == 0, f'{flips}/{golden.size} tokens flipped under fused'
