"""Tests for the InferenceHandler plumbing (random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mr_mt3_tpu.codec import DECODED_EOS_ID
from mr_mt3_tpu.infer import InferenceHandler
from mr_mt3_tpu.midi import midi_file_to_note_sequence
from mr_mt3_tpu.models import MT3, MT3Config

SMALL = MT3Config(vocab_size=1536, d_model=32, d_kv=8, d_ff=48, num_heads=4,
                  num_encoder_layers=1, num_decoder_layers=1, mel_bins=512,
                  dropout_rate=0.0)


@pytest.fixture(scope='module')
def handler():
    model = MT3(SMALL)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 512)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32))
    return InferenceHandler(model=model, variables=variables,
                            max_length=16, batch_size=4)


class TestPreprocess:
    def test_segmentation(self, handler):
        audio = np.random.default_rng(0).normal(
            size=int(16000 * 4.5)).astype(np.float32)
        segments, seg_times, valid = handler._audio_to_segments(audio)
        # 4.5 s = 562.5 frames -> 563 frames -> 3 segments
        assert segments.shape == (3, 256 * 128)
        assert seg_times.shape == (3, 256)
        assert valid == [256, 256, 51]
        assert seg_times[1][0] == pytest.approx(256 / 125.0)
        # padded tail of last segment is zero
        assert (segments[2, 51 * 128:] == 0).all()

    def test_mel_norm_flag(self, handler):
        audio = np.sin(np.arange(16000) / 16000 * 2 * np.pi * 440
                       ).astype(np.float32)
        segments, _, valid = handler._audio_to_segments(audio)
        handler.mel_norm = True
        mel_norm = handler._compute_mel(segments, valid)
        handler.mel_norm = False
        mel_raw = handler._compute_mel(segments, valid)
        handler.mel_norm = True
        assert mel_norm.min() >= 0.0 and mel_norm.max() <= 1.0
        assert mel_raw.min() < -1.0  # raw log-mel


class TestPostprocess:
    def test_eos_trim_and_offset(self, handler):
        # model tokens: [BOS, t, t, EOS, pad, pad]
        tokens = np.array([[0, 1064, 10, 1, 0, 0]])
        out = handler._postprocess(tokens)
        # BOS dropped, -3 offset, EOS and after -> -1
        np.testing.assert_array_equal(out, [[1061, 7, -1, -1, -1]])

    def test_no_eos_gives_empty_prediction(self, handler):
        """Reference quirk: np.argmax on all-False is 0 -> empty tokens."""
        tokens = np.array([[0, 1064, 10, 20, 30, 40]])
        out = handler._postprocess(tokens)
        seg_times = np.zeros((1, 256))
        ns = handler._to_note_sequence(out, seg_times)
        assert len(ns.notes) == 0

    def test_start_time_snapped(self, handler):
        tokens = np.array([[1061, DECODED_EOS_ID]])
        seg_times = np.zeros((1, 256))
        seg_times[0, 0] = 2.0485  # snaps down to 2.04
        preds_ns = handler._to_note_sequence(tokens, seg_times)
        assert preds_ns is not None


class TestEndToEnd:
    def test_transcribe_and_write(self, handler, tmp_path):
        audio = np.random.default_rng(1).normal(
            size=16000 * 3).astype(np.float32) * 0.1
        out = tmp_path / 'sub' / 'mix.mid'
        ns = handler.inference(audio, audio_path='x.wav', outpath=str(out))
        assert out.exists()
        back = midi_file_to_note_sequence(out)
        assert isinstance(back.notes, list)

    def test_batch_padding_consistency(self, handler):
        """Last partial batch is padded; outputs must match unpadded run."""
        audio = np.random.default_rng(2).normal(
            size=int(16000 * 10.3)).astype(np.float32) * 0.1
        segments, seg_times, valid = handler._audio_to_segments(audio)
        mel = handler._compute_mel(segments, valid)
        tokens_all = handler._decode_all(mel)  # 7 segments, batch 4
        assert tokens_all.shape[0] == mel.shape[0]
        # decode first 4 alone -> identical rows
        tokens_4 = handler._decode_all(mel[:4])
        np.testing.assert_array_equal(tokens_all[:4], tokens_4)

    def test_contiguous_segmem_mode(self, tmp_path):
        cfg = SMALL.replace(segmem_variant='encoder_append', segmem_length=8)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(3),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
                               targets_prev=jnp.zeros((1, 4), jnp.int32))
        handler = InferenceHandler(model=model, variables=variables,
                                   max_length=12, contiguous_inference=True,
                                   segment_bucket=4)
        audio = np.random.default_rng(4).normal(
            size=16000 * 5).astype(np.float32) * 0.1
        out = tmp_path / 'seg.mid'
        ns = handler.inference(audio, outpath=str(out))
        assert out.exists()

    def test_get_program_ids(self, handler):
        ids = handler._get_program_ids(valid_programs=[0, 1])
        # 127 total programs - 2 valid (range excludes the final id, as in
        # the reference where total = max - min)
        assert len(ids) == 125
        assert ids[0] == [1132 + 2 + 3]


class TestTranscribeMany:
    def test_matches_per_song(self, handler):
        rng = np.random.default_rng(7)
        audios = [rng.normal(size=16000 * 3).astype(np.float32) * 0.1,
                  rng.normal(size=int(16000 * 4.6)).astype(np.float32) * 0.1]
        singles = [handler.transcribe(a) for a in audios]
        batched = handler.transcribe_many(audios)
        for s, b in zip(singles, batched):
            assert len(s.notes) == len(b.notes)
            for ns_a, ns_b in zip(s.notes, b.notes):
                assert ns_a == ns_b

    def test_contiguous_lockstep_matches_single(self):
        cfg = SMALL.replace(segmem_variant='encoder_append', segmem_length=8)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(3),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
                               targets_prev=jnp.zeros((1, 4), jnp.int32))
        h = InferenceHandler(model=model, variables=variables,
                             max_length=12, contiguous_inference=True,
                             segment_bucket=2)
        rng = np.random.default_rng(8)
        audios = [rng.normal(size=16000 * 3).astype(np.float32) * 0.1,
                  rng.normal(size=16000 * 5).astype(np.float32) * 0.1]
        singles = [h.transcribe(a) for a in audios]
        batched = h.transcribe_many(audios)
        for s, b in zip(singles, batched):
            assert len(s.notes) == len(b.notes)


def _segmem_handler(max_length=12, batch_size=2, **kwargs):
    cfg = SMALL.replace(segmem_variant='encoder_append', segmem_length=8)
    model = MT3(cfg)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 256, 512)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
                           targets_prev=jnp.zeros((1, 4), jnp.int32))
    return InferenceHandler(model=model, variables=variables,
                            max_length=max_length, batch_size=batch_size,
                            **kwargs)


class TestNonContiguousSegmemChain:
    """Reference v2/with-prev generate() chains segment memory across the
    rows of every decode batch even when contiguous_inference=False
    (reference: models/t5_segmem_v2.py:169-233,
    t5_segmem_v2_with_prev.py:226-297): each batch is a fresh sequential
    chain. The handler must reproduce that, not fall back to memory-less
    greedy decode."""

    def test_matches_per_chunk_sequential_decode(self):
        from mr_mt3_tpu.ops.decode import segmem_greedy_decode
        h = _segmem_handler(batch_size=2)
        rng = np.random.default_rng(11)
        mel = rng.normal(size=(5, 256, 512)).astype(np.float32) * 0.5
        got = h._decode_all(mel)
        assert got.shape[0] == 5
        # oracle: decode each batch_size-chunk as its own fresh chain
        expect = []
        for start in (0, 2, 4):
            chunk = mel[start:start + 2]
            toks = np.asarray(segmem_greedy_decode(
                h.model, h.variables, jnp.asarray(chunk[None]),
                max_length=h.max_length))[0]
            expect.append(toks)
        expect = np.concatenate(expect)[:5]
        np.testing.assert_array_equal(got, expect)

    def test_chain_tail_carries_head_memory(self):
        """Row 1 of a chain sees row 0's tokens as memory: feeding that
        memory explicitly must reproduce the chained row exactly."""
        from mr_mt3_tpu.ops.decode import segmem_greedy_decode
        h = _segmem_handler(batch_size=2)
        rng = np.random.default_rng(12)
        mel = rng.normal(size=(2, 256, 512)).astype(np.float32) * 0.5
        chained = h._decode_all(mel)
        mem = jnp.asarray(chained[0:1, :h.max_length])
        row1 = np.asarray(segmem_greedy_decode(
            h.model, h.variables, jnp.asarray(mel[1:2][None]),
            max_length=h.max_length, initial_memory=mem))[0, 0]
        np.testing.assert_array_equal(chained[1], row1)

    def test_chain_resets_at_chunk_boundary(self):
        """Segment 2 (head of chunk 2 with batch_size=2) decodes with the
        fresh seed, independent of segments 0-1."""
        from mr_mt3_tpu.ops.decode import segmem_greedy_decode
        h = _segmem_handler(batch_size=2)
        rng = np.random.default_rng(13)
        mel = rng.normal(size=(3, 256, 512)).astype(np.float32) * 0.5
        got = h._decode_all(mel)
        solo = np.asarray(segmem_greedy_decode(
            h.model, h.variables, jnp.asarray(mel[2:3][None]),
            max_length=h.max_length))[0]
        np.testing.assert_array_equal(got[2], solo[0])

    def test_chain_ablation_reseeds_every_segment(self):
        """chain_memory=False (the exposure-bias diagnostic) must make
        every segment decode against the fresh seed: each row equals a
        solo decode of that segment, regardless of position."""
        from mr_mt3_tpu.ops.decode import segmem_greedy_decode
        h = _segmem_handler(batch_size=2)
        rng = np.random.default_rng(15)
        mel = rng.normal(size=(3, 256, 512)).astype(np.float32) * 0.5
        ablated = np.asarray(segmem_greedy_decode(
            h.model, h.variables, jnp.asarray(mel[None]),
            max_length=h.max_length, chain_memory=False))[0]
        for i in range(3):
            solo = np.asarray(segmem_greedy_decode(
                h.model, h.variables, jnp.asarray(mel[i:i + 1][None]),
                max_length=h.max_length))[0, 0]
            np.testing.assert_array_equal(ablated[i], solo)

    def test_handler_segmem_chain_flag(self):
        """segmem_chain=False threads through the handler decode path."""
        from mr_mt3_tpu.ops.decode import segmem_greedy_decode
        h = _segmem_handler(batch_size=2, segmem_chain=False)
        rng = np.random.default_rng(16)
        mel = rng.normal(size=(2, 256, 512)).astype(np.float32) * 0.5
        got = h._decode_all(mel)
        expect = np.asarray(segmem_greedy_decode(
            h.model, h.variables, jnp.asarray(mel[None]),
            max_length=h.max_length, chain_memory=False))[0]
        np.testing.assert_array_equal(got, expect)

    def test_transcribe_many_chains_per_song(self):
        """Chains never cross song boundaries in transcribe_many."""
        h = _segmem_handler(batch_size=2)
        rng = np.random.default_rng(14)
        audios = [rng.normal(size=16000 * 3).astype(np.float32) * 0.1,
                  rng.normal(size=16000 * 5).astype(np.float32) * 0.1]
        singles = [h.transcribe(a) for a in audios]
        batched = h.transcribe_many(audios)
        for s, b in zip(singles, batched):
            assert len(s.notes) == len(b.notes)
            for ns_a, ns_b in zip(s.notes, b.notes):
                assert ns_a == ns_b

    def test_v1_decoder_prepend_stays_plain(self):
        """Reference v1's plain generate() ignores segmem entirely
        (reference: models/t5_segmem.py:254-311) — non-contiguous decode of
        a decoder_prepend model is memory-less batched greedy."""
        from mr_mt3_tpu.ops.decode import greedy_decode
        cfg = SMALL.replace(segmem_variant='decoder_prepend',
                            segmem_length=8)
        model = MT3(cfg)
        variables = model.init(
            jax.random.PRNGKey(5), jnp.zeros((1, 256, 512)),
            decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
            targets_prev=jnp.zeros((1, 4), jnp.int32))
        h = InferenceHandler(model=model, variables=variables,
                             max_length=12, batch_size=4)
        rng = np.random.default_rng(15)
        mel = rng.normal(size=(4, 256, 512)).astype(np.float32) * 0.5
        got = h._decode_all(mel)
        plain = np.asarray(greedy_decode(model, variables, jnp.asarray(mel),
                                         max_length=12))
        np.testing.assert_array_equal(got, plain)


class TestSegmemSeed:
    def test_default_seed_is_tie_eos(self):
        from mr_mt3_tpu.ops.decode import initial_segmem_tokens
        cfg = SMALL.replace(segmem_variant='encoder_append')
        mem = np.asarray(initial_segmem_tokens(cfg, 2, 8))
        # standard vocab: tie encoded = 1131 + 3 specials = 1134
        np.testing.assert_array_equal(mem[0, :3], [1134, 1, 0])

    def test_v2_eos_only_seed(self):
        from mr_mt3_tpu.ops.decode import initial_segmem_tokens
        cfg = SMALL.replace(segmem_variant='encoder_append',
                            segmem_seed='eos')
        mem = np.asarray(initial_segmem_tokens(cfg, 1, 8))
        np.testing.assert_array_equal(mem[0, :3], [1, 0, 0])

    def test_seed_derived_from_custom_vocabulary(self):
        """Non-default VocabularyConfig shifts the tie id; the seed must
        follow the codec, not a hardcoded 1134."""
        from mr_mt3_tpu.codec import (
            Event,
            VocabularyConfig,
            build_codec,
            vocabulary_from_codec,
        )
        from mr_mt3_tpu.ops.decode import initial_segmem_tokens
        codec = build_codec(VocabularyConfig(num_velocity_bins=127))
        vocab = vocabulary_from_codec(codec)
        tie = codec.encode_event(Event(type='tie', value=0)) + \
            vocab.num_special_tokens()
        assert tie != 1134  # the hardcode would be wrong here
        cfg = SMALL.replace(segmem_variant='encoder_append')
        mem = np.asarray(initial_segmem_tokens(cfg, 1, 8,
                                               codec=codec, vocab=vocab))
        np.testing.assert_array_equal(mem[0, :3], [tie, 1, 0])


class TestLongAudio:
    """Padding/bucketing edges at real song lengths (10 minutes)."""

    def test_long_contiguous_segmem(self):
        h = _segmem_handler(max_length=8, batch_size=4,
                            contiguous_inference=True, segment_bucket=32)
        audio = np.random.default_rng(41).normal(
            size=16000 * 600).astype(np.float32) * 0.05
        segments, seg_times, valid = h._audio_to_segments(audio)
        assert segments.shape[0] == 293  # ceil(75001 frames / 256)
        mel = h._compute_mel(segments, valid)
        tokens = h._decode_all(mel)  # buckets 293 -> 320-segment scan
        assert tokens.shape == (293, 9)

    def test_long_noncontiguous_chained(self):
        h = _segmem_handler(max_length=8, batch_size=8)
        audio = np.random.default_rng(42).normal(
            size=16000 * 300).astype(np.float32) * 0.05
        ns = h.transcribe(audio)  # 147 segments -> 19 chains of 8
        assert ns is not None

    def test_long_vanilla(self):
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4), jnp.int32))
        h = InferenceHandler(model=model, variables=variables,
                             max_length=8, batch_size=16)
        audio = np.random.default_rng(43).normal(
            size=16000 * 300).astype(np.float32) * 0.05
        ns = h.transcribe(audio)
        assert ns is not None


class TestMeshHandler:
    """Data-parallel decode through the PRODUCT path: the handler with a
    ('data', 'model') mesh must emit tokens identical to the single-device
    handler (fp32 CPU numerics are deterministic)."""

    def _vanilla_pair(self, batch_size=4, mesh_data=4):
        from mr_mt3_tpu.parallel import make_mesh
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        local = InferenceHandler(model=model, variables=variables,
                                 max_length=8, batch_size=batch_size)
        mesh = make_mesh(data=mesh_data, model=1,
                         devices=jax.devices()[:mesh_data])
        sharded = InferenceHandler(model=model, variables=variables,
                                   max_length=8, batch_size=batch_size,
                                   mesh=mesh)
        return local, sharded

    def test_vanilla_handler_tokens_identical(self):
        local, sharded = self._vanilla_pair()
        mel = np.random.default_rng(1).normal(
            size=(10, 256, 512)).astype(np.float32)
        np.testing.assert_array_equal(local._decode_all(mel),
                                      sharded._decode_all(mel))

    def test_batch_size_is_per_chip_and_never_rounded(self):
        """batch_size is a semantic quantity (the segmem chain length);
        a mesh must not alter it — the device batch scales as
        batch_size * n_data instead."""
        _, sharded = self._vanilla_pair(batch_size=6, mesh_data=4)
        assert sharded.batch_size == 6

    def test_tensor_parallel_tokens_identical(self):
        """model axis > 1: weights shard over 'model' by the training TP
        rules (parallel/mesh.py:_PARAM_RULES) and _shard_jit switches
        from shard_map to jit+GSPMD so XLA inserts the all-reduces;
        tokens must still match the single-device handler."""
        from jax.sharding import PartitionSpec as P

        from mr_mt3_tpu.parallel import make_mesh
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        local = InferenceHandler(model=model, variables=variables,
                                 max_length=8, batch_size=4)
        tp_mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
        tp = InferenceHandler(model=model, variables=variables,
                              max_length=8, batch_size=4, mesh=tp_mesh)
        # the q projection must actually be sharded over 'model'
        q_kernel = tp.variables['params']['decoder']['block_0'][
            'self_attn']['q']['kernel']
        assert q_kernel.sharding.spec == P(None, 'model'), \
            q_kernel.sharding
        mel = np.random.default_rng(5).normal(
            size=(8, 256, 512)).astype(np.float32)
        np.testing.assert_array_equal(local._decode_all(mel),
                                      tp._decode_all(mel))

    def test_tensor_parallel_rejects_quantize_tiers(self):
        """Pallas decode kernels read whole weight matrices; sharding
        them over 'model' cannot be GSPMD-partitioned, so the handler
        must refuse the combination loudly instead of crashing at the
        first decode."""
        from mr_mt3_tpu.parallel import make_mesh
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        tp_mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
        with pytest.raises(ValueError, match='model axis'):
            InferenceHandler(model=model, variables=variables,
                             max_length=8, quantize='fused',
                             mesh=tp_mesh)

    def test_tensor_parallel_keeps_attention_kernel_config(self):
        """The fused full-sequence attention kernel carries a
        custom_partitioning rule (ops/train_attention.py), so the TP
        handler must NOT rewrite the model's attention_kernel — 'auto'
        stays 'auto' (the GSPMD-sharded-kernel behavior itself is pinned
        by test_train.py's multichip fused training test)."""
        from mr_mt3_tpu.parallel import make_mesh
        cfg = SMALL.replace(dtype='bfloat16')
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        tp_mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
        tp = InferenceHandler(model=model, variables=variables,
                              max_length=8, mesh=tp_mesh)
        assert tp.cfg.attention_kernel == 'auto'
        assert tp.model is model

    def test_segmem_chain_length_indivisible_by_mesh(self):
        """Chain length (batch_size) NOT divisible by the data axis must
        still produce tokens identical to single-device — the round-3
        regression this pins: rounding batch_size up regrouped which
        segments share memory."""
        from mr_mt3_tpu.parallel import make_mesh
        mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
        local = _segmem_handler(max_length=8, batch_size=3)
        sharded = _segmem_handler(max_length=8, batch_size=3, mesh=mesh)
        mel = np.random.default_rng(6).normal(
            size=(7, 256, 512)).astype(np.float32) * 0.5
        np.testing.assert_array_equal(local._decode_all(mel),
                                      sharded._decode_all(mel))

    def test_transcribe_matches(self):
        local, sharded = self._vanilla_pair()
        audio = np.random.default_rng(2).normal(
            size=16000 * 5).astype(np.float32) * 0.05
        ns_local = local.transcribe(audio)
        ns_sharded = sharded.transcribe(audio)
        assert [(n.pitch, n.start_time, n.program)
                for n in ns_local.notes] == \
               [(n.pitch, n.start_time, n.program)
                for n in ns_sharded.notes]

    def test_segmem_chained_tokens_identical(self):
        from mr_mt3_tpu.parallel import make_mesh
        mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
        # same init seed -> identical weights in both handlers
        local = _segmem_handler(max_length=8, batch_size=2)
        sharded = _segmem_handler(max_length=8, batch_size=2, mesh=mesh)
        mel = np.random.default_rng(3).normal(
            size=(7, 256, 512)).astype(np.float32) * 0.5
        np.testing.assert_array_equal(local._decode_all(mel),
                                      sharded._decode_all(mel))

    @pytest.mark.parametrize('quantize', ['fused', 'fused_int4'])
    def test_fused_under_mesh_matches_local_fused(self, quantize):
        """The v5e-8 production serving config: megakernel decode with
        the batch sharded over the data axis (each chip runs the full
        Pallas program on its slice). Must match the unsharded fused
        path token-for-token (interpret-mode kernels on the CPU mesh).
        The int4 tier additionally exercises pack_fused_params' nested
        jit (quantize_columns_int4) inside the handler's shard_map."""
        from mr_mt3_tpu.parallel import make_mesh
        small = SMALL.replace(d_model=32, num_heads=4, d_kv=8, d_ff=48)
        model = MT3(small)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
        kw = dict(model=model, variables=variables, max_length=8,
                  batch_size=2, quantize=quantize)
        local = InferenceHandler(**kw)
        sharded = InferenceHandler(mesh=mesh, **kw)
        mel = np.random.default_rng(5).normal(
            size=(4, 256, 512)).astype(np.float32)
        # sharded b = batch_size * n_data = 4 -> one call, 2 rows/chip
        np.testing.assert_array_equal(local._decode_all(mel),
                                      sharded._decode_all(mel))

    @pytest.mark.parametrize('quantize', ['none', 'fused_int4'])
    def test_contiguous_lockstep_songs_match(self, quantize):
        """Flagship eval config under a mesh: contiguous segmem lockstep
        ('none' = the exact eval default; 'fused_int4' = the serving
        default tier) must match the unsharded handler note-for-note."""
        from mr_mt3_tpu.parallel import make_mesh
        mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
        cfg = SMALL.replace(segmem_variant='encoder_append',
                            segmem_length=8)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(3),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32),
                               targets_prev=jnp.zeros((1, 4), jnp.int32))
        kw = dict(model=model, variables=variables, max_length=8,
                  batch_size=2, contiguous_inference=True,
                  segment_bucket=4, quantize=quantize)
        local = InferenceHandler(**kw)
        sharded = InferenceHandler(mesh=mesh, **kw)
        rng = np.random.default_rng(4)
        # 3 songs -> sharded path pads the song axis to 4
        audios = [rng.normal(size=16000 * 4).astype(np.float32) * 0.05
                  for _ in range(3)]
        res_local = local.transcribe_many(audios)
        res_sharded = sharded.transcribe_many(audios)
        for a, b in zip(res_local, res_sharded):
            assert [(n.pitch, n.start_time) for n in a.notes] == \
                   [(n.pitch, n.start_time) for n in b.notes]


class TestPow2Bucketing:
    """Variable song/chain counts bucket to powers of two so a server or
    eval run compiles O(log) programs instead of one per count; the
    padded rows are valid-masked (zero extra decode steps) and must not
    change real outputs."""

    def test_lockstep_odd_song_count_matches_per_song(self):
        h = _segmem_handler(max_length=8, batch_size=2,
                            contiguous_inference=True, segment_bucket=4)
        rng = np.random.default_rng(9)
        audios = [rng.normal(size=16000 * 3).astype(np.float32) * 0.05
                  for _ in range(5)]  # 5 songs -> padded to 8
        many = h.transcribe_many(audios)
        assert len(many) == 5
        for audio, ns in zip(audios, many):
            solo = h.transcribe(audio)
            assert [(n.pitch, n.start_time) for n in solo.notes] == \
                   [(n.pitch, n.start_time) for n in ns.notes]

    def test_call_sizes(self):
        """Fused calls past the per-call cap split into full-cap calls
        plus a pow2-bucketed remainder (no near-2x padding), all sizes
        from the standard bucket set. The cap is encoder-length-aware:
        8 rows (single group) for encoder_append segmem models — in-trace
        grouping LOSES at the chunk-512 Lenc=320 shape (195.2 RTF per
        8-row call vs 167.6 at 8 groups, PERF.md) — and the 64-row
        compile ceiling for short-encoder models, where grouping wins."""
        h = _segmem_handler(max_length=8, batch_size=2)
        assert h._call_sizes(3, floor=4, capped=True) == [4]
        assert h._call_sizes(65, floor=4, capped=True) == [8] * 8 + [4]
        assert h._call_sizes(150, floor=4, capped=True) == [8] * 19
        assert h._call_sizes(65, floor=4, capped=False) == [68]
        assert h._call_sizes(1, floor=1, capped=True) == [1]
        # short-encoder (vanilla) handlers keep the 64-row group ceiling
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        hv = InferenceHandler(model=model, variables=variables,
                              max_length=8, quantize='fused')
        assert hv._call_sizes(65, floor=4, capped=True) == [64, 4]
        assert hv._call_sizes(150, floor=4, capped=True) == [64, 64, 32]
        # non-pow2 data axis: the pow2 bucket rounded up to n_data can
        # exceed the hard cap (40 -> bucket 66 > cap 48 at n_data=6);
        # the remainder must clamp to one full-cap call, never exceed it
        h6 = _segmem_handler(max_length=8, batch_size=2)
        h6.n_data = 6
        assert h6._call_sizes(40, floor=4, capped=True) == [48]
        assert h6._call_sizes(100, floor=4, capped=True) == [48, 48, 6]
        assert all(s <= 48 for s in
                   h6._call_sizes(130, floor=4, capped=True))

    def test_pow2_bucket_values(self):
        from mr_mt3_tpu.infer.handler import _pow2_bucket
        assert _pow2_bucket(0) == 1
        assert _pow2_bucket(1) == 1
        assert _pow2_bucket(3) == 4
        assert _pow2_bucket(8) == 8
        assert _pow2_bucket(33) == 64
        # beyond the cap, multiples of 4 (huge one-shot batches compile
        # once; near-2x padding there costs real encoder FLOPs)
        assert _pow2_bucket(65) == 68
        assert _pow2_bucket(130) == 132

    def test_chained_odd_chain_count(self):
        h = _segmem_handler(max_length=8, batch_size=2)
        rng = np.random.default_rng(10)
        mel = rng.normal(size=(9, 256, 512)).astype(np.float32) * 0.5
        tokens = h._decode_all(mel)  # 5 chains -> padded to 8
        assert tokens.shape == (9, 9)
        # first chain unaffected by the padding chains
        ref = h._decode_all(mel[:2])
        np.testing.assert_array_equal(tokens[:2], ref)


class TestAutoQuantize:
    def _handler(self, quantize='fused'):
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        return InferenceHandler(model=model, variables=variables,
                                max_length=12, batch_size=4,
                                quantize=quantize)

    def test_resolve_auto_falls_back_on_flip(self, monkeypatch):
        """Flips at EVERY tier walk the whole ladder:
        fused -> fused_bf16 -> none."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused')
        tiers_probed = []
        monkeypatch.setattr(probe_mod, 'quantize_probe',
                            lambda h: tiers_probed.append(h.quantize)
                            or (2, 50))
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert handler.quantize == 'none'
        assert tiers_probed == ['fused', 'fused_bf16']
        assert info['quantize'] == 'none'
        assert info['probe_flips'] == 2
        assert info['probe_tokens'] == 50
        assert len(info['demotions']) == 2

    def test_resolve_auto_full_ladder_from_int4(self, monkeypatch):
        """Starting at fused_int4, flips at every tier walk
        int4 -> int8 -> bf16 -> none."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused_int4')
        tiers = []
        monkeypatch.setattr(probe_mod, 'quantize_probe',
                            lambda h: tiers.append(h.quantize) or (1, 50))
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert tiers == ['fused_int4', 'fused', 'fused_bf16']
        assert handler.quantize == 'none'
        assert len(info['demotions']) == 3

    def test_resolve_auto_ladder_stops_at_bf16(self, monkeypatch):
        """An int8 flip with a clean bf16 megakernel keeps megakernel
        speed at exact numerics instead of falling to the XLA body."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused')
        monkeypatch.setattr(
            probe_mod, 'quantize_probe',
            lambda h: (3, 50) if h.quantize == 'fused' else (0, 50))
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert handler.quantize == 'fused_bf16'
        assert info['quantize'] == 'fused_bf16'
        assert info['probe_flips'] == 0
        assert len(info['demotions']) == 1

    def test_resolve_auto_keeps_clean_path(self, monkeypatch):
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused')
        monkeypatch.setattr(probe_mod, 'quantize_probe',
                            lambda h: (0, 50))
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert handler.quantize == 'fused'
        assert info['probe_flips'] == 0

    def test_exception_demotion_drops_stale_probe_counts(self, monkeypatch):
        """A tier that probes WITH flips followed by tiers whose probes
        RAISE must not leave the first tier's counts in the info dict —
        /healthz would attribute them to a path that never measured
        them (the same stale-evidence invariant serve's prewarm
        demotion enforces)."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused_int4')

        def probe(h, **kw):
            if h.quantize == 'fused_int4':
                return (7, 50)
            raise RuntimeError('compile failed')

        monkeypatch.setattr(probe_mod, 'quantize_probe', probe)
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert handler.quantize == 'none'
        assert 'probe_flips' not in info
        assert 'probe_tokens' not in info
        assert 'probe_tier' not in info
        assert 'compile failed' in info['probe_error']
        assert len(info['demotions']) == 3

    def test_probe_tier_attributes_counts(self, monkeypatch):
        """probe_tier names the tier the recorded counts measured: the
        losing tier on a flip-demotion to 'none', the kept tier on a
        clean ladder stop."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused')
        monkeypatch.setattr(
            probe_mod, 'quantize_probe',
            lambda h, **kw: (3, 50) if h.quantize == 'fused' else (0, 50))
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert handler.quantize == 'fused_bf16'
        assert info['probe_tier'] == 'fused_bf16'
        assert info['probe_flips'] == 0
        handler2 = self._handler('fused_bf16')
        monkeypatch.setattr(probe_mod, 'quantize_probe',
                            lambda h, **kw: (2, 50))
        info2 = probe_mod.resolve_auto_quantize(handler2, verbose=False)
        assert handler2.quantize == 'none'
        assert info2['probe_tier'] == 'fused_bf16'
        assert info2['probe_flips'] == 2

    def test_probe_caches_exact_tokens_across_ladder(self):
        """The exact-side decode depends only on weights/config, so the
        ladder's re-probes must reuse it instead of rebuilding the exact
        twin (and re-paying its program startup) at every tier."""
        from mr_mt3_tpu.infer.probe import quantize_probe
        handler = self._handler('fused')
        flips1, total1 = quantize_probe(handler)
        cached = dict(handler._probe_exact_tokens)
        assert len(cached) == 1
        # a second probe (as the ladder issues after a demotion) must
        # reuse the same exact tokens array, not rebuild the twin
        handler.quantize = 'fused_bf16'
        handler._invalidate_compiled()
        flips2, total2 = quantize_probe(handler)
        assert len(handler._probe_exact_tokens) == 1
        assert all(handler._probe_exact_tokens[k] is cached[k]
                   for k in cached)
        assert total2 == total1

    def test_probe_length_clamps_and_overrides(self):
        """Probes decode at min(handler.max_length, PROBE_MAX_LENGTH) so
        losing ladder tiers and the exact twin never pay a full-length
        program's startup; an explicit max_length overrides."""
        from mr_mt3_tpu.infer.probe import PROBE_MAX_LENGTH, quantize_probe
        assert PROBE_MAX_LENGTH < 1024  # the point of the short probe
        handler = self._handler('fused')  # max_length=12 clamps below it
        # probe_audio(2) frames into exactly 2 segments (sized 64 samples
        # short of the hop multiple, so the frontend's full-hop pad does
        # not add a third all-padding segment)
        _, total = quantize_probe(handler)
        assert total == 2 * (12 + 1)  # leading start token per row
        handler2 = self._handler('fused')
        _, total2 = quantize_probe(handler2, max_length=4)
        assert total2 == 2 * (4 + 1)

    def test_full_length_confirm_guards_winner(self, monkeypatch):
        """A tier that probes clean SHORT but flips at the serving
        length must still demote: quantized-KV error grows with cache
        occupancy, so the short ladder probe alone is not the guard
        (the winner gets one full-length confirm probe)."""
        import mr_mt3_tpu.infer.probe as probe_mod
        monkeypatch.setattr(probe_mod, 'PROBE_MAX_LENGTH', 4)
        handler = self._handler('fused')  # max_length=12 > short 4
        calls = []

        def fake_probe(h, max_length=None):
            calls.append((h.quantize, max_length))
            if max_length is None:
                return (0, 15)  # every tier is clean at the short length
            # only bf16 survives the full length
            return (0, 39) if h.quantize == 'fused_bf16' else (5, 39)
        info = probe_mod.resolve_auto_quantize(
            handler, verbose=False, probe_fn=fake_probe)
        assert handler.quantize == 'fused_bf16'
        assert calls == [('fused', None), ('fused', 12),
                         ('fused_bf16', None), ('fused_bf16', 12)]
        assert info['confirm_flips'] == 0
        assert info['confirm_tokens'] == 39
        assert any('full length' in d for d in info['demotions'])

    def test_margin_stats_vanilla(self):
        """margin_stats rescoring of the exact decode: margins are
        top1-minus-top2 (non-negative by construction), only positions
        up to each row's EOS count, and the teacher-forced agreement is
        a rate."""
        from mr_mt3_tpu.infer.probe import margin_stats
        handler = self._handler('none')
        stats = margin_stats(handler)
        assert stats['tokens'] > 0
        assert stats['tokens'] <= 2 * 12  # <= rows x decode length
        assert stats['margin_min'] >= 0
        assert (stats['margin_min'] <= stats['margin_p1']
                <= stats['margin_p5'] <= stats['margin_median'])
        assert 0.0 <= stats['teacher_forced_agreement'] <= 1.0

    def test_margin_stats_segmem_reconstructs_chain(self):
        """For encoder_append handlers the rescoring must rebuild the
        carried memory from the decode's own outputs (both decode modes
        chain the probe's segments as one song)."""
        from mr_mt3_tpu.infer.probe import margin_stats
        cfg = SMALL.replace(segmem_variant='encoder_append',
                            segmem_length=8)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        handler = InferenceHandler(model=model, variables=variables,
                                   max_length=12, batch_size=4,
                                   contiguous_inference=True)
        stats = margin_stats(handler)
        assert stats['tokens'] > 0
        assert stats['margin_min'] >= 0

    def test_resolve_auto_attaches_margins_on_demotion(self, monkeypatch):
        """with_margins=True reports the exact decode's margin
        distribution alongside a flip demotion (the mechanism, not just
        the fact); default off so stubbed-probe callers pay nothing."""
        import mr_mt3_tpu.infer.probe as probe_mod
        sentinel = {'margin_min': 0.01, 'tokens': 5}
        monkeypatch.setattr(probe_mod, 'quantize_probe',
                            lambda h, **kw: (2, 50))
        monkeypatch.setattr(probe_mod, 'margin_stats',
                            lambda h: sentinel)
        handler = self._handler('fused')
        info = probe_mod.resolve_auto_quantize(handler, verbose=False,
                                               with_margins=True)
        assert info['exact_margins'] is sentinel
        handler2 = self._handler('fused')
        info2 = probe_mod.resolve_auto_quantize(handler2, verbose=False)
        assert 'exact_margins' not in info2

    def test_full_length_confirm_failure_demotes(self, monkeypatch):
        """A full-length compile failure (a ceiling the short program
        cannot see) demotes like a probe failure — on EVERY caller of
        resolve_auto_quantize (eval's quantize='auto' included), not
        just serve's prewarm."""
        import mr_mt3_tpu.infer.probe as probe_mod
        monkeypatch.setattr(probe_mod, 'PROBE_MAX_LENGTH', 4)
        handler = self._handler('fused')

        def fake_probe(h, max_length=None):
            if max_length is not None and h.quantize == 'fused':
                raise RuntimeError('VMEM exceeded at full length')
            return (0, 15)
        info = probe_mod.resolve_auto_quantize(
            handler, verbose=False, probe_fn=fake_probe)
        assert handler.quantize == 'fused_bf16'
        # the losing tier's probe_error must NOT survive next to the
        # winning tier's clean counts (stale-evidence guard); the failure
        # reason lives in the demotions history instead
        assert 'probe_error' not in info
        assert any('VMEM exceeded' in d for d in info['demotions'])
        assert any('confirm failed' in d for d in info['demotions'])

    def test_full_length_confirm_real_probe(self, monkeypatch):
        """The confirm really decodes at handler.max_length: probe
        totals scale with the requested length, and the exact cache
        keeps one entry per length (the ladder alternates short probes
        and full confirms — a single-slot cache would thrash)."""
        import mr_mt3_tpu.infer.probe as probe_mod
        monkeypatch.setattr(probe_mod, 'PROBE_MAX_LENGTH', 4)
        handler = self._handler('fused_bf16')
        _, total_short = probe_mod.quantize_probe(handler)
        assert total_short == 2 * (4 + 1)
        _, total_full = probe_mod.quantize_probe(
            handler, max_length=handler.max_length)
        assert total_full == 2 * (12 + 1)
        cache = dict(handler._probe_exact_tokens)
        assert len(cache) == 2  # short + full, both retained
        # re-probing at the short length reuses the cached exact tokens
        probe_mod.quantize_probe(handler)
        assert all(handler._probe_exact_tokens[k] is cache[k]
                   for k in cache)

    def test_confirm_skipped_when_serving_short(self, monkeypatch):
        """max_length <= PROBE_MAX_LENGTH means the ladder probe already
        ran at the serving length — no extra confirm decode."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused')  # max_length=12 <= 256
        calls = []
        monkeypatch.setattr(
            probe_mod, 'quantize_probe',
            lambda h, max_length=None: calls.append(max_length) or (0, 10))
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert calls == [None]
        assert 'confirm_flips' not in info

    def test_decoder_prepend_demoted_without_probe(self):
        """v1 (decoder_prepend) has no quantized decode path; 'auto'
        must demote to exact numerics instead of crashing the probe."""
        import mr_mt3_tpu.infer.probe as probe_mod
        cfg = SMALL.replace(segmem_variant='decoder_prepend',
                            segmem_length=8, segmem_seed='eos')
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32),
                               targets_prev=jnp.zeros((1, 4), jnp.int32))
        handler = InferenceHandler(model=model, variables=variables,
                                   max_length=8, quantize='fused')
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert handler.quantize == 'none'
        assert 'probe_flips' not in info  # demoted before probing

    def test_probe_failure_demotes(self, monkeypatch):
        """Any probe exception falls back to exact numerics — the guard
        must never crash the caller."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused')

        def boom(h):
            raise RuntimeError('compile failed')
        monkeypatch.setattr(probe_mod, 'quantize_probe', boom)
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert handler.quantize == 'none'
        assert 'compile failed' in info['probe_error']

    def test_material_flip_demotes_benign_does_not(self, monkeypatch):
        """demote_on='material' (default): a first-flip above the noise
        ceiling demotes; a tier whose flips are all near-tie benign
        keeps its slot, with the benign counts recorded for /healthz."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused_int4')

        def probe(h, max_length=None, classify=False):
            assert classify  # the default policy must request it
            if h.quantize == 'fused_int4':
                return {'flips': 5, 'total': 50, 'material_rows': 1,
                        'benign_rows': 1, 'downstream_rows': 0,
                        'rows': 2, 'material_margin': 0.01,
                        'margin_noise': 0.002,
                        'first_flip_margins': [0.5, 0.001]}
            return {'flips': 3, 'total': 50, 'material_rows': 0,
                    'benign_rows': 2, 'downstream_rows': 0, 'rows': 2,
                    'material_margin': 0.01, 'margin_noise': 0.002,
                    'first_flip_margins': [0.004, 0.001]}
        monkeypatch.setattr(probe_mod, 'quantize_probe', probe)
        info = probe_mod.resolve_auto_quantize(handler, verbose=False,
                                               confirm_full=False)
        assert handler.quantize == 'fused'
        assert info['quantize'] == 'fused'
        assert info['probe_flips'] == 3
        assert info['probe_material_rows'] == 0
        assert info['probe_benign_rows'] == 2
        assert info['first_flip_margins'] == [0.004, 0.001]
        assert len(info['demotions']) == 1
        assert 'material' in info['demotions'][0]

    def test_demote_on_any_is_strict(self, monkeypatch):
        """demote_on='any' restores the round-2 exact-token-match
        policy: benign-classified flips still demote (and the probe is
        never asked to classify)."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused')

        def probe(h, max_length=None, **kw):
            assert not kw.get('classify')
            return (2, 50)
        monkeypatch.setattr(probe_mod, 'quantize_probe', probe)
        info = probe_mod.resolve_auto_quantize(handler, verbose=False,
                                               demote_on='any')
        assert handler.quantize == 'none'
        assert len(info['demotions']) == 2

    def test_classify_error_falls_back_to_strict(self, monkeypatch):
        """A probe dict without classification (classify_flips raised)
        must degrade to the strict policy — every flip material — never
        to keeping a flipping tier on missing evidence."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused_bf16')
        monkeypatch.setattr(
            probe_mod, 'quantize_probe',
            lambda h, max_length=None, classify=False:
            {'flips': 2, 'total': 50, 'classify_error': 'boom'})
        info = probe_mod.resolve_auto_quantize(handler, verbose=False)
        assert handler.quantize == 'none'
        assert len(info['demotions']) == 1

    def test_legacy_tuple_probe_fn_is_strict(self, monkeypatch):
        """probe_fn callables that know nothing of classification (the
        pre-round-5 signature) keep the strict any-flip semantics."""
        import mr_mt3_tpu.infer.probe as probe_mod
        handler = self._handler('fused')
        info = probe_mod.resolve_auto_quantize(
            handler, verbose=False, probe_fn=lambda h: (1, 50),
            confirm_full=False)
        assert handler.quantize == 'none'
        assert len(info['demotions']) == 2

    def test_quantize_probe_classify_real_model(self):
        """classify=True on the real probe returns the dict form; if the
        tiny model flips at all, every diverged row is accounted for in
        exactly one bucket and the threshold respects the floor."""
        from mr_mt3_tpu.infer import probe as probe_mod
        handler = self._handler('fused')
        res = probe_mod.quantize_probe(handler, classify=True)
        assert isinstance(res, dict)
        assert res['total'] == 2 * (12 + 1)
        if res['flips']:
            assert 'classify_error' not in res
            assert (res['material_rows'] + res['benign_rows']
                    + res['downstream_rows']) >= 1
            assert (res['material_margin']
                    >= probe_mod.MATERIAL_MARGIN_FLOOR)
            assert res['margin_noise'] >= 0

    def test_classify_flips_chained_downstream_rows(self):
        """In contiguous segmem mode the probe rows form ONE chain:
        rows after the first diverged row condition on a different
        memory and must be excluded (downstream), not classified."""
        import numpy as np

        from mr_mt3_tpu.infer import probe as probe_mod
        handler = _segmem_handler(max_length=12, batch_size=4,
                                  contiguous_inference=True)
        mel = probe_mod.probe_mel(handler)
        exact = probe_mod._probe_twin(handler, 'none', 12)._decode_all(mel)
        quant = np.array(exact)
        quant[0, 3] ^= 1   # first flip in row 0 -> row 1 is downstream
        quant[1, 2] ^= 1
        out = probe_mod.classify_flips(handler, quant, exact, mel)
        assert out['downstream_rows'] == 1
        assert out['material_rows'] + out['benign_rows'] == 1
        assert len(out['first_flip_margins']) == 1

    def test_classify_flips_vanilla_rows_independent(self):
        """Vanilla rows are independent decodes: every diverged row gets
        its own first-flip classification."""
        import numpy as np

        from mr_mt3_tpu.infer import probe as probe_mod
        handler = self._handler('none')
        mel = probe_mod.probe_mel(handler)
        exact = probe_mod._probe_twin(handler, 'none', 12)._decode_all(mel)
        quant = np.array(exact)
        quant[0, 3] ^= 1
        quant[1, 2] ^= 1
        out = probe_mod.classify_flips(handler, quant, exact, mel)
        assert out['downstream_rows'] == 0
        assert out['material_rows'] + out['benign_rows'] == 2
        assert len(out['first_flip_margins']) == 2

    def test_serve_build_handler_accepts_auto(self):
        """eval.quantize=auto through serve.py resolves like eval does
        (exact bf16 off-TPU) instead of crashing at the first decode."""
        import serve
        handler = serve.build_handler(
            ['model=MT3Net', 'model.config.num_layers=1',
             'model.config.d_model=32', 'model.config.d_ff=48',
             'model.config.num_heads=2', 'model.config.d_kv=16',
             '+eval.quantize=auto', 'devices=1'])
        assert handler.quantize == 'none'

    def test_get_scores_auto_resolves_to_none_off_tpu(self, tmp_path):
        """quantize='auto' on the CPU backend uses exact bf16 without
        probing (the megakernel would run interpreted off-TPU)."""
        from mr_mt3_tpu.audio import write_wav
        from mr_mt3_tpu.codec import note_sequences as nsq
        from mr_mt3_tpu.infer.scores import get_scores
        from mr_mt3_tpu.midi import note_sequence_to_midi_file
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        wav = tmp_path / 'clip.wav'
        rng = np.random.default_rng(0)
        write_wav(wav, (rng.normal(size=16000 * 2) * 0.05
                        ).astype(np.float32), 16000)
        ns = nsq.NoteSequence()
        ns.add_note(start_time=0.1, end_time=0.5, pitch=60, velocity=100,
                    program=0, is_drum=False, instrument=0)
        ns.total_time = 2.0
        note_sequence_to_midi_file(ns, tmp_path / 'clip.mid')
        scores = get_scores(
            model=model, variables=variables,
            eval_audio_dir=[str(wav)], eval_dataset='NSynth',
            exp_tag_name=str(tmp_path / 'out'),
            ground_truth_midi_dir=str(tmp_path),
            max_length=8, quantize='auto', verbose=False)
        assert 'Onset F1' in scores


    def test_get_scores_skips_unreadable_audio(self, tmp_path, capsys):
        """One corrupt audio file must skip only itself — the per-song
        fallback reloads the audio, so the load error must be caught
        there too or the whole eval dies (and multihost ranks hang at
        the post-eval sync barrier)."""
        from mr_mt3_tpu.audio import write_wav
        from mr_mt3_tpu.codec import note_sequences as nsq
        from mr_mt3_tpu.infer.scores import get_scores
        from mr_mt3_tpu.midi import note_sequence_to_midi_file
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4),
                                                           jnp.int32))
        good = tmp_path / 'good.wav'
        rng = np.random.default_rng(0)
        write_wav(good, (rng.normal(size=16000 * 2) * 0.05
                         ).astype(np.float32), 16000)
        bad = tmp_path / 'bad.wav'
        bad.write_bytes(b'not audio at all')
        for name in ('good', 'bad'):
            ns = nsq.NoteSequence()
            ns.add_note(start_time=0.1, end_time=0.5, pitch=60,
                        velocity=100, program=0, is_drum=False, instrument=0)
            ns.total_time = 2.0
            note_sequence_to_midi_file(ns, tmp_path / f'{name}.mid')
        scores = get_scores(
            model=model, variables=variables,
            eval_audio_dir=[str(good), str(bad)], eval_dataset='NSynth',
            exp_tag_name=str(tmp_path / 'out'),
            ground_truth_midi_dir=str(tmp_path),
            max_length=8, verbose=False)
        assert 'Onset F1' in scores  # the good song was still scored
        assert (tmp_path / 'out' / 'good.mid').exists()
        assert not (tmp_path / 'out' / 'bad.mid').exists()


class TestDataParallelDecode:
    def test_sharded_batch_decode(self):
        """Greedy decode with the batch sharded over a data mesh (the
        serving-scale path: segments spread across chips)."""
        from mr_mt3_tpu.ops.decode import greedy_decode
        from mr_mt3_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh(data=8, model=1)
        model = MT3(SMALL)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 512)),
                               decoder_input_ids=jnp.zeros((1, 4), jnp.int32))
        mel = np.random.default_rng(0).normal(
            size=(8, 256, 512)).astype(np.float32)
        sharded = shard_batch({'mel': mel}, mesh)['mel']
        tokens_sharded = np.asarray(
            greedy_decode(model, variables, sharded, max_length=8))
        tokens_local = np.asarray(
            greedy_decode(model, variables, jnp.asarray(mel), max_length=8))
        np.testing.assert_array_equal(tokens_sharded, tokens_local)
