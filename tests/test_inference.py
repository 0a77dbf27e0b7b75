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
