"""Model tests: shapes, segmem variants, KV-cache decode correctness, and
numerical parity against the HuggingFace T5 blocks the reference is built on.

The reference model = stock HF T5Blocks (relative attention bias disabled)
+ additive sinusoidal positions + continuous-input projection + untied
lm_head (reference: models/t5.py:478-719). The oracle here reconstructs
exactly that wiring in torch using the installed transformers T5 stacks with
zeroed relative-bias tables, then checks my Flax model given the same
weights via the checkpoint importer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mr_mt3_tpu.models import MT3, MT3Config, shift_right
from mr_mt3_tpu.models.mt3 import sinusoidal_position_table
from mr_mt3_tpu.ops.decode import (
    greedy_decode,
    initial_segmem_tokens,
    segmem_greedy_decode,
)
from mr_mt3_tpu.utils.checkpoint_import import (
    export_to_torch_state_dict,
    import_torch_state_dict,
)

SMALL = MT3Config(vocab_size=96, d_model=32, d_kv=8, d_ff=48, num_heads=4,
                  num_encoder_layers=2, num_decoder_layers=2, mel_bins=16,
                  dropout_rate=0.0)


def _init(cfg, seed=0, mel_len=10, dec_len=7):
    model = MT3(cfg)
    mel = jnp.zeros((2, mel_len, cfg.mel_bins))
    ids = jnp.zeros((2, dec_len), jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), mel,
                           decoder_input_ids=ids,
                           targets_prev=ids if cfg.has_segmem else None)
    return model, variables


class TestShapes:
    def test_forward_logits_shape(self):
        model, variables = _init(SMALL)
        mel = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 7), 0, 96)
        logits = model.apply(variables, mel, decoder_input_ids=ids)
        assert logits.shape == (2, 7, 96)

    def test_labels_shift_right(self):
        labels = jnp.array([[5, 6, 1, -100, -100]])
        shifted = shift_right(labels)
        np.testing.assert_array_equal(np.asarray(shifted),
                                      [[0, 5, 6, 1, 0]])

    def test_segmem_encoder_append_changes_logits(self):
        cfg = SMALL.replace(segmem_variant='encoder_append', segmem_length=4)
        model, variables = _init(cfg)
        mel = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 7), 3, 96)
        prev_a = jnp.full((2, 7), 5, jnp.int32)
        prev_b = jnp.full((2, 7), 9, jnp.int32)
        la = model.apply(variables, mel, decoder_input_ids=ids,
                         targets_prev=prev_a)
        lb = model.apply(variables, mel, decoder_input_ids=ids,
                         targets_prev=prev_b)
        assert la.shape == (2, 7, 96)
        assert not np.allclose(np.asarray(la), np.asarray(lb))

    def test_segmem_handles_minus_100(self):
        cfg = SMALL.replace(segmem_variant='encoder_append', segmem_length=4)
        model, variables = _init(cfg)
        mel = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
        ids = jnp.zeros((2, 7), jnp.int32)
        prev = jnp.array([[5, 1, -100, -100, -100, -100, -100]] * 2)
        prev_pad = jnp.array([[5, 1, 0, 0, 0, 0, 0]] * 2)
        la = model.apply(variables, mel, decoder_input_ids=ids,
                         targets_prev=prev)
        lb = model.apply(variables, mel, decoder_input_ids=ids,
                         targets_prev=prev_pad)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)

    def test_segmem_decoder_prepend_shapes(self):
        cfg = SMALL.replace(segmem_variant='decoder_prepend', segmem_length=4)
        model, variables = _init(cfg)
        mel = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 7), 3, 96)
        logits = model.apply(variables, mel, decoder_input_ids=ids,
                             targets_prev=jnp.zeros((2, 7), jnp.int32))
        # memory prefix is stripped before lm_head
        assert logits.shape == (2, 7, 96)

    def test_causality(self):
        """Changing a later decoder token must not affect earlier logits."""
        model, variables = _init(SMALL)
        mel = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 16))
        ids_a = jnp.array([[3, 4, 5, 6, 7]])
        ids_b = jnp.array([[3, 4, 5, 6, 50]])
        la = model.apply(variables, mel, decoder_input_ids=ids_a)
        lb = model.apply(variables, mel, decoder_input_ids=ids_b)
        np.testing.assert_allclose(np.asarray(la[:, :4]),
                                   np.asarray(lb[:, :4]), atol=1e-5)
        assert not np.allclose(np.asarray(la[:, 4]), np.asarray(lb[:, 4]))


class TestPositionalTable:
    def test_matches_reference_layout(self):
        """sin block then cos block, matching FixedPositionalEmbedding."""
        table = sinusoidal_position_table(8, 16)
        inv_freq = 1.0 / (10000 ** (np.arange(0, 8, 2) / 8))
        t3 = 3.0
        np.testing.assert_allclose(table[3, :4], np.sin(t3 * inv_freq),
                                   rtol=1e-6)
        np.testing.assert_allclose(table[3, 4:], np.cos(t3 * inv_freq),
                                   rtol=1e-6)


class TestCacheDecode:
    """KV-cache incremental decode must equal full-sequence attention."""

    @pytest.mark.parametrize('variant',
                             [None, 'encoder_append', 'decoder_prepend'])
    def test_greedy_matches_teacher_forced(self, variant):
        cfg = SMALL.replace(segmem_variant=variant, segmem_length=4)
        model, variables = _init(cfg)
        mel = jax.random.normal(jax.random.PRNGKey(3), (3, 10, 16))
        max_len = 12
        if variant is None:
            tokens = greedy_decode(model, variables, mel, max_length=max_len)
            enc_kwargs = {}
        else:
            segs = mel[:, None]  # (B, 1 segment, L, bins)
            tokens = segmem_greedy_decode(model, variables, segs,
                                          max_length=max_len)[:, 0]
            enc_kwargs = {'targets_prev': initial_segmem_tokens(
                cfg, 3, max_len)}
        assert np.asarray(tokens).shape == (3, max_len + 1)
        tokens = np.asarray(tokens)
        assert tokens.shape == (3, max_len + 1)
        assert (tokens[:, 0] == cfg.decoder_start_token_id).all()

        # teacher-force the generated prefix and check argmax consistency
        logits = model.apply(variables, mel,
                             decoder_input_ids=jnp.asarray(tokens[:, :-1]),
                             **enc_kwargs)
        greedy_next = np.asarray(jnp.argmax(logits, axis=-1))
        for b in range(tokens.shape[0]):
            for i in range(max_len):
                expect = greedy_next[b, i]
                got = tokens[b, i + 1]
                assert got == expect, (b, i, got, expect)
                if got == cfg.eos_token_id:
                    break
            else:
                continue

    def test_finished_rows_emit_pad(self):
        cfg = SMALL
        model, variables = _init(cfg)
        mel = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 16))
        tokens = np.asarray(greedy_decode(model, variables, mel,
                                          max_length=20))
        for row in tokens:
            eos_pos = np.where(row == cfg.eos_token_id)[0]
            if len(eos_pos):
                assert (row[eos_pos[0] + 1:] == cfg.pad_token_id).all()

    def test_segmem_memory_propagates(self):
        """Segment 2's output must depend on segment 1's decode."""
        cfg = SMALL.replace(segmem_variant='encoder_append', segmem_length=4)
        model, variables = _init(cfg)
        segs = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 10, 16))
        out = segmem_greedy_decode(model, variables, segs, max_length=8)
        assert out.shape == (1, 2, 9)
        # decoding segment 1 alone with *fresh* memory should generally
        # differ from decoding it after segment 0 (memory carry)
        alone = segmem_greedy_decode(model, variables, segs[:, 1:],
                                     max_length=8)
        chained = np.asarray(out[:, 1])
        fresh = np.asarray(alone[:, 0])
        # not guaranteed different for all random inits, but overwhelmingly
        # likely; if identical the memory path is probably dead
        if (chained == fresh).all():
            mem = np.asarray(out[0, 0, :8])
            seed = np.asarray(initial_segmem_tokens(cfg, 1, 8))[0]
            assert (mem == seed).all(), 'memory differs but output does not'


class TestTorchParity:
    """Numerical parity with HF T5 blocks + reference stack wiring."""

    @pytest.fixture(scope='class')
    def torch_setup(self):
        torch = pytest.importorskip('torch')
        transformers = pytest.importorskip('transformers')
        torch.manual_seed(7)
        # d_kv * num_heads = 24 != d_model = 32: the MT3 architecture has
        # inner attention dim 384 != 512, so the oracle must cover that case
        cfg = MT3Config(vocab_size=96, d_model=32, d_kv=6, d_ff=48,
                        num_heads=4, num_encoder_layers=2,
                        num_decoder_layers=2, mel_bins=32, dropout_rate=0.0)
        t5c = transformers.T5Config(
            vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
            d_ff=cfg.d_ff, num_heads=cfg.num_heads,
            num_layers=cfg.num_encoder_layers,
            num_decoder_layers=cfg.num_decoder_layers,
            feed_forward_proj='gated-gelu', dropout_rate=0.0,
            tie_word_embeddings=False, use_cache=False,
            decoder_start_token_id=0)
        hf = transformers.T5ForConditionalGeneration(t5c).eval()
        # disable relative position bias -> pure content attention
        with torch.no_grad():
            for name, p in hf.named_parameters():
                if 'relative_attention_bias' in name:
                    p.zero_()
        proj = torch.nn.Linear(cfg.mel_bins, cfg.d_model, bias=False)
        return torch, cfg, hf, proj

    def _state_dict(self, torch, hf, proj):
        sd = {k: v for k, v in hf.state_dict().items()}
        sd['proj.weight'] = proj.weight.detach()
        sd['decoder_embed_tokens.weight'] = hf.shared.weight.detach()
        return sd

    def test_full_model_logits_match(self, torch_setup):
        torch, cfg, hf, proj = torch_setup
        pos = torch.from_numpy(
            sinusoidal_position_table(cfg.d_model, 64))

        rng = np.random.default_rng(11)
        mel = rng.normal(size=(2, 9, cfg.mel_bins)).astype(np.float32)
        ids = rng.integers(0, cfg.vocab_size, (2, 6))

        with torch.no_grad():
            enc_in = proj(torch.from_numpy(mel)) + pos[:9]
            enc_out = hf.encoder(
                inputs_embeds=enc_in).last_hidden_state
            dec_in = hf.shared(torch.from_numpy(ids)) + pos[:6]
            dec_out = hf.decoder(
                inputs_embeds=dec_in,
                encoder_hidden_states=enc_out).last_hidden_state
            oracle = hf.lm_head(dec_out).numpy()

        params = import_torch_state_dict(self._state_dict(torch, hf, proj),
                                         cfg)
        model = MT3(cfg)
        mine = np.asarray(model.apply(
            {'params': params}, jnp.asarray(mel),
            decoder_input_ids=jnp.asarray(ids)))
        np.testing.assert_allclose(mine, oracle, atol=2e-4, rtol=1e-3)

    def test_import_export_roundtrip(self, torch_setup):
        torch, cfg, hf, proj = torch_setup
        sd = self._state_dict(torch, hf, proj)
        params = import_torch_state_dict(sd, cfg)
        back = export_to_torch_state_dict(params, cfg)
        for key, value in back.items():
            assert key in sd, key
            np.testing.assert_allclose(value, sd[key].numpy(), atol=1e-6,
                                       err_msg=key)

    def test_import_covers_model_params(self, torch_setup):
        torch, cfg, hf, proj = torch_setup
        params = import_torch_state_dict(self._state_dict(torch, hf, proj),
                                         cfg)
        model = MT3(cfg)
        ref = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 4, cfg.mel_bins)),
                         decoder_input_ids=jnp.zeros((1, 3), jnp.int32))
        ref_flat = jax.tree_util.tree_leaves_with_path(ref['params'])
        got_flat = dict(jax.tree_util.tree_leaves_with_path(params))
        for path, leaf in ref_flat:
            assert path in got_flat, path
            assert got_flat[path].shape == leaf.shape, path
