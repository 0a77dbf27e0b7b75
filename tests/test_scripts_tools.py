"""Tests for prep/analysis scripts, the T5X converter, and adversarial ops."""

import json
import os
import sys

import numpy as np
import pytest

from mr_mt3_tpu.codec.note_sequences import NoteSequence
from mr_mt3_tpu.midi import midi_file_to_note_sequence, note_sequence_to_midi_file, read_midi


class TestMergeSlakh:
    def test_merge(self, tmp_path):
        from mr_mt3_tpu.scripts.merge_slakh_midi import merge_song_midis
        song = tmp_path / 'Track1'
        (song / 'MIDI').mkdir(parents=True)
        for i, program in enumerate([0, 33]):
            ns = NoteSequence()
            ns.add_note(pitch=60 + i, velocity=100, start_time=0.0,
                        end_time=1.0, program=program, instrument=0)
            ns.total_time = 1.0
            note_sequence_to_midi_file(ns, song / 'MIDI' / f'S{i}.mid')
        out = merge_song_midis(str(song))
        merged = read_midi(out)
        assert len(merged.instruments) == 2
        assert sorted(i.program for i in merged.instruments) == [0, 33]


class TestGenerateInstNames:
    def test_mapping_and_json(self, tmp_path):
        import yaml

        from mr_mt3_tpu.scripts.generate_inst_names import (
            find_inst_name,
            main,
        )
        assert find_inst_name(True, 0) == 'Drums'
        assert find_inst_name(False, 0) == 'Acoustic Piano'
        assert find_inst_name(False, 27) == 'Clean Electric Guitar'
        assert find_inst_name(False, 100) == 'Synth Pad'

        song = tmp_path / 'TrackX'
        song.mkdir()
        meta = {'stems': {
            'S00': {'is_drum': False, 'program_num': 0,
                    'integrated_loudness': -10.0},
            'S01': {'is_drum': True, 'program_num': 0,
                    'integrated_loudness': -12.0},
            'S02': {'is_drum': False, 'program_num': 40,
                    'integrated_loudness': None},
        }}
        with open(song / 'metadata.yaml', 'w') as f:
            yaml.safe_dump(meta, f)
        main(str(tmp_path))
        names = json.load(open(song / 'inst_names.json'))
        assert names == {'S00': 'Acoustic Piano', 'S01': 'Drums'}


class TestNSynthScripts:
    def test_convert_parse_evaluate(self, tmp_path):
        from mr_mt3_tpu.scripts.convert_nsynth_json_to_midi import main
        from mr_mt3_tpu.scripts.evaluate_nsynth_json import evaluate
        from mr_mt3_tpu.scripts.parse_nsynth_valid import parse

        examples = {
            'guitar_acoustic_000-060-100': {
                'pitch': 60, 'velocity': 100,
                'instrument_family_str': 'guitar'},
            'vocal_synthetic_001-062-050': {
                'pitch': 62, 'velocity': 50,
                'instrument_family_str': 'string'},
        }
        with open(tmp_path / 'examples.json', 'w') as f:
            json.dump(examples, f)
        main(str(tmp_path))
        mids = os.listdir(tmp_path / 'midi')
        assert mids == ['guitar_acoustic_000-060-100.mid']  # vocal skipped
        ns = midi_file_to_note_sequence(tmp_path / 'midi' / mids[0])
        assert ns.notes[0].pitch == 60
        assert ns.notes[0].program == 24
        assert ns.notes[0].start_time == pytest.approx(0.05, abs=0.003)

        result = parse(str(tmp_path / 'examples.json'),
                       str(tmp_path / 'midi' / '*.mid'))
        entry = result['guitar_acoustic_000-060-100']
        assert entry['expected_instrument'] == 'guitar'
        assert entry['predicted']['events'][0]['instrument'] == 'guitar'
        assert 60 in entry['predicted']['events'][0]['pitch']

        scores = evaluate(result)
        assert scores['instrument_acc'] == 1.0
        assert scores['pitch_acc'] == 1.0


class TestInstrumentLeakage:
    def test_presence_f1(self, tmp_path):
        from mr_mt3_tpu.scripts.instrument_leakage import (
            instrument_presence_f1,
        )
        gt = tmp_path / 'gt'
        pred = tmp_path / 'pred'
        for song in ['A', 'B']:
            (gt / song).mkdir(parents=True)
            (pred / song).mkdir(parents=True)
            ns = NoteSequence()
            for i, program in enumerate([0, 33]):
                ns.add_note(pitch=60, velocity=100, start_time=0.0,
                            end_time=1.0, program=program, instrument=i)
            ns.total_time = 1.0
            note_sequence_to_midi_file(ns, gt / song / 'all_src_v2.mid')
            # prediction has one extra spurious program
            ns2 = NoteSequence()
            for i, program in enumerate([0, 33, 50]):
                ns2.add_note(pitch=60, velocity=100, start_time=0.0,
                             end_time=1.0, program=program, instrument=i)
            ns2.total_time = 1.0
            note_sequence_to_midi_file(ns2, pred / song / 'mix.mid')
        stats = instrument_presence_f1(str(pred), str(gt))
        assert stats['recall'] == 1.0
        assert stats['precision'] == pytest.approx(2 / 3)
        assert stats['avg_num_instruments'] == 3.0


class TestT5XConverter:
    def test_roundtrip_structure(self):
        import jax
        import jax.numpy as jnp

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                        'tools'))
        from convert_weight import t5x_to_flax_params

        from mr_mt3_tpu.models import MT3, MT3Config
        cfg = MT3Config(num_encoder_layers=2, num_decoder_layers=2)
        model = MT3(cfg)
        ref = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 4, cfg.mel_bins)),
                         decoder_input_ids=jnp.zeros((1, 3), jnp.int32))

        # fabricate a t5x flat dict with the right shapes
        rng = np.random.default_rng(0)
        flat = {}

        def fill(name, shape):
            flat[name] = rng.normal(size=shape).astype(np.float32)

        for i in range(2):
            lyr = f'layers_{i}'
            for proj, shape in [('query', (512, 384)), ('key', (512, 384)),
                                ('value', (512, 384)), ('out', (384, 512))]:
                fill(f'target/encoder/{lyr}/attention/{proj}/kernel', shape)
                fill(f'target/decoder/{lyr}/self_attention/{proj}/kernel',
                     shape)
                fill(f'target/decoder/{lyr}/encoder_decoder_attention/'
                     f'{proj}/kernel', shape)
            for w, shape in [('wi_0', (512, 1024)), ('wi_1', (512, 1024)),
                             ('wo', (1024, 512))]:
                fill(f'target/encoder/{lyr}/mlp/{w}/kernel', shape)
                fill(f'target/decoder/{lyr}/mlp/{w}/kernel', shape)
            for norm in ['pre_attention_layer_norm']:
                fill(f'target/encoder/{lyr}/{norm}/scale', (512,))
            fill(f'target/encoder/{lyr}/pre_mlp_layer_norm/scale', (512,))
            fill(f'target/decoder/{lyr}/pre_self_attention_layer_norm/scale',
                 (512,))
            fill(f'target/decoder/{lyr}/pre_cross_attention_layer_norm/scale',
                 (512,))
            fill(f'target/decoder/{lyr}/pre_mlp_layer_norm/scale', (512,))
        fill('target/encoder/encoder_norm/scale', (512,))
        fill('target/decoder/decoder_norm/scale', (512,))
        fill('target/encoder/continuous_inputs_projection/kernel', (512, 512))
        fill('target/decoder/token_embedder/embedding', (1536, 512))
        fill('target/decoder/logits_dense/kernel', (512, 1536))

        params = t5x_to_flax_params(flat, num_layers=2)
        ref_paths = dict(jax.tree_util.tree_leaves_with_path(ref['params']))
        got_paths = dict(jax.tree_util.tree_leaves_with_path(params))
        assert set(ref_paths) == set(got_paths)
        for path, leaf in ref_paths.items():
            assert got_paths[path].shape == leaf.shape, path
        # values pass through untransposed (t5x kernels are (in, out))
        np.testing.assert_array_equal(
            params['proj']['kernel'],
            flat['target/encoder/continuous_inputs_projection/kernel'])


class TestT5XConverterEndToEnd:
    def test_pickle_to_orbax_forward_parity(self, tmp_path):
        """Full converter run (pickled T5X tree -> Orbax) and load through
        test.py's checkpoint path; logits must match the identical weights
        round-tripped through the reference torch .pth format
        (reference layout being reversed: tools/convert_weight.py:36-97)."""
        import pickle

        import jax
        import jax.numpy as jnp
        import torch

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                        'tools'))
        import convert_weight

        from mr_mt3_tpu.models import MT3, MT3Config
        from mr_mt3_tpu.utils import builders
        from mr_mt3_tpu.utils.checkpoint_import import (
            export_to_torch_state_dict,
        )

        cfg = MT3Config(vocab_size=1536, d_model=32, d_kv=8, d_ff=48,
                        num_heads=4, num_encoder_layers=2,
                        num_decoder_layers=2, mel_bins=512, dropout_rate=0.0)
        model = MT3(cfg)
        variables = model.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, 8, cfg.mel_bins)),
                               decoder_input_ids=jnp.zeros((1, 4), jnp.int32))
        params = jax.tree.map(np.asarray, variables['params'])

        # leg 1: torch .pth round trip (the reference's own export format)
        pth = tmp_path / 'weights.pth'
        torch.save({k: torch.from_numpy(np.array(v)) for k, v in
                    export_to_torch_state_dict(params, cfg).items()},
                   str(pth))
        params_torch, _ = builders.load_weights(str(pth), model)

        # strict load passes on a complete checkpoint and catches holes
        builders.load_weights(str(pth), model, strict=True)
        blob = torch.load(str(pth), weights_only=False)
        blob.pop('lm_head.weight')
        pth_holed = tmp_path / 'holed.pth'
        torch.save(blob, str(pth_holed))
        builders.load_weights(str(pth_holed), model)  # lenient: fine
        with pytest.raises(ValueError, match='lm_head'):
            builders.load_weights(str(pth_holed), model, strict=True)

        # leg 2: T5X-layout pickle -> convert_weight.main -> Orbax
        flat = {}
        for i in range(2):
            blk, lyr = f'block_{i}', f'layers_{i}'
            for sub_m, sub_t in (('q', 'query'), ('k', 'key'),
                                 ('v', 'value'), ('o', 'out')):
                flat[f'target/encoder/{lyr}/attention/{sub_t}/kernel'] = \
                    params['encoder'][blk]['self_attn'][sub_m]['kernel']
                flat[f'target/decoder/{lyr}/self_attention/{sub_t}/'
                     'kernel'] = \
                    params['decoder'][blk]['self_attn'][sub_m]['kernel']
                flat[f'target/decoder/{lyr}/encoder_decoder_attention/'
                     f'{sub_t}/kernel'] = \
                    params['decoder'][blk]['cross_attn'][sub_m]['kernel']
            for w in ('wi_0', 'wi_1', 'wo'):
                flat[f'target/encoder/{lyr}/mlp/{w}/kernel'] = \
                    params['encoder'][blk]['ff'][w]['kernel']
                flat[f'target/decoder/{lyr}/mlp/{w}/kernel'] = \
                    params['decoder'][blk]['ff'][w]['kernel']
            flat[f'target/encoder/{lyr}/pre_attention_layer_norm/scale'] = \
                params['encoder'][blk]['self_norm']['weight']
            flat[f'target/encoder/{lyr}/pre_mlp_layer_norm/scale'] = \
                params['encoder'][blk]['ff_norm']['weight']
            flat[f'target/decoder/{lyr}/pre_self_attention_layer_norm/'
                 'scale'] = params['decoder'][blk]['self_norm']['weight']
            flat[f'target/decoder/{lyr}/pre_cross_attention_layer_norm/'
                 'scale'] = params['decoder'][blk]['cross_norm']['weight']
            flat[f'target/decoder/{lyr}/pre_mlp_layer_norm/scale'] = \
                params['decoder'][blk]['ff_norm']['weight']
        flat['target/encoder/encoder_norm/scale'] = \
            params['encoder']['final_norm']['weight']
        flat['target/decoder/decoder_norm/scale'] = \
            params['decoder']['final_norm']['weight']
        flat['target/encoder/continuous_inputs_projection/kernel'] = \
            params['proj']['kernel']
        flat['target/decoder/token_embedder/embedding'] = \
            params['token_embed']['embedding']
        flat['target/decoder/logits_dense/kernel'] = \
            params['lm_head']['kernel']
        # a state/ subtree the converter must skip, as in real T5X dumps
        flat['state/param_states/step'] = np.zeros((), np.int32)

        nested = {}
        for key, value in flat.items():
            node = nested
            parts = key.split('/')
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = np.asarray(value)
        pk = tmp_path / 't5x_state.pk'
        with open(pk, 'wb') as f:
            pickle.dump(nested, f)

        out_dir = tmp_path / 'converted'
        convert_weight.main(str(pk), str(out_dir))
        params_t5x, step = builders.load_weights(str(out_dir), model)
        assert step == 0

        mel = np.random.default_rng(2).normal(
            size=(2, 8, cfg.mel_bins)).astype(np.float32)
        dec = np.array([[0, 5, 9, 1], [0, 7, 2, 1]], np.int32)

        def logits(p):
            return np.asarray(model.apply(
                {'params': p}, jnp.asarray(mel),
                decoder_input_ids=jnp.asarray(dec)))

        base = logits(params)
        np.testing.assert_allclose(logits(params_t5x), base, atol=1e-6)
        np.testing.assert_allclose(logits(params_torch), base, atol=1e-5)


class TestAdversarial:
    def test_fgsm_and_pgd(self):
        import jax
        import jax.numpy as jnp

        from mr_mt3_tpu.models import MT3, MT3Config
        from mr_mt3_tpu.models.adversarial import fgsm, pgd_linf
        from mr_mt3_tpu.train.losses import cross_entropy_loss

        cfg = MT3Config(vocab_size=64, d_model=16, d_kv=4, d_ff=24,
                        num_heads=4, num_encoder_layers=1,
                        num_decoder_layers=1, mel_bins=8, dropout_rate=0.0)
        model = MT3(cfg)
        inputs = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 6, 8)).astype(np.float32))
        labels = jnp.asarray(np.random.default_rng(1).integers(
            3, 60, (2, 5)))
        variables = model.init(jax.random.PRNGKey(0), inputs,
                               decoder_input_ids=jnp.zeros((1, 3), jnp.int32))
        delta = fgsm(model, variables, inputs, labels, epsilon=0.1)
        assert delta.shape == inputs.shape
        vals = np.abs(np.asarray(delta))
        assert np.all((vals < 1e-6) | (np.abs(vals - 0.1) < 1e-6))
        delta2 = pgd_linf(model, variables, inputs, labels, epsilon=0.05,
                          alpha=0.02, num_iter=3)
        assert np.abs(np.asarray(delta2)).max() <= 0.05 + 1e-6

        def loss(x):
            logits = model.apply(variables, x, labels=labels,
                                 deterministic=True)
            return float(cross_entropy_loss(logits, labels))
        # adversarial perturbation should (almost surely) not reduce loss
        assert loss(inputs + delta) >= loss(inputs) - 1e-3


class TestRoundArtifactHelpers:
    """Regressions for the round-artifact logic (bench.py ladder,
    __graft_entry__ device-count flag, baseline fit) that runs outside
    the package."""

    @staticmethod
    def _root_import(name):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
        return __import__(name)

    def test_decode_ladder_off_tpu_goes_straight_to_bf16(self):
        # Off-TPU the megakernel tiers would run in Pallas interpret mode
        # (hours per rep) instead of failing; they must not be in the ladder.
        bench = self._root_import('bench')
        assert [q for q, _, _ in bench.decode_ladder(False)] == ['none']
        assert ([q for q, _, _ in bench.decode_ladder(True)]
                == ['fused_int4', 'fused', 'none'])
        # the exact bf16 XLA path is always the last rung
        for on_tpu in (False, True):
            quant, batch, mode = bench.decode_ladder(on_tpu)[-1]
            assert quant == 'none' and mode.startswith('bf16')

    def test_device_count_flag_is_replaced_not_just_detected(self):
        g = self._root_import('__graft_entry__')
        flag = '--xla_force_host_platform_device_count'
        assert g._with_device_count('', 8) == f'{flag}=8'
        # a stale count (inherited env or an earlier dryrun) is replaced
        assert g._with_device_count(f'{flag}=4', 8) == f'{flag}=8'
        assert (g._with_device_count(f'--a {flag}=16 --b', 8)
                == f'--a {flag}=8 --b')
        assert g._with_device_count('--a', 8) == f'--a {flag}=8'

    def test_baseline_fit_recovers_quadratic_and_clamps(self):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                        'tools'))
        from measure_torch_baseline import fit_and_integrate
        ns = [32, 128, 384, 768, 1024]

        # exact quadratic data -> coefficients and integral recovered
        a0, b0, c0 = 0.1, 2e-3, 1e-6
        cs = [a0 + b0 * n + c0 * n * n for n in ns]
        a, b, c, total = fit_and_integrate(ns, cs)
        expect = sum(a0 + b0 * n + c0 * n * n for n in range(1, 1025))
        np.testing.assert_allclose([a, b, c], [a0, b0, c0], rtol=1e-6)
        np.testing.assert_allclose(total, expect, rtol=1e-6)

        # a fit with negative low-n predictions is clamped at zero, so the
        # clamped total can only exceed the raw (negative-including) sum
        a0 = -0.1
        cs = [a0 + b0 * n + c0 * n * n for n in ns]
        a, b, c, total = fit_and_integrate(ns, cs)
        raw = sum(a0 + b0 * n + c0 * n * n for n in range(1, 1025))
        clamped = sum(max(a0 + b0 * n + c0 * n * n, 0.0)
                      for n in range(1, 1025))
        assert total > raw
        np.testing.assert_allclose(total, clamped, rtol=1e-6)
