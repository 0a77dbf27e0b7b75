"""Config-system tests + end-to-end CLI train/test runs on the fixture."""

import json
import os
import sys

import numpy as np
import pytest

from mr_mt3_tpu.utils.config import load_config, parse_cli

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')


class TestConfigSystem:
    def test_defaults_and_choices(self):
        cfg = load_config(CONFIG_DIR, 'config')
        assert cfg.model_type == 'MT3Net'
        assert cfg.dataset_type == 'Slakh'
        assert cfg.model.config.d_model == 512
        assert cfg.dataset.train.mel_length == 256

    def test_interpolation(self):
        cfg = load_config(CONFIG_DIR, 'config',
                          overrides=['mel_length=128'])
        assert cfg.dataset.train.mel_length == 128
        assert cfg.optim.num_epochs == cfg.num_epochs
        assert cfg.out_dir == 'runs/MT3Net_Slakh'

    def test_group_swap(self):
        cfg = load_config(CONFIG_DIR, 'config_slakh_segmem',
                          overrides=['model=MT3NetSegMemV2WithPrev',
                                     'dataset=SlakhPrev',
                                     'model_segmem_length=64'])
        assert cfg.model_type == 'MT3NetSegMemV2WithPrev'
        assert cfg.model.segmem_variant == 'encoder_append'
        assert cfg.model.segmem_length == 64
        assert 'SlakhDatasetWithPrevSegmem' in cfg.dataset.train._target_

    def test_dotted_override(self):
        cfg = load_config(CONFIG_DIR, 'config',
                          overrides=['optim.lr=1e-3',
                                     'model.config.num_layers=2'])
        assert cfg.optim.lr == 1e-3
        assert cfg.model.config.num_layers == 2

    def test_hydra_add_and_delete_prefixes(self):
        # the reference's own test.sh uses '+eval.load_weights_strict=False'
        # (hydra add-new-key); '~key' deletes, '++' force-adds
        cfg = load_config(CONFIG_DIR, 'config_slakh_segmem',
                          overrides=['+eval.load_weights_strict=False',
                                     '++eval.forced=7',
                                     '~eval.is_sanity_check'])
        assert cfg.eval.load_weights_strict is False
        assert cfg.eval.forced == 7
        assert 'is_sanity_check' not in cfg.eval
        assert '+eval' not in cfg

    def test_parse_cli(self):
        name, cdir, ovs = parse_cli(
            ['--config-name=config_slakh_segmem', 'model=X', 'a.b=3',
             '~c.d'])
        assert name == 'config_slakh_segmem'
        assert cdir is None
        assert ovs == ['model=X', 'a.b=3', '~c.d']

    def test_delete_with_value_prefix(self):
        # hydra's '~key=value' delete-with-value form must delete the key,
        # not create a literal '~key' entry
        cfg = load_config(CONFIG_DIR, 'config',
                          overrides=['~eval.is_sanity_check=false'])
        assert 'is_sanity_check' not in cfg.eval
        assert '~eval' not in cfg

    def test_all_reference_root_configs_load(self):
        """Every reference root config has a mirror, including
        config_slakh_f1_0.65 — the config the reference's FIRST train and
        test commands use (reference train.sh:5, test.sh:4)."""
        for name in ['config', 'config_slakh_f1_0.65',
                     'config_slakh_segmem', 'config_slakh_segmem_finetune',
                     'config_commu']:
            cfg = load_config(CONFIG_DIR, name)
            assert cfg.model.config.vocab_size == 1536, name
        f1 = load_config(CONFIG_DIR, 'config_slakh_f1_0.65')
        # the long-run hyperparameters that distinguish it (reference
        # config/config_slakh_f1_0.65.yaml)
        assert f1.num_epochs == 800
        assert float(f1.optim.lr) == 2e-4
        assert f1.optim.warmup_steps == 64500
        assert f1.num_rows_per_batch == 12
        assert f1.eval.eval_first_n_examples == 3

    def test_all_reference_model_configs_load(self):
        for model in ['MT3Net', 'MT3NetWeightedLoss', 'MT3NetSegMem',
                      'MT3NetSegMemV2', 'MT3NetSegMemV2WithPrev',
                      'MT3NetSegMemV2WithPrevFineTune']:
            cfg = load_config(CONFIG_DIR, 'config_slakh_segmem',
                              overrides=[f'model={model}'])
            assert cfg.model.config.vocab_size == 1536
            assert cfg.model.task.loss in ('ce', 'weighted')

    def test_devices_override_forms(self):
        """The reference passes Lightning device forms (train.sh:6
        `devices=[0,1]`, config.yaml:2 `devices: 1`); both normalize to a
        data-axis size, null/-1 to 'all visible'."""
        from mr_mt3_tpu.parallel import device_cap, make_mesh
        cfg = load_config(CONFIG_DIR, 'config', overrides=['devices=[0,1]'])
        assert device_cap(cfg.get('devices')) == 2
        cfg = load_config(CONFIG_DIR, 'config', overrides=['devices=3'])
        assert device_cap(cfg.get('devices')) == 3
        cfg = load_config(CONFIG_DIR, 'config')
        assert device_cap(cfg.get('devices')) is None
        assert device_cap(-1) is None and device_cap([]) is None
        # and the cap actually sizes the mesh's data axis
        mesh = make_mesh(data=device_cap([0, 1]), model=1)
        assert dict(mesh.shape) == {'data': 2, 'model': 1}

    def test_builders_model_variants(self):
        from mr_mt3_tpu.utils import builders
        cfg = load_config(CONFIG_DIR, 'config_slakh_segmem',
                          overrides=['model=MT3NetSegMemV2WithPrev'])
        model = builders.build_model(cfg)
        assert model.cfg.segmem_variant == 'encoder_append'
        assert model.cfg.num_encoder_layers == 8
        cfg2 = load_config(CONFIG_DIR, 'config')
        model2 = builders.build_model(cfg2)
        assert model2.cfg.segmem_variant is None


TINY_OVERRIDES = [
    'model.config.d_model=32', 'model.config.d_kv=8',
    'model.config.d_ff=48', 'model.config.num_heads=4',
    'model.config.num_layers=1', 'model.config.num_decoder_layers=1',
    'num_epochs=1', 'optim.warmup_steps=2', 'optim.num_steps_per_epoch=2',
    'dataloader.train.num_workers=2', 'dataloader.val.num_workers=1',
    'trainer.log_every_n_steps=1',
]


class TestBuildOptimizer:
    def test_null_warmup_and_min_lr_mean_zero(self):
        """`warmup_steps: null` / `min_lr: null` behave like 0 instead of
        crashing with a TypeError in the schedule construction (the
        optimizer path already guarded None; the logged schedule didn't)."""
        from mr_mt3_tpu.utils import builders
        cfg = load_config(CONFIG_DIR, 'config', overrides=TINY_OVERRIDES + [
            'optim.warmup_steps=null', 'optim.min_lr=null'])
        optimizer, schedule = builders.build_optimizer(cfg)
        assert optimizer is not None
        # no warmup: the schedule starts at full base LR (cosine at 0)
        assert float(schedule(0)) == pytest.approx(float(cfg.optim.lr))

    def test_clip_norm_override_clips_updates(self):
        """`+optim.clip_norm=...` from the CLI must actually wire a
        global-norm clip into the optimizer (divergence guard — see
        optim.make_optimizer)."""
        import jax.numpy as jnp

        from mr_mt3_tpu.utils import builders
        cfg = load_config(CONFIG_DIR, 'config', overrides=TINY_OVERRIDES + [
            '+optim.clip_norm=1e-6', 'optim.warmup_steps=0'])
        optimizer, _ = builders.build_optimizer(cfg)
        params = {'w': jnp.ones((4,))}
        opt_state = optimizer.init(params)
        big_grads = {'w': jnp.full((4,), 1e3)}
        updates, _ = optimizer.update(big_grads, opt_state, params)
        # with clip 1e-6 the gradient is scaled to ~0 before Adam's
        # normalization, so the update (eps-dominated) is far below the
        # unclipped Adam step size (~lr)
        assert float(jnp.abs(updates['w']).max()) < float(cfg.optim.lr)

        cfg_off = load_config(CONFIG_DIR, 'config',
                              overrides=TINY_OVERRIDES + [
                                  'optim.warmup_steps=0'])
        opt_off, _ = builders.build_optimizer(cfg_off)
        updates_off, _ = opt_off.update(big_grads, opt_off.init(params),
                                        params)
        assert float(jnp.abs(updates_off['w']).max()) > \
            float(jnp.abs(updates['w']).max())


class TestStrictWeightLoad:
    def test_unexpected_keys_rejected(self):
        """Strict load errors on checkpoint leaves the model does not
        expect (torch load_state_dict(strict=True) semantics)."""
        import jax.numpy as jnp

        from mr_mt3_tpu.utils import builders
        cfg = load_config(CONFIG_DIR, 'config', overrides=TINY_OVERRIDES)
        model = builders.build_model(cfg)
        params = builders.init_params(model, seed=0)
        builders.check_param_coverage(params, model)  # clean tree passes
        extra = dict(params)
        extra['bogus_layer'] = {'kernel': jnp.zeros((2, 2))}
        with pytest.raises(ValueError, match='unexpected'):
            builders.check_param_coverage(extra, model)

    def test_missing_keys_rejected(self):
        from mr_mt3_tpu.utils import builders
        cfg = load_config(CONFIG_DIR, 'config', overrides=TINY_OVERRIDES)
        model = builders.build_model(cfg)
        params = builders.init_params(model, seed=0)
        partial = {k: v for k, v in params.items() if k != 'lm_head'}
        with pytest.raises(ValueError, match='missing'):
            builders.check_param_coverage(partial, model)

    def test_testpy_defaults_to_nonstrict_load(self, monkeypatch, tmp_path):
        """When eval.load_weights_strict is unset, test.py must load
        NON-strictly (reference test.py:107-110 falls back to
        strict=False)."""
        import test as test_cli

        import mr_mt3_tpu.infer.scores as scores_mod
        from mr_mt3_tpu.utils import builders
        seen = {}

        def fake_load(path, model, like_params=None, strict=False):
            seen['strict'] = strict
            return {}, 0

        monkeypatch.setattr(builders, 'load_weights', fake_load)
        monkeypatch.setattr(scores_mod, 'get_scores',
                            lambda **kw: {'Onset F1': 0.0})
        argv = [
            '--config-name=config',
            f'path={tmp_path}/nonexistent',
            'eval.exp_tag_name=out',
            f'eval.audio_dir={tmp_path}/*.wav',
            'eval.midi_dir=gt',
        ] + TINY_OVERRIDES
        test_cli.main(argv)
        assert seen['strict'] is False
        test_cli.main(argv + ['+eval.load_weights_strict=True'])
        assert seen['strict'] is True


@pytest.mark.slow
class TestCliEndToEnd:
    def test_train_then_test(self, tmp_path, slakh_root):
        import test as test_cli
        import train as train_cli

        out_dir = tmp_path / 'run'
        argv = [
            '--config-name=config',
            f'dataset.train.root_dir={slakh_root}',
            f'dataset.val.root_dir={slakh_root}',
            f'dataset.test.root_dir={slakh_root}',
            f'out_dir={out_dir}',
            'split_frame_length=256',
            'num_rows_per_batch=2',
        ] + TINY_OVERRIDES
        train_cli.main(argv)

        # resume from the full-state checkpoint: the opt_state probe must
        # detect it from the on-disk tree metadata (not a full restore)
        # and take the resumed-state path
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            train_cli.main(argv + [
                f'path={out_dir}/checkpoints/last',
                f'out_dir={tmp_path}/resumed',
                'devices=[0,1]'])  # the reference's list form (train.sh:6)
        assert 'resumed full state' in buf.getvalue()
        # devices=[0,1] capped the data axis at 2 of the 8 test devices
        assert "train mesh: {'data': 2, 'model': 1}" in buf.getvalue()

        ckpt = out_dir / 'checkpoints' / 'final'
        assert ckpt.exists()
        metrics = (out_dir / 'logs' / 'metrics.jsonl').read_text()
        assert 'train_loss' in metrics and 'val_loss' in metrics

        midi_out = tmp_path / 'test_midis'
        test_argv = [
            '--config-name=config',
            f'path={ckpt}',
            f'dataset.test.root_dir={slakh_root}',
            f'eval.audio_dir={slakh_root}/*/mix_16k.wav',
            f'eval.exp_tag_name={midi_out}',
            f'eval.midi_dir={slakh_root}',
            'eval.eval_dataset=Slakh',
            'eval.batch_size=2',
        ] + TINY_OVERRIDES
        # fixture ground truth is per-stem; build all_src_v2.mid like
        # midi_script.py would
        from mr_mt3_tpu.scripts.merge_slakh_midi import merge_song_midis
        for song in os.listdir(slakh_root):
            merge_song_midis(os.path.join(slakh_root, song))
        scores = test_cli.main(test_argv)
        assert 'Onset F1' in scores
        assert (midi_out / 'Track00001' / 'mix.mid').exists()


@pytest.mark.slow
class TestCliCommuEndToEnd:
    def test_commu_train_then_test(self, tmp_path, commu_root):
        """Full ComMU flow through the real CLIs: single-track dataset,
        {name}.mid output layout, ComMU eval pairing
        (reference: test.py:46-56, config paths in config_commu)."""
        import test as test_cli
        import train as train_cli

        out_dir = tmp_path / 'commu_run'
        val_root = commu_root  # reuse train split as val for the fixture
        argv = [
            '--config-name=config_commu',
            f'dataset.train.root_dir={commu_root}',
            f'dataset.val.root_dir={val_root}',
            f'out_dir={out_dir}',
            'num_rows_per_batch=2',
        ] + TINY_OVERRIDES
        train_cli.main(argv)
        ckpt = out_dir / 'checkpoints' / 'final'
        assert ckpt.exists()

        midi_out = tmp_path / 'commu_midis'
        gt_dir = str(commu_root).replace('commu_audio_v2', 'commu_midi_v2')
        scores = test_cli.main([
            '--config-name=config_commu',
            f'path={ckpt}',
            f'dataset.test.root_dir={gt_dir}',
            f'eval.audio_dir={commu_root}/*.wav',
            f'eval.exp_tag_name={midi_out}',
            f'eval.midi_dir={gt_dir}',
            'eval.eval_dataset=ComMU',
            'eval.batch_size=2',
        ] + TINY_OVERRIDES)
        assert 'Onset F1' in scores
        assert (midi_out / 'commu00001_16k.mid').exists()


@pytest.mark.slow
class TestCliNSynthEval:
    def test_nsynth_eval_filters_and_scores(self, tmp_path):
        """NSynth eval through the real CLI: per-clip {name}.mid outputs,
        the vocal/mallet filename filter, and the 50 ms leading pad
        (reference: test.py:38-39,117-119)."""
        import test as test_cli

        from mr_mt3_tpu.audio import write_wav
        from mr_mt3_tpu.codec import note_sequences as nsq
        from mr_mt3_tpu.midi import note_sequence_to_midi_file

        wav_dir = tmp_path / 'nsynth_wav'
        gt_dir = tmp_path / 'nsynth_gt'
        wav_dir.mkdir()
        gt_dir.mkdir()
        rng = np.random.default_rng(0)
        names = ['guitar_acoustic_000-060-100',
                 'keyboard_electronic_001-064-075']
        for name in names + ['vocal_synthetic_002-062-050']:
            audio = (rng.normal(size=16000 * 4) * 0.05).astype(np.float32)
            write_wav(wav_dir / f'{name}.wav', audio, 16000)
        for name in names:  # GT only for the non-filtered clips
            ns = nsq.NoteSequence()
            pitch = int(name.split('-')[1])
            ns.add_note(start_time=0.05, end_time=4.0, pitch=pitch,
                        velocity=100, program=24, is_drum=False,
                        instrument=0)
            ns.total_time = 4.0
            note_sequence_to_midi_file(ns, gt_dir / f'{name}.mid')

        # random-weight checkpoint (eval plumbing, not quality)
        import orbax.checkpoint as ocp

        from mr_mt3_tpu.utils import builders
        from mr_mt3_tpu.utils.config import load_config
        cfg = load_config(CONFIG_DIR, 'config', overrides=TINY_OVERRIDES)
        model = builders.build_model(cfg)
        params = builders.init_params(model, seed=0)
        ckpt = tmp_path / 'ckpt'
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(str(ckpt), {'params': params,
                               'step': np.zeros((), np.int32)}, force=True)
        ckptr.wait_until_finished()

        midi_out = tmp_path / 'nsynth_midis'
        scores = test_cli.main([
            '--config-name=config',
            f'path={ckpt}',
            f'eval.audio_dir={wav_dir}/*.wav',
            f'eval.exp_tag_name={midi_out}',
            f'eval.midi_dir={gt_dir}',
            'eval.eval_dataset=NSynth',
            'eval.batch_size=2',
        ] + TINY_OVERRIDES)
        assert 'Onset F1' in scores
        produced = sorted(os.listdir(midi_out))
        assert produced == [f'{n}.mid' for n in sorted(names)], \
            f'vocal clip not filtered: {produced}'


@pytest.mark.skipif(not os.path.isdir('/root/reference'),
                    reason='reference tree not mounted')
class TestReferenceLaunchCommands:
    def test_every_reference_command_resolves(self):
        """Every python3 train.py/test.py invocation in the reference's
        train.sh and test.sh catalogs resolves through our config system
        and builds its model — the MIGRATION.md claim that reference
        command lines work, checked exhaustively rather than per-sample."""
        import shlex

        from mr_mt3_tpu.utils import builders

        cmds = []
        for sh in ('/root/reference/train.sh', '/root/reference/test.sh'):
            text = open(sh).read().replace('\\\n', ' ')
            for line in text.splitlines():
                if line.lstrip().startswith('#'):
                    continue  # a retired (commented-out) catalog entry
                if 'python3' in line and ('train.py' in line
                                          or 'test.py' in line):
                    cmds.append(line)
        assert len(cmds) >= 10  # the catalogs are non-trivial
        for cmd in cmds:
            # hydra-style \= escapes inside ckpt names confuse shlex;
            # protect them, then restore. comments=True: the
            # continuation join can fold a trailing commented-out
            # override into the command — the shell would not pass it,
            # so neither must this parse
            cmd = cmd.replace('\\=', '\x00').rstrip().rstrip('\\')
            toks = [t.replace('\x00', '=')
                    for t in shlex.split(cmd, comments=True)]
            if not toks:
                continue
            # tokens before the script name are shell env assignments
            # (HYDRA_FULL_ERROR=1 OMP_NUM_THREADS=1 python3 train.py ...)
            # — the shell strips them from argv; everything AFTER the
            # script is argv and must pass through load_config verbatim,
            # including hydra/job_logging=disabled (the MIGRATION.md
            # accepted-and-ignored claim)
            script_i = next(i for i, t in enumerate(toks)
                            if t.endswith(('train.py', 'test.py')))
            toks = toks[script_i + 1:]
            config_name, overrides = 'config', []
            i = 0
            while i < len(toks):
                t = toks[i]
                if t.startswith('--config-name'):
                    if '=' in t:
                        config_name = t.split('=', 1)[1]
                    else:
                        i += 1
                        config_name = toks[i]
                elif t.startswith('--config-path') and '=' not in t:
                    i += 1
                elif '=' in t and not t.startswith('--'):
                    overrides.append(t)
                i += 1
            cfg = load_config(CONFIG_DIR, config_name, overrides)
            builders.build_model(cfg)  # the model choice instantiates


# reuse the corpus fixtures from test_data
from tests.test_data import commu_root, slakh_root  # noqa: E402,F401


class TestPackaging:
    def test_console_entry_points_resolve(self):
        """pyproject [project.scripts] must map to importable callables
        (pip install -e . exposes mr-mt3-train/test/serve)."""
        import importlib
        import re
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        text = open(os.path.join(root, 'pyproject.toml')).read()
        scripts = dict(re.findall(
            r'^(mr-mt3-\w+) = "([\w.:]+)"', text, re.M))
        assert set(scripts) == {'mr-mt3-train', 'mr-mt3-test',
                                'mr-mt3-serve'}
        for target in scripts.values():
            mod_name, func = target.split(':')
            mod = importlib.import_module(mod_name)
            assert callable(getattr(mod, func))
