"""Training entry point.

CLI mirrors the reference (reference: train.py, train.sh):

  python train.py --config-name=config_slakh_segmem \
      model=MT3NetSegMemV2WithPrev dataset=SlakhPrev \
      split_frame_length=2000 model_segmem_length=64 ...

Differences: checkpoints are Orbax directories (reference .pth/.pt torch
files still load for warm starts via `path=...`), and devices form a JAX
('data', 'model') mesh instead of Lightning DDP.
"""

import os
import sys

import jax
import numpy as np


def main(argv=None):
    from mr_mt3_tpu.utils.config import load_config, parse_cli
    config_name, config_dir, overrides = parse_cli(
        sys.argv[1:] if argv is None else argv)
    default_dir = os.environ.get('MR_MT3_CONFIGS') or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'configs')
    cfg = load_config(config_dir or default_dir, config_name, overrides)

    from mr_mt3_tpu.utils.profiling import (
        enable_compilation_cache,
        honor_platform_env,
    )
    # before any backend-initializing call (the multihost branch below
    # touches jax.process_index) — the axon plugin ignores the env var
    honor_platform_env()

    if bool(cfg.get('multihost')):
        # multi-process DCN training (one process per host): all hosts see
        # the global device set and the ('data','model') mesh spans the
        # slice; shardings in parallel/mesh.py are process-agnostic, and
        # jax.jit turns host-local batches into the global batch. The
        # reference's equivalent is Lightning spawning one proc per GPU
        # under DDP (reference: config/config.yaml:45).
        from mr_mt3_tpu.parallel import init_multihost
        init_multihost()
        print(f'multihost: process {jax.process_index()}/'
              f'{jax.process_count()}, {jax.device_count()} global devices')

    enable_compilation_cache()

    from mr_mt3_tpu.data import DataLoader
    from mr_mt3_tpu.parallel import device_cap, make_mesh, param_shardings
    from mr_mt3_tpu.train.trainer import (
        CheckpointPolicy,
        Trainer,
        create_train_state,
    )
    from mr_mt3_tpu.utils import builders

    seed = int(cfg.seed)
    np.random.seed(seed)

    model = builders.build_model(cfg)
    optimizer, schedule = builders.build_optimizer(cfg)
    train_ds, val_ds = builders.build_datasets(cfg)

    # multihost: each process loads a disjoint stride of the (identically
    # shuffled) batch list — the DDP-equivalent per-rank sampler
    shard = dict(shard_rank=jax.process_index(),
                 shard_count=jax.process_count())
    train_loader = DataLoader(
        train_ds, batch_size=int(cfg.dataloader.train.batch_size),
        num_workers=int(cfg.dataloader.train.num_workers) or 1,
        shuffle=True, seed=seed, **shard)
    val_loader = DataLoader(
        val_ds, batch_size=int(cfg.dataloader.val.batch_size),
        num_workers=max(1, int(cfg.dataloader.val.num_workers)),
        shuffle=False, seed=seed, **shard)

    # devices=<n>|[ids] caps the data axis (reference train.sh passes
    # devices=[0,1]); null spans every visible chip
    mesh = make_mesh(data=device_cap(cfg.get('devices')),
                     model=int(cfg.get('model_devices') or 1))
    print(f'train mesh: {dict(mesh.shape)}')
    out_dir = cfg.get('out_dir') or 'runs/default'

    eval_hook = None
    if cfg.eval.get('audio_dir'):
        import glob as globlib

        from mr_mt3_tpu.infer.scores import get_scores

        def eval_hook(params, epoch):
            files = sorted(globlib.glob(cfg.eval.audio_dir))
            if cfg.eval.eval_dataset == 'NSynth':
                # same filter test.py applies (no vocals/mallets in the
                # training vocab) so train-time and test-time F1 score
                # the identical file set
                files = [f for f in files
                         if 'vocal' not in f and 'mallet' not in f]
            if cfg.eval.get('eval_first_n_examples'):
                files = files[:int(cfg.eval.eval_first_n_examples)]
            scores = get_scores(
                model=model, variables={'params': params},
                eval_audio_dir=files,
                eval_dataset=cfg.eval.eval_dataset,
                exp_tag_name=os.path.join(out_dir, cfg.eval.exp_tag_name),
                ground_truth_midi_dir=cfg.eval.midi_dir,
                contiguous_inference=bool(
                    cfg.eval.get('contiguous_inference')),
                use_tf_spectral_ops=bool(
                    cfg.eval.get('use_tf_spectral_ops')),
                batch_size=int(cfg.eval.get('batch_size') or 8),
                max_length=int(cfg.eval.get('max_length') or 1024),
                verbose=False)
            return {
                'f1_flat': scores.get('Onset F1', 0.0),
                'f1_midi_class': scores.get(
                    'Onset + program F1 (midi_class)', 0.0),
                'f1_full': scores.get('Onset + program F1 (full)', 0.0),
            }

    mc = cfg.get('modelcheckpoint') or {}
    trainer = Trainer(
        model, optimizer,
        loss_type=cfg.model.task.loss,
        out_dir=out_dir,
        mesh=mesh,
        checkpoint_policy=CheckpointPolicy(
            monitor=mc.get('monitor', 'val_loss'),
            mode=mc.get('mode', 'min'),
            save_last=bool(mc.get('save_last', True)),
            save_top_k=int(mc.get('save_top_k', 5)),
            every_n_epochs=int(mc.get('every_n_epochs', 1) or 1)),
        log_every_n_steps=int(cfg.trainer.get('log_every_n_steps', 100)),
        check_val_every_n_epoch=int(
            cfg.trainer.get('check_val_every_n_epoch', 1) or 1),
        eval_hook=eval_hook,
        eval_after_num_epoch=int(cfg.eval.get('eval_after_num_epoch') or 0),
        eval_per_epoch=int(cfg.eval.get('eval_per_epoch') or 1),
        lr_schedule=schedule,
        seed=seed,
        bucket_targets=bool(cfg.trainer.get('bucket_targets', True)),
        # hardware-RNG dropout masks: 1.36x train throughput (PERF.md)
        fast_rng=bool(cfg.trainer.get('fast_rng', True)),
        # the in-jit mel must use the dataset's filterbank choice
        # (use_tf_spectral_ops), or training silently runs on different
        # features than the dataset was configured for
        spectrogram_config=getattr(train_ds, 'spectrogram_config', None))

    params = builders.init_params(model, seed)
    start_epoch = 0
    path = cfg.get('path')
    resumed_state = None
    if path:
        path = str(path)
        if os.path.isdir(path):
            # full resume when the checkpoint has optimizer state
            # (reference .ckpt semantics: train.py:62-76)
            import orbax.checkpoint as ocp
            # probe the on-disk TREE STRUCTURE only — a full targetless
            # restore here would materialize the entire checkpoint
            # (params + Adam moments, ~3x model size) in host memory
            # just to test for one key, then restore_state reads it all
            # again
            has_opt = False
            try:
                meta = ocp.StandardCheckpointer().metadata(
                    os.path.abspath(path))
                has_opt = 'opt_state' in meta.item_metadata.tree
            except Exception:
                try:
                    probe = ocp.StandardCheckpointer().restore(
                        os.path.abspath(path))
                    has_opt = probe is not None and 'opt_state' in probe
                except Exception:
                    has_opt = False
            if has_opt:
                base = create_train_state(
                    jax.device_put(params,
                                   param_shardings(params, mesh)),
                    optimizer)
                tmp_trainer_state = trainer.restore_state(
                    os.path.abspath(path), base)
                resumed_state = tmp_trainer_state
                steps_per_epoch = max(1, len(train_loader))
                start_epoch = int(resumed_state.step) // steps_per_epoch
                print(f'resumed full state from {path} '
                      f'(step {int(resumed_state.step)}, '
                      f'epoch {start_epoch})')
        if resumed_state is None:
            # warm start from weights only (.pth/.pt/orbax params).
            # NOTE: deliberately NO mel_norm special case for the
            # official mt3.pth here — the reference's train.py also
            # warm-starts it onto the dataset's normalized mels (the
            # mel_norm=False switch exists only in test.py:123); the
            # continual-training recipe relies on that exact setup
            loaded, step = builders.load_weights(path, model,
                                                 like_params=params)
            params = loaded
            print(f'loaded weights from {path} (step {step})')

    if resumed_state is not None:
        state = resumed_state
    else:
        params = jax.device_put(params, param_shardings(params, mesh))
        state = create_train_state(params, optimizer)

    num_epochs = int(cfg.trainer.max_epochs)
    state = trainer.fit(state, train_loader, val_loader,
                        num_epochs=num_epochs, start_epoch=start_epoch)
    trainer.save_checkpoint(state, 'final')
    print(f'saved final checkpoint under {trainer._ckpt_dir}/final')


if __name__ == '__main__':
    main()
