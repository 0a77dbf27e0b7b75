"""Shared builders wiring configs to models/optimizers/datasets.

Used by the train.py / test.py CLIs; keeps their logic symmetric with the
reference entry points (reference: train.py:27-60, test.py:92-110).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mr_mt3_tpu.models import MT3
from mr_mt3_tpu.models.config import config_from_dict
from mr_mt3_tpu.train.optim import make_optimizer
from mr_mt3_tpu.utils.config import ConfigNode, instantiate


def build_model(cfg: ConfigNode) -> MT3:
    """cfg.model -> MT3 module (segmem fields live in the model YAML)."""
    model_dict = cfg.model.config.to_dict()
    model_dict['segmem_variant'] = cfg.model.get('segmem_variant')
    model_dict['segmem_length'] = cfg.model.get('segmem_length', 64)
    model_dict['segmem_num_layers'] = cfg.model.get('segmem_num_layers', 1)
    # v2 seeds its decode memory with [EOS] only; with-prev adds the tie
    # token (reference: models/t5_segmem_v2.py:189-195 vs
    # t5_segmem_v2_with_prev.py:246-259)
    task = cfg.model.get('task') or {}
    if task.get('segmem') == 'v2':
        model_dict['segmem_seed'] = 'eos'
    # trainer.precision: 32 (reference default) or bf16 for bfloat16
    # activations with fp32 params/optimizer (mixed precision)
    precision = str((cfg.get('trainer') or {}).get('precision', '32'))
    if precision in ('bf16', 'bf16-mixed', 'bfloat16'):
        model_dict['dtype'] = 'bfloat16'
    return MT3(config_from_dict(model_dict))


def init_params(model: MT3, seed: int = 0):
    cfg = model.cfg
    kwargs = {}
    if cfg.has_segmem:
        kwargs['targets_prev'] = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, 8, cfg.mel_bins)),
        decoder_input_ids=jnp.zeros((1, 8), jnp.int32), **kwargs)
    return variables['params']


def build_optimizer(cfg: ConfigNode):
    task = cfg.model.task
    optim = cfg.optim
    use_schedule = bool(task.get('use_scheduler', True))
    total_steps = int(optim.num_steps_per_epoch) * int(optim.num_epochs)
    # optional global-norm gradient clip (`optim.clip_norm: 1.0`). Not a
    # reference config key (Lightning default = no clipping) so it
    # defaults off; from-scratch runs at peak LR > 2e-4 need it — see
    # make_optimizer's docstring for the measured divergence it guards.
    clip_norm = optim.get('clip_norm')
    clip_norm = None if clip_norm is None else float(clip_norm)
    if use_schedule:
        from mr_mt3_tpu.train.optim import cosine_schedule_with_warmup
        # built ONCE and passed into the optimizer: the same callable is
        # what the trainer logs, so the two can never drift (and
        # warmup_steps: null means 0, like min_lr)
        schedule = cosine_schedule_with_warmup(
            float(optim.lr), int(optim.warmup_steps or 0), total_steps,
            min_lr_multiplier=float(optim.min_lr or 0.0))
        optimizer = make_optimizer(
            lr=float(optim.lr), use_schedule=True, schedule=schedule,
            clip_norm=clip_norm)
    else:
        optimizer = make_optimizer(lr=float(optim.lr), use_schedule=False,
                                   clip_norm=clip_norm)
        schedule = None

    grad_accum = int(cfg.get('grad_accum') or 1)
    if grad_accum > 1:
        # gradient accumulation (reference: accumulate_grad_batches,
        # config/config.yaml:20,42)
        import optax
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=grad_accum)
    return optimizer, schedule


def build_datasets(cfg: ConfigNode):
    train_ds = instantiate(cfg.dataset.train, seed=int(cfg.seed))
    val_ds = instantiate(cfg.dataset.val, seed=int(cfg.seed) + 1,
                         shuffle=False)
    return train_ds, val_ds


def param_shapes(model: MT3):
    """Expected parameter tree of `model` as ShapeDtypeStructs (no device
    work — jax.eval_shape only)."""
    import jax
    import jax.numpy as jnp
    cfg = model.cfg
    kwargs = ({'targets_prev': jnp.zeros((1, 4), jnp.int32)}
              if cfg.has_segmem else {})
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, cfg.mel_bins)),
                           decoder_input_ids=jnp.zeros((1, 4), jnp.int32),
                           **kwargs))
    return shapes['params']


def check_param_coverage(params, model: MT3):
    """Raise if `params` is missing leaves the model needs, a loaded
    leaf's shape mismatches, or the checkpoint carries leaves the model
    does not expect — the strict-load check the reference gets from torch
    load_state_dict(strict=True) (reference test.py:105-110), which also
    errors on unexpected keys."""
    import jax
    expected = jax.tree.leaves_with_path(param_shapes(model))
    expected_paths = {path for path, _ in expected}
    loaded = dict(jax.tree.leaves_with_path(params))
    missing, mismatched = [], []
    for path, spec in expected:
        name = jax.tree_util.keystr(path)
        leaf = loaded.get(path)
        if leaf is None:
            missing.append(name)
        elif tuple(leaf.shape) != tuple(spec.shape):
            mismatched.append(f'{name}: checkpoint {tuple(leaf.shape)} '
                              f'vs model {tuple(spec.shape)}')
    unexpected = [jax.tree_util.keystr(path) for path in loaded
                  if path not in expected_paths]
    if missing or mismatched or unexpected:
        raise ValueError(
            'strict weight load failed\n'
            + (f'  missing: {", ".join(missing)}\n' if missing else '')
            + (f'  unexpected: {", ".join(sorted(unexpected))}\n'
               if unexpected else '')
            + (f'  shape mismatch: {"; ".join(mismatched)}'
               if mismatched else ''))


def load_weights(path: str, model: MT3, like_params=None,
                 strict: bool = False):
    """Load weights from a reference torch file (.pth/.pt/.ckpt) or an
    orbax checkpoint directory. Returns (params, step).

    strict=True verifies the checkpoint covers every model parameter with
    matching shapes (reference semantics: torch strict load_state_dict)."""
    if path.endswith(('.pth', '.pt', '.ckpt')) and os.path.isfile(path):
        from mr_mt3_tpu.utils.checkpoint_import import load_torch_checkpoint
        params = load_torch_checkpoint(path, model.cfg)
        if strict:
            check_param_coverage(params, model)
        return params, 0
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        path = os.path.abspath(path)
        # targetless restore tolerates checkpoints with or without
        # optimizer state. Restore to HOST numpy: the default restore
        # re-applies the sharding metadata saved at write time, which
        # breaks whenever the restoring topology differs (e.g. process 1
        # of a multihost eval does not own the writer's device 0 —
        # "Device TFRT_CPU_0 was not found"). Callers device_put onto
        # their own mesh afterwards.
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
            meta.tree if hasattr(meta, 'tree') else meta)
        restored = ckptr.restore(path, restore_args=restore_args)
        if strict:
            check_param_coverage(restored['params'], model)
        return restored['params'], int(restored['step'])
    raise FileNotFoundError(path)
