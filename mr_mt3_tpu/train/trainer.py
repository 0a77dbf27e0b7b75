"""Train state, sharded train/eval steps, and the training loop.

Covers the reference's Lightning task + Trainer surface
(reference: tasks/mt3_net*.py, tasks/mt3_base.py, train.py): CE /
weighted-CE losses, AdamW + cosine-warmup stepped per optimizer step,
val-loss monitoring with top-k + last checkpointing, LR logging, periodic
full transcription-F1 evaluation, warm start from reference .pth weights,
and resume.

TPU-first details:
  * the log-mel frontend runs inside the jitted train step (the batch
    carries raw audio segments + valid frame counts);
  * the step is jit-compiled over a ('data', 'model') mesh — gradients
    all-reduce over ICI like DDP, with optional tensor parallelism from
    mr_mt3_tpu.parallel.mesh param rules;
  * checkpoints are Orbax; reference torch checkpoints import via
    mr_mt3_tpu.utils.checkpoint_import.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mr_mt3_tpu.audio.frontend import (
    SpectrogramConfig,
    compute_logmel,
    normalize_logmel,
)
from mr_mt3_tpu.models import MT3
from mr_mt3_tpu.parallel import mesh as mesh_lib
from mr_mt3_tpu.train.losses import (
    IGNORE_INDEX,
    INSTRUMENT_TOKEN_HI,
    INSTRUMENT_TOKEN_LO,
    cross_entropy_loss,
    weighted_instrument_loss,
)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params))


def bucket_targets(batch: Dict[str, Any], multiple: int = 128,
                   keys=('targets',)) -> Dict[str, Any]:
    """Trim all-padding target tails to the next multiple-of-`multiple`.

    The datasets pad every target row to event_length=1024 with -100
    (reference: dataset_2_random.py:292-306), but decoder self-attention is
    causal and trailing pads sit AFTER every real token, so no real
    position ever attends to them: the loss and gradients over the trimmed
    batch are bit-identical while the decoder runs up to ~4x fewer
    positions. Bucketing to multiples of `multiple` bounds the number of
    compiled shapes at 1024/multiple. `targets_prev` is NOT trimmed: the
    segmem memory encoder is bidirectional, so its pads do influence the
    memory embedding (matching the reference's unmasked segmem encoder —
    models/t5_segmem.py:57-65).

    NOT safe for batch-internal segmem batches (a segmem model trained
    WITHOUT explicit targets_prev — MT3NetSegMem v1 / MT3NetSegMemV2):
    there the memory ids derive from the decoder inputs themselves
    (models/mt3.py batch_internal_segmem_ids), so trimming would change
    the bidirectional memory encoding. Trainer.fit gates on that."""
    out = dict(batch)
    for key in keys:
        t = batch.get(key)
        if t is None:
            continue
        valid = np.asarray(t != IGNORE_INDEX).any(axis=0)
        if valid.any():
            last = int(np.nonzero(valid)[0][-1]) + 1
        else:
            last = 1
        length = min(((last + multiple - 1) // multiple) * multiple,
                     t.shape[1])
        out[key] = t[:, :length]
    return out


def batch_to_mel(audio: jnp.ndarray, valid_frames: jnp.ndarray,
                 spectrogram_config: SpectrogramConfig,
                 mel_norm: bool = True) -> jnp.ndarray:
    """Raw segment audio (B, frames*hop) -> normalized mel (B, frames, bins)
    with padded frames zeroed (reference pads the mel with zeros:
    dataset_2_random.py:296-298)."""
    mel = compute_logmel(audio, spectrogram_config)
    if mel_norm:
        mel = normalize_logmel(mel)
    frame_idx = jnp.arange(mel.shape[1])[None, :, None]
    return jnp.where(frame_idx < valid_frames[:, None, None], mel, 0.0)


def make_train_step(model: MT3, optimizer,
                    loss_type: str = 'ce',
                    spectrogram_config: SpectrogramConfig =
                    SpectrogramConfig(),
                    mel_norm: bool = True) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, metrics)."""
    cfg = model.cfg

    def loss_fn(params, batch, rng):
        mel = batch_to_mel(batch['audio'], batch['valid_frames'],
                           spectrogram_config, mel_norm)
        targets = batch['targets']
        logits = model.apply(
            {'params': params}, mel, labels=targets,
            targets_prev=batch.get('targets_prev'),
            deterministic=False, rngs={'dropout': rng})
        if loss_type == 'weighted':
            loss, logs = weighted_instrument_loss(logits, targets)
        else:
            loss = cross_entropy_loss(logits, targets)
            logs = {}
        return loss, logs

    # donate the input state: params + opt_state (~3 fp32 copies of 46M
    # params) update in place instead of being re-allocated every step,
    # saving the HBM round-trip on the whole optimizer pytree
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {'loss': loss,
                   'grad_norm': optax.global_norm(grads), **logs}
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return train_step


def make_eval_step(model: MT3, loss_type: str = 'ce',
                   spectrogram_config: SpectrogramConfig =
                   SpectrogramConfig(),
                   mel_norm: bool = True) -> Callable:
    @jax.jit
    def eval_step(params, batch):
        mel = batch_to_mel(batch['audio'], batch['valid_frames'],
                           spectrogram_config, mel_norm)
        targets = batch['targets']
        logits = model.apply(
            {'params': params}, mel, labels=targets,
            targets_prev=batch.get('targets_prev'), deterministic=True)
        # the loss denominator — shard_batch padding rows are all -100, so
        # weighting batch losses by this count makes the epoch val_loss
        # exact over partial batches
        num_tokens = jnp.sum(targets != -100)
        if loss_type == 'weighted':
            loss, logs = weighted_instrument_loss(logits, targets)
            # weighted CE divides by n_other + n_inst (losses.py:57)
            num_tokens = num_tokens + jnp.sum(
                (targets >= INSTRUMENT_TOKEN_LO) &
                (targets <= INSTRUMENT_TOKEN_HI))
        else:
            loss = cross_entropy_loss(logits, targets)
            logs = {}
        return {'loss': loss, 'num_tokens': num_tokens, **logs}
    return eval_step


class MetricsWriter:
    """Scalar logging: JSONL always; TensorBoard when TF is available
    (the reference uses Lightning's TensorBoardLogger — train.py:32-33)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, 'metrics.jsonl'), 'a')
        self._tb = None
        if use_tensorboard:
            try:
                os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
                import tensorflow as tf
                tf.config.set_visible_devices([], 'GPU')
                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float]):
        record = {'step': int(step),
                  **{k: float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(record) + '\n')
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for key, value in scalars.items():
                    tf.summary.scalar(key, float(value), step=int(step))
            self._tb.flush()

    def close(self):
        self._jsonl.close()


@dataclasses.dataclass
class CheckpointPolicy:
    """ModelCheckpoint-equivalent knobs (reference: config/config.yaml:30-36).

    monitor ranks top-k by any metric logged at validation time:
    'val_loss', or an eval-hook metric ('val_f1_flat', 'val_f1_midi_class',
    'val_f1_full') with mode='max' — on epochs where the monitored metric
    was not produced (eval cadence), top-k selection is skipped with a
    warning and only 'last' is written."""
    monitor: str = 'val_loss'
    mode: str = 'min'
    save_last: bool = True
    save_top_k: int = 5
    every_n_epochs: int = 1


class Trainer:
    """Minimal but complete training loop."""

    def __init__(
        self,
        model: MT3,
        optimizer,
        loss_type: str = 'ce',
        out_dir: str = 'runs/default',
        mesh=None,
        checkpoint_policy: CheckpointPolicy = CheckpointPolicy(),
        log_every_n_steps: int = 100,
        check_val_every_n_epoch: int = 1,
        eval_hook: Optional[Callable[[Any, int], Dict[str, float]]] = None,
        eval_after_num_epoch: int = 0,
        eval_per_epoch: int = 1,
        lr_schedule: Optional[Callable] = None,
        seed: int = 365,
        mel_norm: bool = True,
        bucket_targets: bool = True,
        fast_rng: bool = True,
        spectrogram_config: Optional[SpectrogramConfig] = None,
    ):
        self.model = model
        self.optimizer = optimizer
        self.out_dir = out_dir
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.policy = checkpoint_policy
        self.log_every_n_steps = log_every_n_steps
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.eval_hook = eval_hook
        self.eval_after_num_epoch = eval_after_num_epoch
        self.eval_per_epoch = eval_per_epoch
        self.lr_schedule = lr_schedule
        # Dropout-mask generation through threefry costs 28.6% of the
        # bf16 train step (~600M random bits/step in ALU ops); an
        # rbg-impl key uses the TPU hardware RNG instead — measured
        # 212 -> 156 ms/step = 1.36x throughput at B=96 (PERF.md train
        # roofline). The impl travels WITH the typed key (no global
        # config), so nothing outside this Trainer changes streams. The
        # mask stream itself differs, which has no parity bearing (the
        # reference draws masks from torch's RNG). fast_rng=False keeps
        # threefry.
        if fast_rng:
            try:
                self.rng = jax.random.key(seed, impl='rbg')
            except Exception:  # pragma: no cover - impl unavailable
                self.rng = jax.random.PRNGKey(seed)
        else:
            self.rng = jax.random.PRNGKey(seed)
        self.mel_norm = mel_norm
        self.bucket_targets = bucket_targets
        # the dataset's filterbank choice (use_tf_spectral_ops) must reach
        # the in-jit mel here, or the trained features silently disagree
        # with the dataset's configuration
        sc = spectrogram_config or SpectrogramConfig()

        self.train_step = make_train_step(model, optimizer,
                                          loss_type=loss_type,
                                          spectrogram_config=sc,
                                          mel_norm=mel_norm)
        self.eval_step = make_eval_step(model, loss_type=loss_type,
                                        spectrogram_config=sc,
                                        mel_norm=mel_norm)
        os.makedirs(out_dir, exist_ok=True)
        self.writer = MetricsWriter(os.path.join(out_dir, 'logs'))
        self._ckpt_dir = os.path.join(os.path.abspath(out_dir), 'checkpoints')
        self._ckpt_scores = []  # (score, epoch)
        self._topk_created: set = set()  # top-k dirs THIS run wrote

    def _can_bucket(self, batch) -> bool:
        """Trimming is loss-identical only when the memory ids do not
        derive from the trimmed targets (see bucket_targets docstring).
        Multihost never buckets: each process would trim its local batch
        to a different length, and per-process global shapes must agree
        at make_array_from_process_local_data or the SPMD step diverges."""
        if jax.process_count() > 1:
            return False
        return self.bucket_targets and (
            not self.model.cfg.has_segmem or 'targets_prev' in batch)

    # ---- checkpointing (orbax) ----

    def _checkpointer(self):
        import orbax.checkpoint as ocp
        return ocp.StandardCheckpointer()

    def save_checkpoint(self, state: TrainState, name: str,
                        with_opt_state: bool = True):
        """Save params (+ optimizer state for exact resume, matching the
        reference's .ckpt vs flat-.pt distinction — train.py:105-116)."""
        import orbax.checkpoint as ocp
        path = os.path.join(self._ckpt_dir, name)
        ckptr = self._checkpointer()
        payload = {'params': state.params, 'step': np.asarray(state.step)}
        if with_opt_state:
            payload['opt_state'] = state.opt_state
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def restore_params(self, name_or_path: str, like_params=None):
        """Weights-only restore; tolerates checkpoints with or without
        optimizer state."""
        path = name_or_path
        if not os.path.isabs(path):
            path = os.path.join(self._ckpt_dir, path)
        ckptr = self._checkpointer()
        restored = ckptr.restore(path)  # targetless: numpy pytree as saved
        return restored['params'], int(restored['step'])

    def restore_state(self, name_or_path: str,
                      like_state: TrainState) -> TrainState:
        """Full resume: params + optimizer state + step."""
        import orbax.checkpoint as ocp
        path = name_or_path
        if not os.path.isabs(path):
            path = os.path.join(self._ckpt_dir, path)
        ckptr = self._checkpointer()
        target = {'params': like_state.params,
                  'opt_state': like_state.opt_state,
                  'step': np.zeros((), np.int32)}
        restored = ckptr.restore(path, target=target)
        return TrainState(step=jnp.asarray(restored['step'], jnp.int32),
                          params=restored['params'],
                          opt_state=restored['opt_state'])

    def _maybe_save_topk(self, state: TrainState, epoch: int, metrics):
        """metrics: the epoch's logged values ({'val_loss': ..,
        'val_f1_flat': ..}) — top-k ranks by policy.monitor among them,
        like Lightning's ModelCheckpoint over logged metrics. A bare
        float is accepted as val_loss."""
        if self.policy.save_last:
            self.save_checkpoint(state, 'last')
        # Lightning gates on completed-epoch count: save when
        # (epoch + 1) % every_n_epochs == 0 (reference config surface:
        # config/config.yaml:30-36) — NOT on epoch 0
        if (epoch + 1) % max(1, self.policy.every_n_epochs):
            return
        if self.policy.save_top_k == 0:
            return
        if not isinstance(metrics, dict):
            metrics = {'val_loss': float(metrics)}
        monitor = self.policy.monitor
        if monitor not in metrics:
            # e.g. monitoring an eval-hook F1 on an epoch where the hook
            # did not run (eval_per_epoch cadence) — skip the ranking,
            # keep 'last'
            print(f'WARNING: modelcheckpoint.monitor={monitor!r} not '
                  f'among this epoch\'s metrics {sorted(metrics)} — '
                  'skipping top-k selection')
            return
        value = float(metrics[monitor])
        name = f'epoch={epoch}-{monitor}={value:.4f}'
        self._ckpt_scores.append((value, name))
        reverse = self.policy.mode == 'max'
        self._ckpt_scores.sort(key=lambda x: x[0], reverse=reverse)
        keep = (self._ckpt_scores if self.policy.save_top_k < 0
                else self._ckpt_scores[:self.policy.save_top_k])
        if (value, name) in keep:
            self.save_checkpoint(state, name)
            self._topk_created.add(name)
        # prune dropped checkpoints — but ONLY ones this run created as
        # top-k entries: a resumed run starts with empty _ckpt_scores,
        # and deleting every unknown directory would destroy the previous
        # run's best checkpoints (and any manually saved name like
        # 'final') on the first post-resume validation
        import shutil
        keep_names = {n for _, n in keep} | {'last'}
        for entry in self._topk_created - keep_names:
            shutil.rmtree(os.path.join(self._ckpt_dir, entry),
                          ignore_errors=True)
        self._topk_created &= keep_names
        self._ckpt_scores = keep

    # ---- loop ----

    def fit(self, state: TrainState, train_loader, val_loader=None,
            num_epochs: int = 1, start_epoch: int = 0) -> TrainState:
        # host-side step counter: int(state.step) would block on the
        # in-flight device step every iteration, serializing the host's
        # bucket/shard work with device compute (train_step advances the
        # counter by exactly 1, so the local count stays exact)
        step = int(state.step)
        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            for batch in train_loader:
                if self._can_bucket(batch):
                    batch = bucket_targets(batch)
                sharded = mesh_lib.shard_batch(batch, self.mesh)
                state, metrics = self.train_step(state, sharded, self.rng)
                step += 1
                if step % self.log_every_n_steps == 0:
                    scalars = {f'train_{k}': float(v)
                               for k, v in metrics.items()}
                    if self.lr_schedule is not None:
                        # the update that produced `step` consumed the
                        # schedule at count step-1 (optax increments the
                        # count after scaling) — log the LR actually
                        # applied, not the next step's
                        scalars['lr'] = float(self.lr_schedule(step - 1))
                    self.writer.log(step, scalars)
            epoch_time = time.time() - t0

            val_loss = None
            run_val = (val_loader is not None and
                       (epoch + 1) % self.check_val_every_n_epoch == 0)
            if run_val:
                val_loss = self.validate(state, val_loader)
                self.writer.log(int(state.step),
                                {'val_loss': val_loss,
                                 'epoch': epoch,
                                 'epoch_time_s': epoch_time})

            # the eval hook runs BEFORE checkpoint ranking so a policy
            # monitoring an eval metric (val_f1_flat, ...) sees it —
            # same ordering as Lightning, where the reference logs F1 in
            # on_validation_epoch_end and ModelCheckpoint reads the
            # logged metrics (tasks/mt3_base.py:27-46)
            eval_scores = {}
            if (self.eval_hook is not None and
                    epoch >= self.eval_after_num_epoch and
                    epoch % max(1, self.eval_per_epoch) == 0):
                # guarded: the hook now runs BEFORE checkpointing, so a
                # hook crash (bad eval glob, decode OOM) must not cost
                # the epoch's 'last'/top-k checkpoints — rank on
                # val_loss alone instead
                try:
                    scores = self.eval_hook(state.params, epoch)
                except Exception:
                    import traceback
                    traceback.print_exc()
                    scores = None
                if scores:
                    eval_scores = {f'val_{k}': v for k, v in scores.items()}
                    self.writer.log(int(state.step), eval_scores)

            if run_val:
                self._maybe_save_topk(
                    state, epoch, {'val_loss': val_loss, **eval_scores})
            elif self.policy.save_last:
                self.save_checkpoint(state, 'last')
        return state

    def validate(self, state: TrainState, val_loader) -> float:
        """Token-weighted mean val loss.

        Each batch's loss is a mean over its real target tokens; weighting
        by that token count (padding rows carry zero tokens) gives the
        exact corpus-level mean, unbiased by partial batches."""
        loss_sum, token_sum = 0.0, 0.0
        for batch in val_loader:
            if self._can_bucket(batch):
                batch = bucket_targets(batch)
            sharded = mesh_lib.shard_batch(batch, self.mesh)
            metrics = self.eval_step(state.params, sharded)
            n = float(metrics['num_tokens'])
            loss_sum += float(metrics['loss']) * n
            token_sum += n
        return loss_sum / token_sum if token_sum else float('nan')
