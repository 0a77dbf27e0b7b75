"""Optimizer and LR schedules.

Replicates the reference's AdamW + cosine-with-warmup setup including its
min_lr quirk: the floor applies to the *multiplier*, not the learning rate,
so the effective floor is min_lr * base_lr (reference: utils.py:53-60 —
replicated deliberately for training-curve parity, see SURVEY §7).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import optax


def cosine_schedule_with_warmup(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_lr_multiplier: float = 2e-5,
    num_cycles: float = 0.5,
):
    """Linear warmup then cosine decay, floored at min_lr_multiplier.

    Note the floor is a dimensionless multiplier on base_lr, matching the
    reference exactly.
    """
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, float(warmup_steps))
        progress = (step - warmup_steps) / max(1.0,
                                               total_steps - warmup_steps)
        cosine = 0.5 * (1.0 + jnp.cos(
            math.pi * num_cycles * 2.0 * progress))
        decay = jnp.maximum(min_lr_multiplier, cosine)
        return base_lr * jnp.where(step < warmup_steps, warm, decay)
    return schedule


def noam_schedule(base_factor: float = 0.002, warmup_steps: int = 1000,
                  model_dim: int = 512):
    """Noam LR (reference: utils.py:7-19; unused by the tasks but part of
    the utils surface). The reference hardcodes factor 0.002 — that is
    the default here, but base_factor is honored rather than silently
    ignored."""
    def schedule(step):
        cur = jnp.asarray(step, jnp.float32) + 2.0
        return (base_factor * model_dim ** 0.5 *
                jnp.minimum(cur ** -0.5, cur * warmup_steps ** -1.5))
    return schedule


def linear_warmup_to_constant(warmup_steps: int, base_lr: float):
    """MT3's original fixed-LR-after-warmup (reference: utils.py:65-73)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.minimum(1.0, step / warmup_steps)
    return schedule


def make_optimizer(
    lr: float,
    warmup_steps: Optional[int] = None,
    total_steps: Optional[int] = None,
    min_lr: float = 2e-5,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    use_schedule: bool = True,
    schedule=None,
    clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW matching torch defaults (wd applied to every parameter, as
    torch AdamW does with a single param group — reference tasks use
    AdamW(params, lr) with default weight_decay=0.01).

    schedule: pass a prebuilt LR schedule to use verbatim (callers that
    also need the schedule for logging build it once instead of keeping
    a second copy in sync with the construction here).

    clip_norm: optional global-gradient-norm clip applied BEFORE Adam.
    The reference (Lightning default) does not clip, so the default here
    is None for curve parity — but from-scratch training at peak LRs
    above the reference's 2e-4 measurably needs it: without clipping, a
    single gradient spike at step ~1.7k threw a 46M run into a loss
    plateau it never recovered from (train 2.45 -> 3.2; see PERF.md
    generalization section)."""
    if schedule is not None:
        pass
    elif use_schedule:
        if warmup_steps is None or total_steps is None:
            raise ValueError('schedule needs warmup_steps and total_steps')
        schedule = cosine_schedule_with_warmup(
            lr, warmup_steps, total_steps, min_lr_multiplier=min_lr)
    else:
        # the FineTune task: plain AdamW, constant LR
        # (reference: tasks/mt3_net_segmem_v2_with_prev_finetune.py:14-19)
        schedule = lr
    adamw = optax.adamw(learning_rate=schedule, b1=b1, b2=b2, eps=eps,
                        weight_decay=weight_decay)
    if clip_norm is not None:
        return optax.chain(optax.clip_by_global_norm(clip_norm), adamw)
    return adamw
