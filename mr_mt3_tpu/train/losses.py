"""Training losses.

Matches the reference tasks' loss math (reference: tasks/mt3_net.py:27-37
plain CE with ignore_index -100; :86-107 the 2x-instrument-weighted CE).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100

# instrument (program) tokens in model space: codec program range 1132-1259
# shifted by 3 special tokens (reference: tasks/mt3_net.py:97-99)
INSTRUMENT_TOKEN_LO = 1135
INSTRUMENT_TOKEN_HI = 1262


def _per_token_ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """-log p(target) per position; targets clipped for ignored slots."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    safe_targets = jnp.where(targets == IGNORE_INDEX, 0, targets)
    picked = jnp.take_along_axis(log_probs, safe_targets[..., None],
                                 axis=-1)[..., 0]
    return -picked


def cross_entropy_loss(logits: jnp.ndarray,
                       targets: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over non-ignored positions (torch CrossEntropyLoss semantics)."""
    ce = _per_token_ce(logits, targets)
    mask = targets != IGNORE_INDEX
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1)


def weighted_instrument_loss(
    logits: jnp.ndarray, targets: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE with instrument (program) tokens double-weighted.

    loss = (sum_nonpad + 2 * sum_inst) / (n_inst + n_nonpad)
    (reference: tasks/mt3_net.py:97-107). Returns (loss, logs) where logs
    holds the split means the reference logs.
    """
    ce = _per_token_ce(logits, targets)
    pad_mask = targets != IGNORE_INDEX
    inst_mask = ((targets >= INSTRUMENT_TOKEN_LO) &
                 (targets <= INSTRUMENT_TOKEN_HI))
    n_other = jnp.sum(pad_mask)
    n_inst = jnp.sum(inst_mask)
    sum_other = jnp.sum(ce * pad_mask)
    sum_inst = jnp.sum(ce * inst_mask)
    loss = (sum_other + 2.0 * sum_inst) / jnp.maximum(n_inst + n_other, 1)
    logs = {
        # despite the name, 'loss_other' averages over ALL non-pad tokens
        # (instrument positions included) — bug-compatible with the
        # reference's train_loss_other, which divides loss_masked (the
        # full pad-masked CE) by its own count (tasks/mt3_net.py:109)
        'loss_other': sum_other / jnp.maximum(n_other, 1),
        'loss_inst': sum_inst / jnp.maximum(n_inst, 1),
    }
    return loss, logs
