"""Adversarial input-noise attacks on the encoder inputs.

Functional port of the reference's T5Adversarial helpers
(reference: models/t5.py:370-394): FGSM and PGD-linf perturb the mel
inputs to maximize the CE loss while labels stay fixed — an encoder
robustness probe (experimental in the reference; not used by any task).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mr_mt3_tpu.models.mt3 import MT3
from mr_mt3_tpu.train.losses import cross_entropy_loss


def _loss(model: MT3, variables, inputs, labels):
    logits = model.apply(variables, inputs, labels=labels,
                         deterministic=True)
    return cross_entropy_loss(logits, labels)


def fgsm(model: MT3, variables, inputs: jnp.ndarray, labels: jnp.ndarray,
         epsilon: float = 0.1) -> jnp.ndarray:
    """One-step sign-of-gradient perturbation (reference: :374-381)."""
    grad = jax.grad(lambda x: _loss(model, variables, x, labels))(inputs)
    return epsilon * jnp.sign(grad)


def pgd_linf(model: MT3, variables, inputs: jnp.ndarray,
             labels: jnp.ndarray, epsilon: float = 0.1,
             alpha: float = 0.01, num_iter: int = 5) -> jnp.ndarray:
    """Projected gradient descent in the l-inf ball (reference: :383-394)."""
    grad_fn = jax.grad(lambda x: _loss(model, variables, x, labels))

    def body(_, delta):
        g = grad_fn(inputs + delta)
        return jnp.clip(delta + alpha * jnp.sign(g), -epsilon, epsilon)

    return jax.lax.fori_loop(0, num_iter, body,
                             jnp.zeros_like(inputs))
