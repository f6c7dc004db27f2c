"""Scalar loss utilities: smoothed cross-entropy and UW-SO weighting."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Cross-entropy matching ``torch.nn.CrossEntropyLoss`` semantics.

    ``targets`` may be integer class ids (B,) or class probabilities (B, C)
    (the MixUp/CutMix path). Label smoothing mixes the target distribution
    toward uniform: ``t' = t * (1 - s) + s / C``. Mean reduction.
    Reference: ``src/training/trainer.py:53`` + mixed targets at ``:138``.
    """
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    if targets.ndim == logits.ndim - 1:
        targets = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    else:
        targets = targets.astype(jnp.float32)
    if label_smoothing:
        targets = targets * (1.0 - label_smoothing) + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def uwso_weights(losses: jnp.ndarray) -> jnp.ndarray:
    """UW-SO inverse-loss weights (Kirchdorfer et al. 2024).

    ``w_i = (1 / max(L_i, eps)) / sum_j (1 / max(L_j, eps))`` over detached
    loss values. Reference: ``src/losses/combined.py:80-83``.
    """
    detached = jax.lax.stop_gradient(losses.astype(jnp.float32))
    inv = 1.0 / jnp.maximum(detached, _F32_EPS)
    return inv / jnp.sum(inv)


def uwso_combine(losses: jnp.ndarray) -> jnp.ndarray:
    """Weighted sum of losses with UW-SO weights (weights carry no grad)."""
    return jnp.sum(uwso_weights(losses) * losses)
