"""Schedule-free AdamW (Defazio et al., "The Road Less Scheduled"), the
reference's optimizer (``AdamWScheduleFree``; reference:
``src/training/trainer.py:54-58``) — reimplemented functionally for JAX.

The torch implementation stores the parameter buffer as ``y`` during
training and ``x`` during eval, flipping in place via
``optimizer.train()`` / ``optimizer.eval()`` (reference:
``trainer.py:180,184``; ``train.py:153``). A functional train step makes
the mode flips unnecessary: the state stores the primal iterate ``z`` and
the Polyak-style average ``x`` explicitly, and the gradient point
``y = beta1 * x + (1 - beta1) * z`` is materialized inside the step. The
update sequence is algebraically identical to the torch version
(which tracks (y, z) and recovers x implicitly):

    sched   = min(1, (k+1) / warmup)                 (1 if no warmup)
    lr_t    = lr * sched * sqrt(1 - beta2^(k+1))     (bias correction
                                                      folded into lr)
    c_{k+1} = w_{k+1} / sum_i w_i,  w_i = i^r * lr_max^weight_lr_power
    v       = beta2 * v + (1 - beta2) * g^2
    u       = g / (sqrt(v) + eps) + weight_decay * y (decay at y, after
                                                      normalization)
    z      <- z - lr_t * u
    x      <- (1 - c_{k+1}) * x + c_{k+1} * z

Eval/checkpoint weights are ``x`` (the reference saves weights while the
optimizer is in eval mode: ``trainer.py:184,201-206``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ScheduleFreeConfig:
    learning_rate: float
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    warmup_steps: int = 0
    r: float = 0.0
    weight_lr_power: float = 2.0


class ScheduleFreeState(NamedTuple):
    x: Any  # averaged iterate (eval/checkpoint params)
    z: Any  # primal iterate
    v: Any  # second moment
    k: jnp.ndarray  # step count (int32)
    lr_max: jnp.ndarray
    weight_sum: jnp.ndarray


def init(params) -> ScheduleFreeState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return ScheduleFreeState(
        x=params,
        # distinct buffers: x and z may both be donated by a jitted step
        z=jax.tree_util.tree_map(jnp.copy, params),
        v=zeros,
        k=jnp.zeros((), jnp.int32),
        lr_max=jnp.zeros((), jnp.float32),
        weight_sum=jnp.zeros((), jnp.float32),
    )


def train_params(state: ScheduleFreeState, cfg: ScheduleFreeConfig):
    """The gradient-evaluation point y = b1 * x + (1 - b1) * z."""
    return jax.tree_util.tree_map(
        lambda x, z: cfg.b1 * x + (1.0 - cfg.b1) * z, state.x, state.z
    )


def eval_params(state: ScheduleFreeState):
    """Deployment/eval weights (the torch impl's optimizer.eval() params)."""
    return state.x


def update(
    state: ScheduleFreeState,
    grads,
    cfg: ScheduleFreeConfig,
    y=None,
) -> ScheduleFreeState:
    """One schedule-free AdamW step. ``grads`` must be evaluated at
    ``train_params(state)``; pass that tree as ``y`` to avoid
    recomputation."""
    if y is None:
        y = train_params(state, cfg)

    k1 = state.k + 1
    k1f = k1.astype(jnp.float32)
    sched = (
        jnp.minimum(1.0, k1f / cfg.warmup_steps) if cfg.warmup_steps > 0 else 1.0
    )
    bc2 = 1.0 - cfg.b2**k1f
    lr_t = cfg.learning_rate * sched * jnp.sqrt(bc2)
    lr_max = jnp.maximum(state.lr_max, lr_t)
    weight = k1f**cfg.r * lr_max**cfg.weight_lr_power
    weight_sum = state.weight_sum + weight
    c = jnp.where(weight_sum > 0, weight / weight_sum, 0.0)

    def upd(x, z, v, g, yy):
        g = g.astype(jnp.float32)
        v32 = v.astype(jnp.float32)
        v_new = cfg.b2 * v32 + (1.0 - cfg.b2) * jnp.square(g)
        u = g / (jnp.sqrt(v_new) + cfg.eps)
        if cfg.weight_decay:
            u = u + cfg.weight_decay * yy.astype(jnp.float32)
        z_new = z.astype(jnp.float32) - lr_t * u
        x_new = (1.0 - c) * x.astype(jnp.float32) + c * z_new
        return (
            x_new.astype(x.dtype),
            z_new.astype(z.dtype),
            v_new.astype(v.dtype),
        )

    out = jax.tree_util.tree_map(
        upd, state.x, state.z, state.v, grads, y,
        is_leaf=lambda t: isinstance(t, jnp.ndarray),
    )
    x = jax.tree_util.tree_map(lambda o: o[0], out,
                               is_leaf=lambda t: isinstance(t, tuple))
    z = jax.tree_util.tree_map(lambda o: o[1], out,
                               is_leaf=lambda t: isinstance(t, tuple))
    v = jax.tree_util.tree_map(lambda o: o[2], out,
                               is_leaf=lambda t: isinstance(t, tuple))
    return ScheduleFreeState(
        x=x, z=z, v=v, k=k1, lr_max=lr_max, weight_sum=weight_sum
    )
