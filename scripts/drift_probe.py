"""Measure gram-vs-svd trajectory drift on a tiny distillation problem.

Calibration probe for tests/test_backend_trajectory_drift.py (VERDICT r4
#6): run N schedule-free AdamW steps under both spectral backends from
identical init/data, print loss/param divergence statistics.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/drift_probe.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from basd_tpu.losses import BASDLossConfig, basd_loss, init_basd_loss
from basd_tpu.training import schedulefree as sf

L, B, N, D_S, D_T, P, C, F = 4, 8, 8, 8, 12, 2, 5, 16
STEPS = 150


def make_step(backend: str, sel_buffers, loss_cfg_kwargs):
    cfg = BASDLossConfig(backend=backend, **loss_cfg_kwargs)
    sf_cfg = sf.ScheduleFreeConfig(learning_rate=2e-2, weight_decay=1e-4)

    def loss_fn(trainable, x, t_tok, t_imp, labels):
        s = trainable["student"]
        logits = x @ s["w_log"]
        toks = jnp.tanh(x @ s["w_tok"]).reshape(B, P, N, D_S)
        toks = jnp.transpose(toks, (1, 0, 2, 3))
        loss, aux = basd_loss(
            trainable["basd"], sel_buffers, logits, labels,
            toks, t_tok, t_imp, cfg,
        )
        return loss, aux

    @jax.jit
    def step(state, x, t_tok, t_imp, labels):
        y = sf.train_params(state, sf_cfg)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            y, x, t_tok, t_imp, labels
        )
        state = sf.update(state, grads, sf_cfg, y=y)
        return state, loss

    return step


def make_batches(num=10):
    data = np.random.default_rng(7)
    out = []
    for _ in range(num):
        out.append((
            jnp.asarray(data.standard_normal((B, F)).astype(np.float32)),
            jnp.asarray(data.standard_normal((L, B, N, D_T)).astype(np.float32)),
            jnp.asarray(data.uniform(0.1, 1.0, (L, B, N)).astype(np.float32)),
            jnp.asarray(data.integers(0, C, (B,))),
        ))
    return out


def run(backend: str, perturb: float = 0.0, batches=None):
    key = jax.random.PRNGKey(0)
    loss_cfg_kwargs = dict(
        student_dim=D_S, teacher_dim=D_T, student_depth=4,
        num_student_tokens=N, num_extraction_points=P,
        label_smoothing=0.1, teacher_has_cls_token=False,
    )
    sel_params, sel_buffers = init_basd_loss(
        jax.random.PRNGKey(1),
        BASDLossConfig(backend=backend, **loss_cfg_kwargs),
    )
    rng = np.random.default_rng(42)
    w_tok = jnp.asarray(
        (rng.standard_normal((F, P * N * D_S)) / np.sqrt(F)).astype(np.float32)
    )
    if perturb:
        w_tok = w_tok * (1.0 + perturb)
    w_log = jnp.asarray(
        (rng.standard_normal((F, C)) / np.sqrt(F)).astype(np.float32)
    )
    trainable = {
        "student": {"w_tok": w_tok, "w_log": w_log},
        "basd": sel_params,
    }
    state = sf.init(trainable)
    step = make_step(backend, sel_buffers, loss_cfg_kwargs)

    if batches is None:
        batches = make_batches()
    losses = []
    for t in range(STEPS):
        x, t_tok, t_imp, labels = batches[t % len(batches)]
        state, loss = step(state, x, t_tok, t_imp, labels)
        losses.append(float(loss))
    params = jax.device_get(sf.eval_params(state))
    return np.asarray(losses), params


def _pdiv(p_a, p_b):
    fa = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(p_a)])
    fb = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(p_b)])
    return np.linalg.norm(fa - fb) / np.linalg.norm(fb)


def main():
    batches = make_batches()
    loss_g, p_g = run("gram", batches=batches)
    loss_s, p_s = run("svd", batches=batches)
    # chaos floor: the SAME svd backend from a 1e-6-perturbed init — any
    # trajectory gap smaller than or comparable to this is indistinguishable
    # from inherent f32 rounding chaos
    loss_c, p_c = run("svd", perturb=1e-6, batches=batches)

    def rep(name, la, lb, pa, pb):
        rel = np.abs(la - lb) / np.maximum(np.abs(lb), 1e-9)
        tail = rel[-20:]
        print(f"{name}: loss rel diff mean={rel.mean():.3e} "
              f"max={rel.max():.3e} tail_mean={tail.mean():.3e} "
              f"param_div={_pdiv(pa, pb):.3e} "
              f"final_losses=({la[-1]:.6f},{lb[-1]:.6f})")

    rep("gram vs svd  ", loss_g, loss_s, p_g, p_s)
    rep("chaos floor  ", loss_c, loss_s, p_c, p_s)
    print(f"loss drop: gram {loss_g[0]:.4f}->{loss_g[-1]:.4f}  "
          f"svd {loss_s[0]:.4f}->{loss_s[-1]:.4f}")


if __name__ == "__main__":
    main()
