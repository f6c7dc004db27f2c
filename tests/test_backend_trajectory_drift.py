"""Long-horizon gram-vs-svd TRAINING equivalence (VERDICT r4 #6).

Per-step tests lock the 'gram' TPU fast backend to the 'svd'
reference-parity backend at ~5e-5 loss/grad tolerance
(test_procrustes_ident, test_selector). This test bounds what those
per-step differences COMPOUND to over a real optimization: 150
schedule-free AdamW steps of a tiny distillation problem (fixed init,
fixed cycled batch stream, identical rng), differing ONLY in
``BASDLossConfig.backend`` — the strongest air-gapped proxy for the
"student top-1 within 0.2% of reference" north star (BASELINE.md).

Measured envelope (scripts/drift_probe.py, CPU f32, 150 steps):

  gram vs svd : loss rel diff mean 9.9e-3, max 8.8e-2, tail(20) mean
                2.3e-2; final-loss rel diff 1.3e-2; eval-param rel
                divergence 1.1e-1; both losses drop 1.42 -> 0.52.
  chaos floor : the SAME svd backend re-run from a 1e-6-perturbed init
                lands 6.4e-4 param divergence — so the gram gap is real
                compounded per-step f32 difference, not seed chaos, and
                it stays bounded: the trajectories descend into the SAME
                basin at the same rate.

Asserts give ~2x margin on those measurements.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from basd_tpu.losses import BASDLossConfig, basd_loss, init_basd_loss
from basd_tpu.training import schedulefree as sf

L, B, N, D_S, D_T, P, C, F = 4, 8, 8, 8, 12, 2, 5, 16
STEPS = 150
NUM_BATCHES = 10

_CFG_KW = dict(
    student_dim=D_S, teacher_dim=D_T, student_depth=4,
    num_student_tokens=N, num_extraction_points=P,
    label_smoothing=0.1, teacher_has_cls_token=False,
)


def _make_batches():
    data = np.random.default_rng(7)
    out = []
    for _ in range(NUM_BATCHES):
        out.append((
            jnp.asarray(data.standard_normal((B, F)).astype(np.float32)),
            jnp.asarray(
                data.standard_normal((L, B, N, D_T)).astype(np.float32)
            ),
            jnp.asarray(data.uniform(0.1, 1.0, (L, B, N)).astype(np.float32)),
            jnp.asarray(data.integers(0, C, (B,))),
        ))
    return out


def _run(backend: str, batches):
    cfg = BASDLossConfig(backend=backend, **_CFG_KW)
    sf_cfg = sf.ScheduleFreeConfig(learning_rate=2e-2, weight_decay=1e-4)
    sel_params, sel_buffers = init_basd_loss(jax.random.PRNGKey(1), cfg)

    rng = np.random.default_rng(42)
    trainable = {
        "student": {
            "w_tok": jnp.asarray(
                (rng.standard_normal((F, P * N * D_S)) / np.sqrt(F)).astype(
                    np.float32
                )
            ),
            "w_log": jnp.asarray(
                (rng.standard_normal((F, C)) / np.sqrt(F)).astype(np.float32)
            ),
        },
        "basd": sel_params,
    }

    def loss_fn(tr, x, t_tok, t_imp, labels):
        s = tr["student"]
        logits = x @ s["w_log"]
        toks = jnp.tanh(x @ s["w_tok"]).reshape(B, P, N, D_S)
        toks = jnp.transpose(toks, (1, 0, 2, 3))
        loss, _ = basd_loss(
            tr["basd"], sel_buffers, logits, labels, toks, t_tok, t_imp, cfg
        )
        return loss

    @jax.jit
    def step(state, x, t_tok, t_imp, labels):
        y = sf.train_params(state, sf_cfg)
        loss, grads = jax.value_and_grad(loss_fn)(y, x, t_tok, t_imp, labels)
        return sf.update(state, grads, sf_cfg, y=y), loss

    state = sf.init(trainable)
    losses = []
    for t in range(STEPS):
        x, t_tok, t_imp, labels = batches[t % NUM_BATCHES]
        state, loss = step(state, x, t_tok, t_imp, labels)
        losses.append(float(loss))
    params = jax.device_get(sf.eval_params(state))
    flat = np.concatenate(
        [np.ravel(v) for v in jax.tree_util.tree_leaves(params)]
    )
    return np.asarray(losses), flat


def test_gram_svd_trajectory_drift_bounded():
    batches = _make_batches()
    loss_g, p_g = _run("gram", batches)
    loss_s, p_s = _run("svd", batches)

    # both backends actually train: >50% loss reduction on the cycled set
    assert loss_g[-1] < 0.5 * loss_g[0], (loss_g[0], loss_g[-1])
    assert loss_s[-1] < 0.5 * loss_s[0], (loss_s[0], loss_s[-1])

    rel = np.abs(loss_g - loss_s) / np.maximum(np.abs(loss_s), 1e-9)
    # documented envelope (~2x the scripts/drift_probe.py measurement)
    assert rel.max() < 0.18, f"max loss drift {rel.max():.3e}"
    assert rel[-20:].mean() < 0.05, f"tail loss drift {rel[-20:].mean():.3e}"
    assert rel[-1] < 0.05, f"final loss drift {rel[-1]:.3e}"
    pdiv = np.linalg.norm(p_g - p_s) / np.linalg.norm(p_s)
    assert pdiv < 0.3, f"eval-param divergence {pdiv:.3e}"
