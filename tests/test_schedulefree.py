"""Schedule-free AdamW tests: equivalence to the torch-style (y, z)
in-place formulation, and optimization sanity."""

import numpy as np

import jax
import jax.numpy as jnp

from basd_tpu.training import schedulefree as sf


def torch_style_oracle(grad_fn, p0, cfg, steps):
    """NumPy replica of the torch AdamWScheduleFree buffer algebra: stores
    p(=y in train mode) and z, recovers x only for eval — structured like
    the published implementation to cross-check our (x, z) form."""
    y = p0.copy()
    z = p0.copy()
    v = np.zeros_like(p0)
    lr_max = 0.0
    weight_sum = 0.0
    for k in range(steps):
        g = grad_fn(y)
        k1 = k + 1
        sched = 1.0 if cfg.warmup_steps == 0 else min(1.0, k1 / cfg.warmup_steps)
        bc2 = 1.0 - cfg.b2**k1
        lr = cfg.learning_rate * sched * np.sqrt(bc2)
        lr_max = max(lr_max, lr)
        weight = k1**cfg.r * lr_max**cfg.weight_lr_power
        weight_sum += weight
        ckp1 = weight / weight_sum if weight_sum > 0 else 0.0
        v = cfg.b2 * v + (1 - cfg.b2) * g * g
        u = g / (np.sqrt(v) + cfg.eps)
        if cfg.weight_decay:
            u = u + cfg.weight_decay * y
        adaptive_y_lr = lr * (cfg.b1 * (1 - ckp1) - 1.0)
        y = y + ckp1 * (z - y) + adaptive_y_lr * u
        z = z - lr * u
    # eval-mode params: x = (y - (1 - b1) z) / b1
    x = (y - (1 - cfg.b1) * z) / cfg.b1
    return x, y, z


def test_matches_torch_style_formulation():
    cfg = sf.ScheduleFreeConfig(
        learning_rate=0.05, weight_decay=0.01, warmup_steps=3
    )
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(16).astype(np.float64)
    a = rng.standard_normal((16, 16))
    quad = a.T @ a / 16 + np.eye(16)

    def grad_np(p):
        return quad @ p

    x_ref, y_ref, z_ref = torch_style_oracle(grad_np, p0, cfg, steps=25)

    state = sf.init({"w": jnp.asarray(p0, jnp.float32)})
    for _ in range(25):
        y = sf.train_params(state, cfg)
        g = {"w": jnp.asarray(quad, jnp.float32) @ y["w"]}
        state = sf.update(state, g, cfg, y=y)

    np.testing.assert_allclose(np.asarray(state.x["w"]), x_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.z["w"]), z_ref, rtol=1e-4, atol=1e-5)
    y_ours = sf.train_params(state, cfg)["w"]
    np.testing.assert_allclose(np.asarray(y_ours), y_ref, rtol=1e-4, atol=1e-5)


def test_converges_on_quadratic():
    cfg = sf.ScheduleFreeConfig(learning_rate=0.1)
    target = jnp.asarray([1.0, -2.0, 3.0])
    state = sf.init({"w": jnp.zeros(3)})

    @jax.jit
    def step(state):
        y = sf.train_params(state, cfg)
        g = {"w": 2.0 * (y["w"] - target)}
        return sf.update(state, g, cfg, y=y)

    # x averages z from step 0, so its error decays ~1/k
    for _ in range(1500):
        state = step(state)
    np.testing.assert_allclose(np.asarray(state.x["w"]), np.asarray(target), atol=2e-2)


def test_state_is_jit_roundtrippable_pytree():
    cfg = sf.ScheduleFreeConfig(learning_rate=1e-3)
    params = {"a": jnp.ones((2, 3)), "b": {"c": jnp.zeros(4)}}
    state = sf.init(params)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    state2 = jax.tree_util.tree_unflatten(treedef, leaves)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    out = jax.jit(lambda s: sf.update(s, g, cfg))(state2)
    assert int(out.k) == 1
    assert float(out.weight_sum) > 0
