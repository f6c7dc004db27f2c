"""Fused Procrustes-statistics kernel vs the unfused XLA chain.

The kernel (ops/pallas/procrustes_fused.py) fuses selector mixing +
weighted centering + cross-covariance + traces; values and the custom
VJP must match the composition used by ``basd_loss``
(reference: ``src/losses/relational.py:5-50``).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from basd_tpu.ops.pallas.procrustes_fused import fused_relational_stats

P, L, B, N, DS, DT = 2, 3, 4, 10, 16, 24


def _unfused(s, t, w, wts):
    """The exact arithmetic basd_loss composes today (mixing with bf16
    weights, f32 relational math)."""
    tm = jnp.einsum("pl,lbnd->pbnd", wts.astype(t.dtype), t)
    sf = s.astype(jnp.float32)
    tf = tm.astype(jnp.float32)
    mu_s = jnp.einsum("pbn,pbnd->pbd", w, sf)[:, :, None, :]
    mu_t = jnp.einsum("pbn,pbnd->pbd", w, tf)[:, :, None, :]
    sc = sf - mu_s
    tc = tf - mu_t
    ws = jnp.sqrt(w)[..., None]
    sw = ws * sc
    tw = ws * tc
    tr_s = jnp.sum(sw * sw, axis=(2, 3))
    tr_t = jnp.sum(tw * tw, axis=(2, 3))
    cross = jnp.einsum("pbns,pbnt->pbst", sw, tw)
    return cross, tr_s, tr_t


def _data(dtype, seed=0):
    rng = np.random.default_rng(seed)
    s = jnp.asarray(rng.standard_normal((P, B, N, DS)), dtype)
    t = jnp.asarray(rng.standard_normal((L, B, N, DT)), dtype)
    imp = jnp.asarray(rng.random((P, B, N)) + 0.1, jnp.float32)
    w = imp / jnp.sum(imp, axis=-1, keepdims=True)
    wts_raw = jnp.asarray(rng.standard_normal((P, L)), jnp.float32)
    wts = jax.nn.softmax(wts_raw, axis=-1)
    return s, t, w, wts


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_values_match_unfused(dtype):
    s, t, w, wts = _data(dtype)
    c_k, trs_k, trt_k = fused_relational_stats(s, t, w, wts, True)
    c_u, trs_u, trt_u = _unfused(s, t, w, wts)
    tol = 1e-5 if dtype == jnp.float32 else 5e-3
    scale = float(jnp.max(jnp.abs(c_u)))
    np.testing.assert_allclose(
        np.asarray(c_k) / scale, np.asarray(c_u) / scale, atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(trs_k), np.asarray(trs_u), rtol=tol, atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(trt_k), np.asarray(trt_u), rtol=tol, atol=tol
    )


def test_grads_match_unfused():
    s, t, w, wts = _data(jnp.float32, seed=1)
    rng = np.random.default_rng(2)
    wc = jnp.asarray(rng.standard_normal((P, B, DS, DT)), jnp.float32)
    wa = jnp.asarray(rng.standard_normal((P, B)), jnp.float32)
    wb = jnp.asarray(rng.standard_normal((P, B)), jnp.float32)

    def scalar(fn):
        def f(s_, w_, wts_):
            c, trs, trt = fn(s_, t, w_, wts_)
            return (
                jnp.sum(c * wc) + jnp.sum(trs * wa) + jnp.sum(trt * wb)
            )
        return f

    f_k = scalar(lambda *a: fused_relational_stats(*a, True))
    f_u = scalar(_unfused)
    gk = jax.grad(f_k, argnums=(0, 1, 2))(s, w, wts)
    gu = jax.grad(f_u, argnums=(0, 1, 2))(s, w, wts)
    for a, b, name in zip(gk, gu, ["ds", "dw", "dwts"]):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-5,
            err_msg=name,
        )


def test_grads_match_unfused_bf16():
    """bf16 inputs: the VJP rounds ds to bf16 like autodiff through the
    unfused chain would."""
    s, t, w, wts = _data(jnp.bfloat16, seed=3)

    def loss(fn):
        def f(s_, w_, wts_):
            c, trs, trt = fn(s_, t, w_, wts_)
            return jnp.mean(trs + trt) + jnp.mean(jnp.square(c))
        return f

    gk = jax.grad(loss(lambda *a: fused_relational_stats(*a, True)),
                  argnums=(0, 1, 2))(s, w, wts)
    gu = jax.grad(loss(_unfused), argnums=(0, 1, 2))(s, w, wts)
    for a, b, name in zip(gk, gu, ["ds", "dw", "dwts"]):
        scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a, np.float32) / scale,
            np.asarray(b, np.float32) / scale,
            atol=2e-2, err_msg=name,
        )
