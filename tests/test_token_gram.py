"""Fused centered token-Gram kernel vs the unfused selector math.

The kernel (ops/pallas/token_gram.py) must reproduce, in one pass, what
the selector's unfused path computes in three (mean, shifted stack, Gram
einsum) — reference semantics: center-then-factorize,
``src/losses/layer_selector.py:51-56``.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from basd_tpu.ops.pallas.token_gram import centered_token_gram

K, B, N, D = 3, 8, 13, 24


def _ref_f64(toks, skip=False):
    """float64 centered Gram + mean (exact semantics)."""
    x = np.asarray(toks, np.float64)
    if skip:
        x = x[:, :, 1:, :]
    k, b, n, d = x.shape
    flat = x.reshape(k, b * n, d)
    mu = flat.mean(axis=1)
    c = flat - mu[:, None, :]
    return np.einsum("kmd,kme->kde", c, c), mu


def _unfused(toks):
    """The selector's unfused arithmetic (shifted bf16 stack + f32 Gram),
    without the projection sandwich."""
    mu = jnp.mean(toks, axis=(1, 2), dtype=jnp.float32)
    shift = jax.lax.stop_gradient(mu)
    shifted = (toks - shift[:, None, None, :]).astype(toks.dtype)
    g = jnp.einsum(
        "kbnd,kbne->kde", shifted, shifted,
        preferred_element_type=jnp.float32,
    )
    m = toks.shape[1] * toks.shape[2]
    d = mu - shift
    return g - m * d[:, :, None] * d[:, None, :], mu


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_value_matches_f64_reference(dtype):
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.standard_normal((K, B, N, D)), dtype)
    g, mu = centered_token_gram(toks, False, True)
    g64, mu64 = _ref_f64(toks)
    scale = np.abs(g64).max()
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(g) / scale, g64 / scale, atol=tol)
    np.testing.assert_allclose(np.asarray(mu), mu64, atol=tol)


def test_matches_unfused_selector_path():
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.standard_normal((K, B, N, D)), jnp.bfloat16)
    g_k, mu_k = centered_token_gram(toks, False, True)
    g_u, mu_u = _unfused(toks)
    # both paths round the shifted stack to bf16; the only difference is
    # the shift constant (first-tile mean vs full mean), which the exact
    # identity removes up to bf16 rounding of the shifted values
    scale = float(jnp.max(jnp.abs(g_u)))
    np.testing.assert_allclose(
        np.asarray(g_k) / scale, np.asarray(g_u) / scale, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(mu_k), np.asarray(mu_u), atol=1e-2
    )


def test_outlier_channel_means_no_cancellation():
    """Channels with mu/sigma ~ 300 (the DINOv2 outlier regime): the
    centered Gram must come out at the centered scale, not at the
    cancellation floor of the raw-Gram formulation (the invariant locked
    for the unfused path by tests/test_selector.py)."""
    rng = np.random.default_rng(2)
    base = rng.standard_normal((K, B, N, D))
    shift = np.zeros((D,))
    shift[::7] = 300.0
    toks = jnp.asarray(base + shift, jnp.float32)
    g, mu = centered_token_gram(toks, False, True)
    g64, mu64 = _ref_f64(toks)
    scale = np.abs(g64).max()
    np.testing.assert_allclose(np.asarray(g) / scale, g64 / scale, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mu), mu64, rtol=1e-5, atol=1e-5)


def test_skip_first_token():
    rng = np.random.default_rng(3)
    toks = np.asarray(rng.standard_normal((K, B, N, D)), np.float32)
    toks[:, :, 0, :] = 1e4  # poison the cls row: must not leak in
    g, mu = centered_token_gram(jnp.asarray(toks), True, True)
    g64, mu64 = _ref_f64(toks, skip=True)
    scale = np.abs(g64).max()
    np.testing.assert_allclose(np.asarray(g) / scale, g64 / scale, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mu), mu64, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("skip", [False, True])
def test_grad_matches_unfused(skip):
    """The custom VJP equals autodiff through the unfused formulation
    (whose correction-term gradient vanishes at d = 0)."""
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.standard_normal((K, B, N, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, D, D)), jnp.float32)
    wmu = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)

    def f_kernel(t):
        g, mu = centered_token_gram(t, skip, True)
        return jnp.sum(g * w) + jnp.sum(mu * wmu)

    def f_unfused(t):
        if skip:
            t = t[:, :, 1:, :]
        g, mu = _unfused(t)
        return jnp.sum(g * w) + jnp.sum(mu * wmu)

    gk = jax.grad(f_kernel)(toks)
    gu = jax.grad(f_unfused)(toks)
    scale = float(jnp.max(jnp.abs(gu))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(gk) / scale, np.asarray(gu) / scale, atol=2e-5
    )


def test_selector_gram_vs_svd_backend_unchanged():
    """End-to-end: select_and_mix on the gram backend still tracks the
    svd parity backend after the kernel dispatch (CPU here runs the
    unfused path; this guards the shared surrounding code)."""
    from basd_tpu.losses.selector import SelectorConfig, init_selector, select_and_mix

    rng = np.random.default_rng(5)
    P, L, Bb, Nt, Ns, Dt, Ds = 2, 3, 4, 9, 9, 20, 12
    cfg_g = SelectorConfig(P, Ds, Dt, backend="gram")
    cfg_s = SelectorConfig(P, Ds, Dt, backend="svd")
    params, buffers = init_selector(jax.random.PRNGKey(0), cfg_g)
    s_tok = jnp.asarray(rng.standard_normal((P, Bb, Ns, Ds)), jnp.float32)
    t_tok = jnp.asarray(rng.standard_normal((L, Bb, Nt, Dt)), jnp.float32)
    t_imp = jnp.asarray(rng.random((L, Bb, Nt)), jnp.float32)
    mg, ig, auxg = select_and_mix(params, buffers, s_tok, t_tok, t_imp, cfg_g)
    ms, is_, auxs = select_and_mix(params, buffers, s_tok, t_tok, t_imp, cfg_s)
    np.testing.assert_allclose(
        np.asarray(auxg["mix_weights"]), np.asarray(auxs["mix_weights"]),
        atol=5e-4,
    )
    np.testing.assert_allclose(np.asarray(mg), np.asarray(ms), atol=5e-3)
