"""Fused Pallas attention vs the einsum reference path.

The einsum path is itself oracle-tested against torch sdpa semantics
(tests/test_models.py); here the flash kernel (interpret mode) must match
it to float tolerance in both values and gradients, including at
non-128-aligned sequence lengths (N=197: 224px/p16 + CLS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basd_tpu.ops.pallas.flash_attention import flash_attention


def _ref_attn(q, k, v, scale):
    s = jnp.einsum("bqhe,bkhe->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhe->bqhe", p, v)


@pytest.mark.parametrize(
    "b,n,h,e",
    [(4, 197, 3, 64), (2, 50, 2, 32), (8, 128, 1, 64), (3, 196, 6, 64)],
)
def test_flash_matches_einsum(b, n, h, e):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, e)), jnp.float32)
        for _ in range(3)
    )
    scale = e**-0.5
    o1 = flash_attention(q, k, v, scale, True)
    o0 = _ref_attn(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=5e-6)


def test_flash_gradients_match():
    rng = np.random.default_rng(1)
    b, n, h, e = 2, 197, 3, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, e)), jnp.float32)
        for _ in range(3)
    )
    scale = e**-0.5

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v, scale)))

    g1 = jax.grad(
        loss(lambda q, k, v, s: flash_attention(q, k, v, s, True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    g0 = jax.grad(loss(_ref_attn), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_model_flash_path_matches_einsum():
    from basd_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        num_classes=10,
    )
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    m_e = VisionTransformer(cfg, importance_mode="cls",
                            attention_impl="einsum")
    m_f = VisionTransformer(cfg, importance_mode="cls",
                            attention_impl="flash")
    variables = m_e.init(jax.random.PRNGKey(0), x)
    out_e = m_e.apply(variables, x, deterministic=True)
    out_f = m_f.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_f["logits"]), np.asarray(out_e["logits"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_f["tokens"]), np.asarray(out_e["tokens"]), atol=1e-4
    )
    # the fused in-kernel CLS-row importance must match the einsum
    # reduction (same f32 softmax math)
    np.testing.assert_allclose(
        np.asarray(out_f["importance"]),
        np.asarray(out_e["importance"]),
        atol=1e-6,
    )
