"""Fused Pallas LayerNorm vs flax.linen.LayerNorm (interpret mode)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basd_tpu.ops.pallas.layernorm import fused_layernorm


@pytest.mark.parametrize("b,n,d", [(4, 197, 384), (2, 50, 64), (8, 128, 192)])
def test_fused_layernorm_matches_flax(b, n, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)) * 2 + 1, jnp.float32)
    w = jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32)
    bb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-6)
    ref = ln.apply({"params": {"scale": w, "bias": bb}}, x)
    out = fused_layernorm(x, w, bb, 1e-6, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_fused_layernorm_grads_match_flax():
    rng = np.random.default_rng(1)
    b, n, d = 3, 197, 128
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32)
    bb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-6)

    f1 = lambda x, w, bb: jnp.sum(
        jnp.sin(fused_layernorm(x, w, bb, 1e-6, True))
    )
    f0 = lambda x, w, bb: jnp.sum(
        jnp.sin(ln.apply({"params": {"scale": w, "bias": bb}}, x))
    )
    g1 = jax.grad(f1, argnums=(0, 1, 2))(x, w, bb)
    g0 = jax.grad(f0, argnums=(0, 1, 2))(x, w, bb)
    for a, c in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-4)


def test_model_param_structure_unchanged():
    """FusedLayerNorm and the conv PatchEmbed must keep the exact param
    pytree of round-1 checkpoints (norm1/{scale,bias},
    patch_embed/proj/{kernel,bias})."""
    from basd_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=2, num_classes=10)
    m = VisionTransformer(cfg)
    variables = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
    p = variables["params"]
    assert set(p["blocks"]["norm1"].keys()) == {"scale", "bias"}
    assert set(p["norm"].keys()) == {"scale", "bias"}
    assert p["patch_embed"]["proj"]["kernel"].shape == (3 * 8 * 8, 64)
    assert p["patch_embed"]["proj"]["bias"].shape == (64,)
