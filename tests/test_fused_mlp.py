"""Fused MLP Pallas kernel: value/grad parity vs the Dense path and
param-tree identity of the two ``Mlp`` branches.

The kernel replaces flax ``Dense -> gelu(tanh) -> Dense`` on the bf16
TPU path (reference semantics: timm ``Mlp`` as driven by
``src/models/teacher.py``); all comparisons here are against the
repo's own Dense branch, which is itself oracle-tested in
tests/test_models.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from basd_tpu.models.layers import Mlp
from basd_tpu.ops.pallas.fused_mlp import fused_mlp

RNG = np.random.default_rng(7)


def _dense_ref(x, w1, b1, w2, b2):
    y = (x @ w1.astype(x.dtype) + b1.astype(x.dtype)).astype(x.dtype)
    y = jax.nn.gelu(y, approximate=True)
    return (y @ w2.astype(x.dtype) + b2.astype(x.dtype)).astype(x.dtype)


def _mk(b, n, d, f):
    x = jnp.asarray(
        RNG.standard_normal((b, n, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w1 = jnp.asarray((RNG.standard_normal((d, f)) * 0.1).astype(np.float32))
    b1 = jnp.asarray((RNG.standard_normal((f,)) * 0.1).astype(np.float32))
    w2 = jnp.asarray((RNG.standard_normal((f, d)) * 0.1).astype(np.float32))
    b2 = jnp.asarray((RNG.standard_normal((d,)) * 0.1).astype(np.float32))
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("b,n", [(8, 13), (6, 9)])  # non-aligned N, odd tiles
def test_fused_mlp_forward_matches_dense(b, n):
    x, w1, b1, w2, b2 = _mk(b, n, 32, 128)
    o_ref = _dense_ref(x, w1, b1, w2, b2).astype(jnp.float32)
    o_f = fused_mlp(
        x, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2, True
    ).astype(jnp.float32)
    # the two paths differ only in rounding order: bound by one bf16 ulp
    # at the observed output scale
    scale = float(jnp.abs(o_ref).max())
    assert float(jnp.abs(o_ref - o_f).max()) <= 2 ** -7 * max(scale, 1.0)


def test_fused_mlp_grads_match_dense():
    x, w1, b1, w2, b2 = _mk(8, 13, 32, 128)

    def loss_ref(args, xx):
        return (_dense_ref(xx, *args).astype(jnp.float32) ** 2).sum()

    def loss_f(args, xx):
        w1, b1, w2, b2 = args
        return (
            fused_mlp(xx, w1.astype(xx.dtype), b1, w2.astype(xx.dtype), b2,
                      True).astype(jnp.float32) ** 2
        ).sum()

    args = (w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref)(args, x)
    g_f = jax.grad(loss_f)(args, x)
    for a, b_ in zip(g_ref, g_f):
        denom = float(jnp.abs(a).max())
        assert float(jnp.abs(a - b_).max()) <= 0.03 * max(denom, 1.0)
    dx_r = jax.grad(lambda xx: loss_ref(args, xx))(x).astype(jnp.float32)
    dx_f = jax.grad(lambda xx: loss_f(args, xx))(x).astype(jnp.float32)
    denom = float(jnp.abs(dx_r).max())
    assert float(jnp.abs(dx_r - dx_f).max()) <= 0.03 * max(denom, 1.0)


def test_mlp_branches_create_identical_params():
    """The fused branch's _DenseParams must reproduce nn.Dense's param
    tree bit-for-bit (names, shapes, AND init draws) so checkpoints and
    ports are branch-independent."""
    x = jnp.zeros((2, 5, 16), jnp.bfloat16)
    k = jax.random.PRNGKey(3)
    p_dense = Mlp(64, 16, dtype=jnp.bfloat16, mlp_impl="dense").init(k, x)
    p_fused = Mlp(64, 16, dtype=jnp.bfloat16, mlp_impl="fused").init(k, x)
    flat_d = jax.tree_util.tree_flatten_with_path(p_dense)
    flat_f = jax.tree_util.tree_flatten_with_path(p_fused)
    assert jax.tree_util.tree_structure(p_dense) == jax.tree_util.tree_structure(
        p_fused
    )
    for (path_d, leaf_d), (path_f, leaf_f) in zip(flat_d[0], flat_f[0]):
        assert path_d == path_f
        np.testing.assert_array_equal(np.asarray(leaf_d), np.asarray(leaf_f))


def test_mlp_fused_apply_matches_dense_apply():
    x = jnp.asarray(
        RNG.standard_normal((2, 5, 16)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = Mlp(64, 16, dtype=jnp.bfloat16, mlp_impl="dense").init(
        jax.random.PRNGKey(0), x
    )
    o_d = Mlp(64, 16, dtype=jnp.bfloat16, mlp_impl="dense").apply(params, x)
    o_f = Mlp(64, 16, dtype=jnp.bfloat16, mlp_impl="fused").apply(params, x)
    scale = float(jnp.abs(o_d.astype(jnp.float32)).max())
    assert (
        float(jnp.abs(o_d.astype(jnp.float32) - o_f.astype(jnp.float32)).max())
        <= 2 ** -7 * max(scale, 1.0)
    )
