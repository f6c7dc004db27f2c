"""Fused LN+MLP+DropPath+residual Pallas kernel: value/grad parity vs
the unfused module chain, param-tree identity, and rng-stream identity
of the Block dispatch.

The kernel folds ``x + DropPath(fc2(gelu(fc1(LN(x)))))`` (the MLP half
of a pre-LN transformer block; reference: timm blocks driven by
``src/models/teacher.py``) into one VMEM-resident pass. All comparisons
are against the repo's own module chain (FusedLayerNorm flax fallback +
Mlp dense + DropPath), which is oracle-tested in tests/test_models.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from basd_tpu.models.layers import Block, DropPath, FusedLayerNorm, Mlp
from basd_tpu.ops.pallas.fused_block_mlp import fused_ln_mlp

RNG = np.random.default_rng(11)


def _ln_ref(x, s, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * s + b
    return y.astype(x.dtype)


def _chain_ref(x, mask, ln_s, ln_b, w1, b1, w2, b2):
    """Unfused composition: LN -> fc1 -> tanh-GELU -> fc2, then
    mask-multiply + residual (DropPath as a per-sample multiplier)."""
    xn = _ln_ref(x, ln_s, ln_b)
    y = (xn @ w1.astype(x.dtype) + b1.astype(x.dtype)).astype(x.dtype)
    y = jax.nn.gelu(y, approximate=True)
    y = (y @ w2.astype(x.dtype) + b2.astype(x.dtype)).astype(x.dtype)
    return (
        x.astype(jnp.float32)
        + y.astype(jnp.float32) * mask[:, None, None]
    ).astype(x.dtype)


def _mk(b, n, d, f):
    x = jnp.asarray(
        RNG.standard_normal((b, n, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ln_s = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(d).astype(np.float32))
    ln_b = jnp.asarray(0.1 * RNG.standard_normal(d).astype(np.float32))
    w1 = jnp.asarray((RNG.standard_normal((d, f)) * 0.1).astype(np.float32))
    b1 = jnp.asarray((RNG.standard_normal(f) * 0.1).astype(np.float32))
    w2 = jnp.asarray((RNG.standard_normal((f, d)) * 0.1).astype(np.float32))
    b2 = jnp.asarray((RNG.standard_normal(d) * 0.1).astype(np.float32))
    return x, ln_s, ln_b, w1, b1, w2, b2


@pytest.mark.parametrize("b,n", [(8, 13), (6, 9)])  # non-aligned N
def test_fused_ln_mlp_forward_matches_chain(b, n):
    x, ln_s, ln_b, w1, b1, w2, b2 = _mk(b, n, 32, 128)
    mask = jnp.asarray(RNG.choice([0.0, 1.25], size=b).astype(np.float32))
    o_ref = _chain_ref(x, mask, ln_s, ln_b, w1, b1, w2, b2).astype(
        jnp.float32
    )
    o_f = fused_ln_mlp(
        x, mask, ln_s, ln_b, w1.astype(x.dtype), b1, w2.astype(x.dtype),
        b2, 1e-6, True,
    ).astype(jnp.float32)
    scale = float(jnp.abs(o_ref).max())
    assert float(jnp.abs(o_ref - o_f).max()) <= 2 ** -7 * max(scale, 1.0)


def test_fused_ln_mlp_grads_match_chain():
    x, ln_s, ln_b, w1, b1, w2, b2 = _mk(8, 13, 32, 128)
    mask = jnp.ones((8,), jnp.float32)

    def loss_ref(args, xx):
        return (
            _chain_ref(xx, mask, *args).astype(jnp.float32) ** 2
        ).sum()

    def loss_f(args, xx):
        ln_s, ln_b, w1, b1, w2, b2 = args
        return (
            fused_ln_mlp(
                xx, mask, ln_s, ln_b, w1.astype(xx.dtype), b1,
                w2.astype(xx.dtype), b2, 1e-6, True,
            ).astype(jnp.float32) ** 2
        ).sum()

    args = (ln_s, ln_b, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref)(args, x)
    g_f = jax.grad(loss_f)(args, x)
    for name, a, b_ in zip(
        ("ln_s", "ln_b", "w1", "b1", "w2", "b2"), g_ref, g_f
    ):
        denom = float(jnp.abs(a).max())
        assert (
            float(jnp.abs(a - b_).max()) <= 0.03 * max(denom, 1.0)
        ), name
    dx_r = jax.grad(lambda xx: loss_ref(args, xx))(x).astype(jnp.float32)
    dx_f = jax.grad(lambda xx: loss_f(args, xx))(x).astype(jnp.float32)
    denom = float(jnp.abs(dx_r).max())
    assert float(jnp.abs(dx_r - dx_f).max()) <= 0.03 * max(denom, 1.0)


def test_fused_ln_mlp_mask_zeroes_and_scales():
    """mask=0 rows must return x exactly; the masked gradient must be
    zero for dropped samples (stochastic-depth semantics)."""
    x, ln_s, ln_b, w1, b1, w2, b2 = _mk(4, 9, 32, 64)
    mask = jnp.asarray([0.0, 2.0, 0.0, 2.0], jnp.float32)
    o = fused_ln_mlp(
        x, mask, ln_s, ln_b, w1.astype(x.dtype), b1, w2.astype(x.dtype),
        b2, 1e-6, True,
    )
    np.testing.assert_array_equal(
        np.asarray(o[0], np.float32), np.asarray(x[0], np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(o[2], np.float32), np.asarray(x[2], np.float32)
    )

    def loss(w1_):
        return (
            fused_ln_mlp(
                x, mask, ln_s, ln_b, w1_.astype(x.dtype), b1,
                w2.astype(x.dtype), b2, 1e-6, True,
            ).astype(jnp.float32) ** 2
        ).sum()

    # dx for dropped samples is exactly the upstream gradient (pure
    # residual pass-through)
    def loss_x(xx):
        return (
            fused_ln_mlp(
                xx, mask, ln_s, ln_b, w1.astype(x.dtype), b1,
                w2.astype(x.dtype), b2, 1e-6, True,
            ).astype(jnp.float32) ** 2
        ).sum()

    dx = jax.grad(loss_x)(x)
    # for mask=0 rows, out == x so dloss/dx == 2x exactly
    np.testing.assert_allclose(
        np.asarray(dx[0], np.float32),
        2.0 * np.asarray(x[0], np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_fused_ln_mlp_collect_matches_and_preserves_rows():
    """The collect variant must return the same `out` as fused_ln_mlp,
    write it into row `layer` of the stack, and leave other rows
    untouched (aliased in-place update)."""
    from basd_tpu.ops.pallas.fused_block_mlp import fused_ln_mlp_collect

    x, ln_s, ln_b, w1, b1, w2, b2 = _mk(8, 13, 32, 128)
    mask = jnp.ones((8,), jnp.float32)
    L = 3
    m = 8 * 13
    sentinel = jnp.full((L * m, 32), 7.0, x.dtype)  # flat (L*B*N, D) stack
    args = (x, mask, ln_s, ln_b, w1.astype(x.dtype), b1,
            w2.astype(x.dtype), b2)
    o_ref = fused_ln_mlp(*args, 1e-6, True)
    buf = sentinel
    outs = []
    for layer in range(L):
        o, buf = fused_ln_mlp_collect(
            *args, buf, jnp.int32(layer), 1e-6, True
        )
        outs.append(o)
    for o in outs:
        np.testing.assert_array_equal(
            np.asarray(o, np.float32), np.asarray(o_ref, np.float32)
        )
    buf4 = buf.reshape(L, 8, 13, 32)
    for layer in range(L):
        np.testing.assert_array_equal(
            np.asarray(buf4[layer], np.float32),
            np.asarray(o_ref, np.float32),
        )
    # partial write preserves other layers' slabs
    buf2 = fused_ln_mlp_collect(
        *args, sentinel, jnp.int32(1), 1e-6, True
    )[1].reshape(L, 8, 13, 32)
    sent4 = sentinel.reshape(L, 8, 13, 32)
    np.testing.assert_array_equal(
        np.asarray(buf2[0], np.float32), np.asarray(sent4[0], np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(buf2[2], np.float32), np.asarray(sent4[2], np.float32)
    )


def test_fused_ln_mlp_collect_tiny_unaligned_fallback():
    """Shapes with no 8-aligned row tile (B*N % 8 != 0) take the
    DUS fallback; semantics must be identical."""
    from basd_tpu.ops.pallas.fused_block_mlp import fused_ln_mlp_collect

    x, ln_s, ln_b, w1, b1, w2, b2 = _mk(4, 5, 32, 64)
    mask = jnp.ones((4,), jnp.float32)
    args = (x, mask, ln_s, ln_b, w1.astype(x.dtype), b1,
            w2.astype(x.dtype), b2)
    o_ref = fused_ln_mlp(*args, 1e-6, True)
    buf = jnp.full((2 * 4 * 5, 32), 3.0, x.dtype)  # flat (L*B*N, D)
    o, buf = fused_ln_mlp_collect(*args, buf, jnp.int32(1), 1e-6, True)
    buf = buf.reshape(2, 4, 5, 32)
    np.testing.assert_array_equal(
        np.asarray(o, np.float32), np.asarray(o_ref, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(buf[1], np.float32), np.asarray(o_ref, np.float32)
    )
    assert float(jnp.max(jnp.abs(buf[0].astype(jnp.float32) - 3.0))) == 0.0


def test_vit_collect_alias_matches_scan_collect():
    """VisionTransformer(collect_alias=True) must produce identical
    logits/tokens/importance to the default scan-with-collect path (the
    module-chain fallback uses dynamic_update_slice; same param tree)."""
    from basd_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=4,
        num_classes=0,
    )
    x = jnp.asarray(RNG.standard_normal((2, 32, 32, 3)).astype(np.float32))
    m_ref = VisionTransformer(cfg, importance_mode="cls")
    m_alias = VisionTransformer(
        cfg, importance_mode="cls", collect_alias=True
    )
    params = m_ref.init(jax.random.PRNGKey(0), x)
    params2 = m_alias.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params2
    )
    o_ref = m_ref.apply(params, x)
    o_alias = m_alias.apply(params, x)
    for k in ("logits", "importance"):
        np.testing.assert_allclose(
            np.asarray(o_ref[k], np.float32),
            np.asarray(o_alias[k], np.float32),
            rtol=0, atol=0, err_msg=k,
        )
    # the alias path returns a PackedTokens (flat + CLS slab); its dense
    # view must bit-match the scan-collect strip, and the CLS slab must
    # equal the per-layer CLS rows
    pt = o_alias["tokens"]
    np.testing.assert_allclose(
        np.asarray(o_ref["tokens"], np.float32),
        np.asarray(pt.to_dense(), np.float32),
        rtol=0, atol=0, err_msg="tokens",
    )
    full = pt.flat.reshape(pt.num_layers, pt.batch, pt.num_tokens, -1)
    np.testing.assert_array_equal(
        np.asarray(pt.cls, np.float32),
        np.asarray(full[:, :, 0, :], np.float32),
    )


@pytest.mark.parametrize("ls", [None, 0.7])
def test_block_fused_attn_matches_module_chain(ls):
    """The fused attention-half kernel (LN1+qkv+flash+proj+residual) must
    match the einsum module chain on tokens AND cls importance, with an
    identical param tree; LayerScale folds into the proj weights."""

    def mk(impl):
        return Block(
            num_heads=4, mlp_ratio=4.0, importance_mode="cls",
            layerscale_init=ls, deterministic=True, dtype=jnp.bfloat16,
            attention_impl=impl, mlp_impl="dense",
        )

    x = jnp.asarray(
        RNG.standard_normal((4, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    blk_m, blk_f = mk("einsum"), mk("fused_block")
    p_m = blk_m.init({"params": jax.random.PRNGKey(0)}, x, 0.0)
    p_f = blk_f.init({"params": jax.random.PRNGKey(0)}, x, 0.0)
    assert jax.tree_util.tree_structure(p_m) == jax.tree_util.tree_structure(
        p_f
    )
    flat_m = jax.tree_util.tree_flatten_with_path(p_m)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(p_f)[0]
    for (path_m, leaf_m), (path_f, leaf_f) in zip(flat_m, flat_f):
        assert path_m == path_f
        np.testing.assert_array_equal(np.asarray(leaf_m), np.asarray(leaf_f))

    (x_m, (tok_m, imp_m)) = blk_m.apply(p_m, x, 0.0)
    (x_f, (tok_f, imp_f)) = blk_f.apply(p_m, x, 0.0)
    a = np.asarray(x_m, np.float32)
    b = np.asarray(x_f, np.float32)
    scale = float(np.abs(a).max())
    assert float(np.abs(a - b).max()) <= 2 ** -6 * max(scale, 1.0)
    ia, ib = np.asarray(imp_m), np.asarray(imp_f)
    assert ia.shape == ib.shape == (4, 8)
    assert float(np.abs(ia - ib).max()) <= 2e-2 * max(float(ia.max()), 1e-6)


def test_vit_full_fused_teacher_path_interpret():
    """The complete TPU teacher configuration — fused attention-half
    kernel + fused LN+MLP collect kernel + aliased stack — run through
    a whole VisionTransformer in interpret mode must match the module
    chain (same params) to bf16 rounding on tokens, importance, and
    logits."""
    from basd_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=4,
        num_classes=10,
    )
    x = jnp.asarray(
        RNG.standard_normal((8, 32, 32, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    m_ref = VisionTransformer(cfg, importance_mode="cls", dtype=jnp.bfloat16)
    m_fused = VisionTransformer(
        cfg, importance_mode="cls", dtype=jnp.bfloat16,
        attention_impl="fused_block", mlp_impl="fused_ln",
        collect_alias=True,
    )
    params = m_ref.init(jax.random.PRNGKey(0), x)
    p2 = m_fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        p2
    )
    o_ref = m_ref.apply(params, x)
    o_f = m_fused.apply(params, x)
    o_f = dict(o_f, tokens=o_f["tokens"].to_dense())  # packed collection
    for k, tol in (("tokens", 2 ** -5), ("logits", 2 ** -5)):
        a = np.asarray(o_ref[k], np.float32)
        b = np.asarray(o_f[k], np.float32)
        scale = float(np.abs(a).max())
        assert float(np.abs(a - b).max()) <= tol * max(scale, 1.0), k
    ia = np.asarray(o_ref["importance"])
    ib = np.asarray(o_f["importance"])
    assert float(np.abs(ia - ib).max()) <= 2e-2 * max(float(ia.max()), 1e-6)


@pytest.mark.parametrize("ls", [None, 0.7])
def test_block_fused_attn_train_matches_module_chain(ls):
    """The differentiable fused attention-half kernel (student path) must
    match the einsum module chain on values, with an identical param
    tree; LayerScale folds into the proj weights differentiably."""

    def mk(impl):
        return Block(
            num_heads=4, mlp_ratio=4.0, importance_mode=None,
            layerscale_init=ls, deterministic=True, dtype=jnp.bfloat16,
            attention_impl=impl, mlp_impl="dense",
        )

    x = jnp.asarray(
        RNG.standard_normal((4, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    blk_m, blk_f = mk("einsum"), mk("fused_block_train")
    p_m = blk_m.init({"params": jax.random.PRNGKey(0)}, x, 0.0)
    p_f = blk_f.init({"params": jax.random.PRNGKey(0)}, x, 0.0)
    assert jax.tree_util.tree_structure(p_m) == jax.tree_util.tree_structure(
        p_f
    )
    flat_m = jax.tree_util.tree_flatten_with_path(p_m)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(p_f)[0]
    for (path_m, leaf_m), (path_f, leaf_f) in zip(flat_m, flat_f):
        assert path_m == path_f
        np.testing.assert_array_equal(np.asarray(leaf_m), np.asarray(leaf_f))

    (x_m, _), (x_f, _) = blk_m.apply(p_m, x, 0.0), blk_f.apply(p_m, x, 0.0)
    a = np.asarray(x_m, np.float32)
    b = np.asarray(x_f, np.float32)
    scale = float(np.abs(a).max())
    assert float(np.abs(a - b).max()) <= 2 ** -6 * max(scale, 1.0)


def test_block_fused_attn_train_grads_match_module_chain():
    """Full VJP parity: gradients of sum(out^2) wrt x and every param
    (LN affine, qkv, proj) through the fused kernel must match the
    einsum module chain to bf16-accumulated tolerance."""

    def mk(impl):
        return Block(
            num_heads=4, mlp_ratio=4.0, importance_mode=None,
            deterministic=True, dtype=jnp.bfloat16,
            attention_impl=impl, mlp_impl="dense",
        )

    x = jnp.asarray(
        RNG.standard_normal((4, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    blk_m, blk_f = mk("einsum"), mk("fused_block_train")
    params = blk_m.init({"params": jax.random.PRNGKey(0)}, x, 0.0)

    def loss(blk):
        def f(p, xx):
            o, _ = blk.apply(p, xx, 0.0)
            return (o.astype(jnp.float32) ** 2).sum()

        return f

    g_m = jax.grad(loss(blk_m))(params, x)["params"]
    g_f = jax.grad(loss(blk_f))(params, x)["params"]
    flat_m = jax.tree_util.tree_flatten_with_path(g_m)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    assert len(flat_m) == len(flat_f)
    for (path_m, a), (path_f, b) in zip(flat_m, flat_f):
        assert path_m == path_f
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = float(np.abs(a).max())
        assert (
            float(np.abs(a - b).max()) <= 0.05 * max(denom, 1.0)
        ), jax.tree_util.keystr(path_m)

    dx_m = jax.grad(lambda xx: loss(blk_m)(params, xx))(x)
    dx_f = jax.grad(lambda xx: loss(blk_f)(params, xx))(x)
    a = np.asarray(dx_m, np.float32)
    b = np.asarray(dx_f, np.float32)
    denom = float(np.abs(a).max())
    assert float(np.abs(a - b).max()) <= 0.05 * max(denom, 1.0)


def test_block_fused_attn_train_droppath_stream_identical():
    """With stochastic depth active, the fused-train branch must draw the
    SAME per-sample mask as the module DropPath (both use
    name='drop_path1'): dropped samples are exactly the attention-half
    residual in both, and gradients vanish on dropped samples' attention
    params contribution."""
    rate = 0.5

    def mk(impl):
        return Block(
            num_heads=4, mlp_ratio=4.0, importance_mode=None,
            drop_path_max=rate, deterministic=False, dtype=jnp.bfloat16,
            attention_impl=impl, mlp_impl="dense",
        )

    blk_m, blk_f = mk("einsum"), mk("fused_block_train")
    x = jnp.asarray(
        RNG.standard_normal((16, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = blk_m.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(5)},
        x, rate,
    )
    dp = {"droppath": jax.random.PRNGKey(42)}
    o_m, _ = blk_m.apply(params, x, rate, rngs=dp)
    o_f, _ = blk_f.apply(params, x, rate, rngs=dp)
    a = np.asarray(o_m[0], np.float32)
    b = np.asarray(o_f[0], np.float32)
    scale = float(np.abs(a).max())
    # identical masks => agreement to bf16 rounding; a mask mismatch on
    # any sample would produce O(1) relative differences
    assert float(np.abs(a - b).max()) <= 2 ** -6 * max(scale, 1.0)


def test_block_fused_attn_train_layerscale_gamma_grad():
    """ls1 gamma must receive gradient through the differentiable fold."""
    blk = Block(
        num_heads=4, mlp_ratio=4.0, importance_mode=None,
        layerscale_init=0.7, deterministic=True, dtype=jnp.bfloat16,
        attention_impl="fused_block_train", mlp_impl="dense",
    )
    x = jnp.asarray(
        RNG.standard_normal((4, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = blk.init({"params": jax.random.PRNGKey(0)}, x, 0.0)

    def loss(p):
        o, _ = blk.apply(p, x, 0.0)
        return (o.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(params)["params"]
    assert float(jnp.abs(g["ls1"]["gamma"]).max()) > 0.0
    assert float(jnp.abs(g["attn"]["qkv"]["kernel"]).max()) > 0.0


def test_vit_full_fused_student_path_grads_interpret():
    """The complete TPU student training configuration — differentiable
    fused attention-half kernel + fused LN+MLP kernel, under remat —
    must produce logits/tokens AND parameter gradients matching the
    module chain (same params) to bf16-accumulated tolerance."""
    from basd_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        num_classes=10,
    )
    x = jnp.asarray(
        RNG.standard_normal((4, 32, 32, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    m_ref = VisionTransformer(
        cfg, importance_mode=None, dtype=jnp.bfloat16, remat=True,
        attention_impl="einsum", mlp_impl="dense",
    )
    m_fused = VisionTransformer(
        cfg, importance_mode=None, dtype=jnp.bfloat16, remat=True,
        attention_impl="fused_block_train", mlp_impl="fused_ln",
    )
    params = m_ref.init(jax.random.PRNGKey(0), x)
    p2 = m_fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        p2
    )

    def loss(m):
        def f(p):
            o = m.apply(p, x)
            return (
                (o["logits"].astype(jnp.float32) ** 2).sum()
                + (o["tokens"].astype(jnp.float32) ** 2).sum()
            )

        return f

    l_ref, g_ref = jax.value_and_grad(loss(m_ref))(params)
    l_f, g_f = jax.value_and_grad(loss(m_fused))(params)
    assert abs(float(l_ref) - float(l_f)) <= 0.02 * abs(float(l_ref))
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    for (path_r, a), (path_f, b) in zip(flat_r, flat_f):
        assert path_r == path_f
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = float(np.abs(a).max())
        assert (
            float(np.abs(a - b).max()) <= 0.06 * max(denom, 1.0)
        ), jax.tree_util.keystr(path_r)


def test_block_fused_attn_falls_back_when_unfusable():
    """fused_block with active stochastic depth (non-deterministic) must
    fall back to the module chain rather than silently dropping the
    droppath draw."""
    blk = Block(
        num_heads=4, mlp_ratio=4.0, importance_mode="cls",
        drop_path_max=0.5, deterministic=False, dtype=jnp.bfloat16,
        attention_impl="fused_block", mlp_impl="dense",
    )
    x = jnp.asarray(
        RNG.standard_normal((4, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = blk.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        x, 0.5,
    )
    # the module-chain fallback draws droppath rng -> apply must demand it
    out, _ = blk.apply(
        params, x, 0.5, rngs={"droppath": jax.random.PRNGKey(2)}
    )
    assert out.shape == x.shape


def _block_params_and_apply(impl, deterministic, rate=0.0):
    blk = Block(
        num_heads=4,
        mlp_ratio=4.0,
        importance_mode=None,
        drop_path_max=rate,
        deterministic=deterministic,
        dtype=jnp.bfloat16,
        attention_impl="einsum",
        mlp_impl=impl,
    )
    x = jnp.asarray(
        RNG.standard_normal((4, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "droppath": jax.random.PRNGKey(5),
    }
    params = blk.init(rngs, x, 0.5 if rate else 0.0)
    return blk, params, x


def test_block_fused_ln_param_tree_identical():
    """Block with mlp_impl='fused_ln' must create the exact same param
    tree (paths, shapes, init values) as the module chain, so
    checkpoints/ports are dispatch-independent."""
    _, p_mod, _ = _block_params_and_apply("dense", True)
    _, p_fused, _ = _block_params_and_apply("fused_ln", True)
    assert jax.tree_util.tree_structure(p_mod) == jax.tree_util.tree_structure(
        p_fused
    )
    flat_m = jax.tree_util.tree_flatten_with_path(p_mod)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    for (path_m, leaf_m), (path_f, leaf_f) in zip(flat_m, flat_f):
        assert path_m == path_f
        np.testing.assert_array_equal(np.asarray(leaf_m), np.asarray(leaf_f))


def test_block_fused_ln_matches_module_chain():
    blk_m, params, x = _block_params_and_apply("dense", True)
    blk_f = Block(
        num_heads=4, mlp_ratio=4.0, importance_mode=None,
        deterministic=True, dtype=jnp.bfloat16,
        attention_impl="einsum", mlp_impl="fused_ln",
    )
    o_m, _ = blk_m.apply(params, x, 0.0)
    o_f, _ = blk_f.apply(params, x, 0.0)
    a = np.asarray(o_m[0], np.float32)
    b = np.asarray(o_f[0], np.float32)
    scale = float(np.abs(a).max())
    assert float(np.abs(a - b).max()) <= 2 ** -6 * max(scale, 1.0)


def test_block_fused_ln_layerscale_matches_module_chain():
    """LayerScale (dinov2-style) blocks use the fused kernel with gamma
    folded into the fc2 weights outside the kernel; values must match the
    module chain (LN -> MLP -> LayerScale -> residual) to bf16 rounding,
    the param tree must be identical, and gamma must receive gradient."""

    def mk_blk(impl):
        return Block(
            num_heads=4, mlp_ratio=4.0, importance_mode=None,
            layerscale_init=1e-5, deterministic=True, dtype=jnp.bfloat16,
            attention_impl="einsum", mlp_impl=impl,
        )

    x = jnp.asarray(
        RNG.standard_normal((4, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    blk_m, blk_f = mk_blk("dense"), mk_blk("fused_ln")
    p_m = blk_m.init({"params": jax.random.PRNGKey(0)}, x, 0.0)
    p_f = blk_f.init({"params": jax.random.PRNGKey(0)}, x, 0.0)
    assert jax.tree_util.tree_structure(p_m) == jax.tree_util.tree_structure(
        p_f
    )
    # gamma is tiny (1e-5) so the MLP contribution is ~1e-5 of x; compare
    # against a non-trivial gamma too by overwriting it
    p_big = jax.tree_util.tree_map(lambda a: a, p_m)
    p_big["params"]["ls2"]["gamma"] = jnp.full((32,), 0.7, jnp.float32)
    for params in (p_m, p_big):
        o_m, _ = blk_m.apply(params, x, 0.0)
        o_f, _ = blk_f.apply(params, x, 0.0)
        a = np.asarray(o_m[0], np.float32)
        b = np.asarray(o_f[0], np.float32)
        scale = float(np.abs(a).max())
        assert float(np.abs(a - b).max()) <= 2 ** -6 * max(scale, 1.0)

    # gamma gradient flows through the fold
    def loss(g):
        p = jax.tree_util.tree_map(lambda a: a, p_big)
        p["params"]["ls2"]["gamma"] = g
        o, _ = blk_f.apply(p, x, 0.0)
        return (o.astype(jnp.float32) ** 2).sum()

    dg = jax.grad(loss)(p_big["params"]["ls2"]["gamma"])
    assert float(jnp.abs(dg).max()) > 0.0


def test_block_fused_ln_droppath_stream_identical():
    """With stochastic depth active, the fused branch must draw the SAME
    per-sample mask as the module DropPath (rng stream is path-keyed, and
    both use name='drop_path2'): kept samples match to bf16 rounding and
    dropped samples are exactly the residual in both."""
    rate = 0.5
    blk_m = Block(
        num_heads=4, mlp_ratio=4.0, importance_mode=None,
        drop_path_max=rate, deterministic=False, dtype=jnp.bfloat16,
        attention_impl="einsum", mlp_impl="dense",
    )
    blk_f = Block(
        num_heads=4, mlp_ratio=4.0, importance_mode=None,
        drop_path_max=rate, deterministic=False, dtype=jnp.bfloat16,
        attention_impl="einsum", mlp_impl="fused_ln",
    )
    x = jnp.asarray(
        RNG.standard_normal((16, 9, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = blk_m.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(5)},
        x, rate,
    )
    dp = {"droppath": jax.random.PRNGKey(42)}
    o_m, _ = blk_m.apply(params, x, rate, rngs=dp)
    o_f, _ = blk_f.apply(params, x, rate, rngs=dp)
    a = np.asarray(o_m[0], np.float32)
    b = np.asarray(o_f[0], np.float32)
    scale = float(np.abs(a).max())
    # identical masks => everything agrees to bf16 rounding; a mask
    # mismatch on any sample would produce O(1) relative differences
    assert float(np.abs(a - b).max()) <= 2 ** -6 * max(scale, 1.0)
