"""Fused LN -> MLP -> DropPath -> residual-add in one kernel (Pallas, TPU).

Extends ``fused_mlp`` (same fc1 -> tanh-GELU -> fc2 core) by folding in
the *pre*-LayerNorm and the residual add of a transformer block's MLP
half:

    out = x + mask * fc2(gelu(fc1(LN(x))))

Motivation (traced, v5e, B=512, N=197): with the LN and the residual add
outside the kernel, each block-MLP half costs five full HBM slab passes
(LN read+write, MLP read+write, add read) forward — and the backward
pays the LN-recompute and LN-VJP round trips again under remat. Folding
them in collapses the forward to ONE read of x and ONE write of out
(~0.3 ms/layer saved on the teacher's 77 MB slabs, ~half that on the
student, fwd and bwd), with no change to the math: LN statistics stay
f32 (two-pass variance, identical to ``ops.pallas.layernorm``), the LN
output is rounded to bf16 exactly where ``FusedLayerNorm`` hands off to
``Dense``, and the MLP core is bit-identical to ``fused_mlp``.

``mask`` is the stochastic-depth multiplier, one f32 row per token
(values 0 or 1/keep, constant across each image's tokens; all-ones when
deterministic) — ``DropPath``'s ``where(keep_mask, y/keep, 0)`` written
as a multiply. LayerScale blocks (dinov2-style) use this kernel too: the
caller folds gamma into the fc2 weights OUTSIDE the kernel with plain
differentiable ops (see ``models.layers.Block``), so gradients reach
both w2 and gamma exactly.

Backward is recompute-based like ``fused_mlp``: nothing but (x, mask)
and the params are saved; the kernel re-derives LN stats and the hidden
state per tile, then accumulates dw1/db1/dw2/db2/dscale/dbias in
revisited f32 VMEM blocks over a sequential row-tile grid, emitting

    dx = do + LN_vjp(W1^T dpre)        (residual + normed-path gradient)

Reference semantics: pre-LN timm block (``src/models/teacher.py``
drives timm ViTs; LN math per flax.linen.LayerNorm defaults).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basd_tpu.ops.pallas.fused_mlp import (
    _dot,
    _full,
    _gelu_tanh,
    _gelu_tanh_grad,
    _row_tile,
)

_F32 = jnp.float32


def _ln_stats(xf, d):
    # row stats staged as explicit sum + broadcast (Mosaic's layout
    # inference is fragile around keepdims reductions; see CLAUDE.md)
    inv_d = 1.0 / d
    mu = jnp.sum(xf, axis=-1, keepdims=True) * inv_d
    xc = xf - mu
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) * inv_d
    return xc, var


def _fwd_kernel(
    x_ref, m_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, eps: float, d: int,
):
    x = x_ref[...]  # (M, D)
    xf = x.astype(_F32)
    xc, var = _ln_stats(xf, d)
    rstd = jax.lax.rsqrt(var + eps)
    xn = (xc * rstd) * s_ref[...] + b_ref[...]
    xnb = xn.astype(x_ref.dtype)  # round where FusedLayerNorm returns bf16

    pre = _dot(xnb, w1_ref[...], ((1,), (0,))) + b1_ref[...]
    preb = pre.astype(x_ref.dtype).astype(_F32)
    h, _ = _gelu_tanh(preb)
    hb = h.astype(x_ref.dtype)
    y = _dot(hb, w2_ref[...], ((1,), (0,))) + b2_ref[...]
    # round to bf16 where Dense returns, then mask + residual in f32
    yb = y.astype(x_ref.dtype).astype(_F32)
    o_ref[...] = (xf + yb * m_ref[...]).astype(o_ref.dtype)


def _bwd_kernel(
    x_ref, m_ref, do_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, ds_ref, dbl_ref,
    *, eps: float, d: int,
):
    x = x_ref[...]
    xf = x.astype(_F32)
    xc, var = _ln_stats(xf, d)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    s = s_ref[...]  # (1, D) f32
    xn = xhat * s + b_ref[...]
    xnb = xn.astype(x.dtype)

    # recompute the hidden state
    pre = _dot(xnb, w1_ref[...], ((1,), (0,))) + b1_ref[...]
    preb = pre.astype(x.dtype).astype(_F32)
    h, t = _gelu_tanh(preb)
    hb = h.astype(x.dtype)

    do = do_ref[...]
    dof = do.astype(_F32)
    dy = dof * m_ref[...]  # gradient at the MLP output (post-mask)
    dyb = dy.astype(x.dtype)

    dw2 = _dot(hb, dyb, ((0,), (0,)))  # (F, D) f32
    db2 = jnp.sum(dy, axis=0, keepdims=True)

    dh = _dot(dyb, w2_ref[...], ((1,), (1,)))  # (M, F) f32
    dpre = dh * _gelu_tanh_grad(preb, t)
    dpreb = dpre.astype(x.dtype)

    dw1 = _dot(xnb, dpreb, ((0,), (0,)))  # (D, F) f32
    db1 = jnp.sum(dpre, axis=0, keepdims=True)
    dxn = _dot(dpreb, w1_ref[...], ((1,), (1,)))  # (M, D) f32

    ds = jnp.sum(dxn * xhat, axis=0, keepdims=True)  # (1, D)
    dbl = jnp.sum(dxn, axis=0, keepdims=True)

    # LN VJP (per row): g = dxn * scale
    inv_d = 1.0 / d
    g = dxn * s
    mg = jnp.sum(g, axis=-1, keepdims=True) * inv_d
    mgx = jnp.sum(g * xhat, axis=-1, keepdims=True) * inv_d
    dxln = rstd * (g - mg - xhat * mgx)
    dx_ref[...] = (dof + dxln).astype(dx_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        ds_ref[...] = ds
        dbl_ref[...] = dbl

    @pl.when(i > 0)
    def _acc():
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2
        ds_ref[...] += ds
        dbl_ref[...] += dbl


def _fwd(x, mask, ln_s, ln_b, w1, b1, w2, b2, eps, interpret):
    b, n, d = x.shape
    f = w1.shape[1]
    m = b * n
    mt = _row_tile(b, n)
    x2 = x.reshape(m, d)
    m2 = jnp.broadcast_to(
        mask.astype(_F32).reshape(b, 1, 1), (b, n, 1)
    ).reshape(m, 1)
    tile = pl.BlockSpec((mt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mtile = pl.BlockSpec((mt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, eps=eps, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(m // mt,),
        in_specs=[tile, mtile, _full((1, d)), _full((1, d)),
                  _full((d, f)), _full((1, f)), _full((f, d)),
                  _full((1, d))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, m2, ln_s.reshape(1, d).astype(_F32),
      ln_b.reshape(1, d).astype(_F32), w1,
      b1.reshape(1, f).astype(_F32), w2, b2.reshape(1, d).astype(_F32))
    return out.reshape(b, n, d)


def _bwd(x, mask, do, ln_s, ln_b, w1, b1, w2, eps, interpret):
    b, n, d = x.shape
    f = w1.shape[1]
    m = b * n
    mt = _row_tile(b, n)
    x2 = x.reshape(m, d)
    do2 = do.reshape(m, d)
    m2 = jnp.broadcast_to(
        mask.astype(_F32).reshape(b, 1, 1), (b, n, 1)
    ).reshape(m, 1)
    tile = pl.BlockSpec((mt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mtile = pl.BlockSpec((mt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, eps=eps, d=d)
    dx, dw1, db1, dw2, db2, ds, dbl = pl.pallas_call(
        kernel,
        grid=(m // mt,),
        in_specs=[tile, mtile, tile, _full((1, d)), _full((1, d)),
                  _full((d, f)), _full((1, f)), _full((f, d))],
        out_specs=(
            tile,
            _full((d, f)), _full((1, f)),
            _full((f, d)), _full((1, d)),
            _full((1, d)), _full((1, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, d), x.dtype),
            jax.ShapeDtypeStruct((d, f), _F32),
            jax.ShapeDtypeStruct((1, f), _F32),
            jax.ShapeDtypeStruct((f, d), _F32),
            jax.ShapeDtypeStruct((1, d), _F32),
            jax.ShapeDtypeStruct((1, d), _F32),
            jax.ShapeDtypeStruct((1, d), _F32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # weight/LN gradient blocks are revisited every program
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x2, m2, do2, ln_s.reshape(1, d).astype(_F32),
      ln_b.reshape(1, d).astype(_F32), w1,
      b1.reshape(1, f).astype(_F32), w2)
    return dx.reshape(b, n, d), dw1, db1, dw2, db2, ds, dbl


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_ln_mlp(x, mask, ln_scale, ln_bias, w1, b1, w2, b2,
                 eps=1e-6, interpret=False):
    """``x + mask * fc2(tanh-GELU(fc1(LayerNorm(x))))`` in one kernel.

    Args:
        x: (B, N, D) activations (bf16 on the TPU path).
        mask: (B,) f32 stochastic-depth multipliers (0 or 1/keep per
            sample; pass ones when deterministic). Not differentiated.
        ln_scale, ln_bias: (D,) LayerNorm affine params (f32).
        w1: (D, F) fc1 kernel cast to x.dtype; b1: (F,) f32.
        w2: (F, D) fc2 kernel cast to x.dtype; b2: (D,) f32.

    Returns:
        (B, N, D) in x.dtype.
    """
    return _fwd(x, mask, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret)


def _fwd_collect_kernel(
    l_ref, x_ref, m_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    buf_in_ref, o_ref, buf_ref, *, eps: float, d: int,
):
    del l_ref, buf_in_ref  # layer index is consumed by the index_map only
    x = x_ref[...]
    xf = x.astype(_F32)
    xc, var = _ln_stats(xf, d)
    rstd = jax.lax.rsqrt(var + eps)
    xn = (xc * rstd) * s_ref[...] + b_ref[...]
    xnb = xn.astype(x_ref.dtype)

    pre = _dot(xnb, w1_ref[...], ((1,), (0,))) + b1_ref[...]
    preb = pre.astype(x_ref.dtype).astype(_F32)
    h, _ = _gelu_tanh(preb)
    hb = h.astype(x_ref.dtype)
    y = _dot(hb, w2_ref[...], ((1,), (0,))) + b2_ref[...]
    yb = y.astype(x_ref.dtype).astype(_F32)
    out = (xf + yb * m_ref[...]).astype(o_ref.dtype)
    o_ref[...] = out
    # second write: the SAME VMEM tile goes into row `layer` of the
    # (L, B*N, D) collection stack — this replaces the (L, B, N, D)
    # concatenate XLA otherwise emits for unrolled scan-with-collect
    # (traced 8.2 ms/step at B=512 teacher shapes vs ~1.3 ms of extra
    # tile writes here; reference collects via forward hooks,
    # src/models/teacher.py:193-212)
    buf_ref[...] = out


def fused_ln_mlp_collect(
    x, mask, ln_scale, ln_bias, w1, b1, w2, b2, buf, layer,
    eps=1e-6, interpret=False,
):
    """``fused_ln_mlp`` that also writes the block output into row
    ``layer`` of the collection stack ``buf`` in the same kernel pass.

    FORWARD-ONLY (no VJP): intended for the frozen teacher, whose
    collected tokens are ``stop_gradient``-ed by the selector. ``buf``
    is the FLAT (L * B * N, D) collection stack — kept flat end to end
    because its 4-D view is a real whole-stack relayout copy on TPU
    (see models.tokens.PackedTokens) — updated IN PLACE via
    ``input_output_aliases`` (donate it: pass the carried stack, use the
    returned one). Rows other than layer ``layer``'s slab are preserved.

    Returns ``(out, buf)`` with ``out = x + mask * mlp(LN(x))`` exactly
    as ``fused_ln_mlp`` and ``buf[layer*B*N:(layer+1)*B*N] == out``.
    """
    b, n, d = x.shape
    f = w1.shape[1]
    m = b * n
    mt = _row_tile(b, n)
    nblk = m // mt
    if mt % 8 != 0:
        # tiny shapes where no 8-aligned row tile divides B*N: the stack
        # blocks cannot use Pallas's whole-array escape (buf is L x
        # bigger), so compute unfused-collect: same kernel for `out`,
        # XLA dynamic_update_slice for the stack write.
        out = fused_ln_mlp(
            x, mask, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret
        )
        return out, jax.lax.dynamic_update_slice(
            buf, out.reshape(m, d).astype(buf.dtype), (layer * m, 0)
        )
    x2 = x.reshape(m, d)
    buf2 = buf
    m2 = jnp.broadcast_to(
        mask.astype(_F32).reshape(b, 1, 1), (b, n, 1)
    ).reshape(m, 1)
    tile = pl.BlockSpec((mt, d), lambda i, l: (i, 0),
                        memory_space=pltpu.VMEM)
    mtile = pl.BlockSpec((mt, 1), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, l, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_collect_kernel, eps=eps, d=d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[tile, mtile, full((1, d)), full((1, d)),
                  full((d, f)), full((1, f)), full((f, d)),
                  full((1, d)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            tile,
            pl.BlockSpec((mt, d), lambda i, l: (l[0] * nblk + i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out, buf_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, d), x.dtype),
            jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        ),
        # input 0 is the scalar-prefetch layer index; buf is input 9
        input_output_aliases={9: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x2, m2,
      ln_scale.reshape(1, d).astype(_F32), ln_bias.reshape(1, d).astype(_F32),
      w1, b1.reshape(1, f).astype(_F32), w2, b2.reshape(1, d).astype(_F32),
      buf2)
    return out.reshape(b, n, d), buf_new


def _flm_fwd(x, mask, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret):
    out = fused_ln_mlp(x, mask, ln_scale, ln_bias, w1, b1, w2, b2,
                       eps, interpret)
    return out, (x, mask, ln_scale, ln_bias, w1, b1, w2)


def _flm_bwd(eps, interpret, res, do):
    x, mask, ln_scale, ln_bias, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2, ds, dbl = _bwd(
        x, mask, do.astype(x.dtype), ln_scale, ln_bias, w1, b1, w2,
        eps, interpret,
    )
    return (
        dx,
        jnp.zeros_like(mask),  # stochastic-depth mask: not a gradient path
        ds.reshape(ln_scale.shape).astype(ln_scale.dtype),
        dbl.reshape(ln_bias.shape).astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(-1).astype(b1.dtype),
    )


fused_ln_mlp.defvjp(_flm_fwd, _flm_bwd)
