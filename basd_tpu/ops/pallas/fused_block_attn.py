"""Fused attention half of a pre-LN ViT block (Pallas, TPU, forward-only).

One kernel computes, per batch tile, the teacher block's entire
attention residual branch:

    out = x + proj(MHSA(LN(x) @ W_qkv + b_qkv))        (+ CLS importance)

Motivation (traced, v5e, B=512, N=197, teacher D=384): run separately,
the chain LN1 -> qkv Dense -> flash attention -> proj Dense -> residual
add moves ~1.16 GB of HBM per layer (the 232 MB qkv slab is written by
the matmul and re-read by the flash kernel; x is read three times) and
costs ~2.2 ms/layer against a ~0.75 ms matmul floor. Holding the tile's
qkv, scores, and attention output in VMEM collapses the traffic to one
read of x and one write of out (~0.16 GB/layer).

Math matches the unfused chain (``models.layers.Block`` with
``attention_impl='flash'``) op-for-op at bf16 rounding granularity:
f32 two-pass LN statistics rounded to bf16 where ``FusedLayerNorm``
hands off to ``Dense``; qkv accumulated in f32 and rounded to bf16
(where ``Dense(dtype=bf16)`` returns); per-head f32 softmax with
probabilities cast to bf16 for the PV matmul and deferred
normalization, exactly as ``flash_attention._fwd_kernel``; the head-mean
CLS-row importance (reference ``src/losses/relational.py:22-24``, CLS
key stripped by the caller); proj accumulated in f32; residual added in
f32 and rounded once.

FORWARD-ONLY: no VJP is defined — this serves the frozen teacher, whose
activations carry no gradient (the selector ``stop_gradient``s its
tokens and the mix weights need only teacher *values*). LayerScale
(dinov2) is handled by the caller folding gamma into ``w_proj``/
``b_proj``. Stochastic depth on a frozen deterministic teacher is the
identity, so no mask input exists.

``fused_block_attn_train`` is the STUDENT-path sibling: same fused
forward plus a stochastic-depth mask (one multiplier per image, like
``fused_block_mlp``), no importance output, and a full custom VJP whose
backward is one recompute kernel — the only saved residuals are the
block input ``x`` and the per-head row logsumexp, so the qkv slab,
scores, and attention output never reach HBM in either direction.
Weight/LN gradients accumulate in revisited f32 blocks over a
sequential batch-tile grid, exactly like ``fused_block_mlp._bwd_kernel``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basd_tpu.ops.pallas.flash_attention import _pick_block_b

_F32 = jnp.float32


def _wdot(a, w, transpose: bool = False):
    """``(G, N, K) @ (K, M) -> (G, N, M)`` f32, G-batched.

    Mosaic lowers an UNBATCHED 3D x 2D ``dot_general`` through a
    ``(G*N, K)`` shape cast, and infer-vector-layout rejects that cast
    when K is not a lane multiple (student D=192; hardware-measured:
    ``tpu.reshape (8x197x192) -> (1576x192)`` fails while the teacher's
    D=384 compiles). Broadcasting the weight over G and batching the dot
    emits no reshape. ``transpose=True`` contracts against ``w.T``.
    """
    g = a.shape[0]
    wb = jnp.broadcast_to(w[None], (g,) + w.shape)
    dims = (((2,), (2 if transpose else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(a, wb, dims, preferred_element_type=_F32)


def _fwd_kernel(
    x_ref, s_ref, bl_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
    o_ref, imp_ref, qkv_scr, attn_scr, f32_scr,
    *, eps: float, d: int, h: int, e: int, scale: float,
):
    x = x_ref[...]  # (G, N, D)
    xf = x.astype(_F32)
    inv_d = 1.0 / d
    mu = jnp.sum(xf, axis=-1, keepdims=True) * inv_d
    xc = xf - mu
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) * inv_d
    xn = (xc * jax.lax.rsqrt(var + eps)) * s_ref[...] + bl_ref[...]
    xnb = xn.astype(x.dtype)

    # Two Mosaic crash patterns shape this (both hardware-bisected, v5e,
    # round 4, `Array::Slice limits 25 vs 1` aborts in apply-vector-layout):
    # (a) adding a (1, M) bias to a 3D dot_general RESULT VALUE crashes,
    #     while the identical add onto a scratch RELOAD compiles — so the
    #     f32 accumulator is staged through ``f32_scr`` and the bias rides
    #     the reload (numerics unchanged: no rounding at the staging);
    # (b) per-head lane slices must be REF loads, not vector.extract_slice
    #     — hence the rounded bf16 slab lives in ``qkv_scr``.
    f32_scr[...] = _wdot(xnb, wqkv_ref[...])
    qkv_scr[...] = (f32_scr[...] + bqkv_ref[...]).astype(x.dtype)

    imp_acc = None
    for i in range(h):
        q = qkv_scr[:, :, i * e:(i + 1) * e]
        k = qkv_scr[:, :, d + i * e:d + (i + 1) * e]
        v = qkv_scr[:, :, 2 * d + i * e:2 * d + (i + 1) * e]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=_F32,
        ) * scale  # (G, N, N)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32,
        ) / l
        attn_scr[:, :, i * e:(i + 1) * e] = o.astype(x.dtype)
        row0 = p[:, 0, :] / (l[:, 0] * h)  # (G, N): pre-divided head mean
        imp_acc = row0 if imp_acc is None else imp_acc + row0
    attn = attn_scr[...]  # (G, N, D) bf16

    # proj accumulator staged for the bias add, same as qkv (pattern (a))
    f32_scr[:, :, :d] = _wdot(attn, wp_ref[...])
    y = f32_scr[:, :, :d] + bp_ref[...]
    yb = y.astype(x.dtype).astype(_F32)  # round where proj Dense returns
    o_ref[...] = (xf + yb).astype(o_ref.dtype)
    imp_ref[...] = imp_acc


def fused_block_attn(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj,
    num_heads: int, eps: float = 1e-6, interpret: bool = False,
):
    """``x + proj(MHSA(qkv(LN(x))))`` + head-mean CLS-row importance.

    Args:
        x: (B, N, D) activations (bf16 on the TPU path).
        ln_scale, ln_bias: (D,) LayerNorm affine params (f32).
        w_qkv: (D, 3D) fused qkv kernel cast to x.dtype; b_qkv: (3D,).
        w_proj: (D, D) output projection cast to x.dtype (LayerScale
            gamma pre-folded by the caller); b_proj: (D,).

    Returns:
        (out (B, N, D) in x.dtype, importance (B, N) f32 — the CLS key
        at index 0 is included; the caller strips it).
    """
    b, n, d = x.shape
    e = d // num_heads
    scale = float(e) ** -0.5
    g = _pick_block_b(b)
    tile = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    imp_spec = pl.BlockSpec((g, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fwd_kernel, eps=eps, d=d, h=num_heads, e=e, scale=scale
    )
    out, imp = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[tile, _full((1, d)), _full((1, d)),
                  _full((d, 3 * d)), _full((1, 3 * d)),
                  _full((d, d)), _full((1, d))],
        out_specs=(tile, imp_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((g, n, 3 * d), x.dtype),  # qkv slab
            pltpu.VMEM((g, n, d), x.dtype),      # head outputs
            pltpu.VMEM((g, n, 3 * d), _F32),     # f32 dot staging (qkv/proj)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, ln_scale.reshape(1, d).astype(_F32),
      ln_bias.reshape(1, d).astype(_F32), w_qkv,
      b_qkv.reshape(1, 3 * d).astype(_F32), w_proj,
      b_proj.reshape(1, d).astype(_F32))
    return out, imp


# -- differentiable student variant -----------------------------------------


def _fwd_train_kernel(
    x_ref, m_ref, s_ref, bl_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
    o_ref, lse_ref, qkv_scr, attn_scr, f32_scr,
    *, eps: float, d: int, h: int, e: int, scale: float,
):
    x = x_ref[...]  # (G, N, D)
    xf = x.astype(_F32)
    inv_d = 1.0 / d
    mu = jnp.sum(xf, axis=-1, keepdims=True) * inv_d
    xc = xf - mu
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) * inv_d
    xn = (xc * jax.lax.rsqrt(var + eps)) * s_ref[...] + bl_ref[...]
    xnb = xn.astype(x.dtype)

    # bias adds ride scratch reloads, head slices are ref loads — the two
    # Mosaic crash patterns documented in _fwd_kernel
    f32_scr[...] = _wdot(xnb, wqkv_ref[...])
    qkv_scr[...] = (f32_scr[...] + bqkv_ref[...]).astype(x.dtype)

    for i in range(h):
        q = qkv_scr[:, :, i * e:(i + 1) * e]
        k = qkv_scr[:, :, d + i * e:d + (i + 1) * e]
        v = qkv_scr[:, :, 2 * d + i * e:2 * d + (i + 1) * e]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=_F32,
        ) * scale  # (G, N, N)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32,
        ) / l
        attn_scr[:, :, i * e:(i + 1) * e] = o.astype(x.dtype)
        lse_ref[:, i, :] = m[..., 0] + jnp.log(l[..., 0])
    attn = attn_scr[...]  # (G, N, D) bf16

    f32_scr[:, :, :d] = _wdot(attn, wp_ref[...])
    y = f32_scr[:, :, :d] + bp_ref[...]
    yb = y.astype(x.dtype).astype(_F32)  # round where proj Dense returns
    o_ref[...] = (xf + yb * m_ref[...]).astype(o_ref.dtype)


def _bwd_train_kernel(
    x_ref, m_ref, do_ref, lse_ref, s_ref, bl_ref, wqkv_ref, bqkv_ref,
    wp_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dwp_ref, dbp_ref, ds_ref, dbl_ref,
    qkv_scr, attn_scr, dattn_scr, dqkv_scr,
    *, eps: float, d: int, h: int, e: int, scale: float,
):
    x = x_ref[...]
    xf = x.astype(_F32)
    inv_d = 1.0 / d
    mu = jnp.sum(xf, axis=-1, keepdims=True) * inv_d
    xc = xf - mu
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) * inv_d
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    s_ln = s_ref[...]  # (1, D) f32
    xn = xhat * s_ln + bl_ref[...]
    xnb = xn.astype(x.dtype)

    # recompute the qkv slab exactly as the forward rounded it. The f32
    # accumulator stages through dqkv_scr (free: every lane of dqkv_scr
    # is overwritten by the head loop below) so the bias add happens on a
    # scratch reload, and head slices are ref loads — the two Mosaic
    # crash patterns documented in _fwd_kernel.
    dqkv_scr[...] = _wdot(xnb, wqkv_ref[...])
    qkv_scr[...] = (dqkv_scr[...] + bqkv_ref[...]).astype(x.dtype)

    do = do_ref[...]
    dof = do.astype(_F32)
    dy = dof * m_ref[...]  # gradient at the proj output (post-mask)
    dyb = dy.astype(x.dtype)

    # dattn = dy @ wp^T (gradient entering the concatenated head outputs),
    # staged f32 so per-head slices are ref loads; rounding each slice to
    # bf16 after slicing equals rounding the full slab before (elementwise)
    dattn_scr[...] = _wdot(dyb, wp_ref[...], transpose=True)  # (G, N, D)

    for i in range(h):
        q = qkv_scr[:, :, i * e:(i + 1) * e]
        k = qkv_scr[:, :, d + i * e:d + (i + 1) * e]
        v = qkv_scr[:, :, 2 * d + i * e:2 * d + (i + 1) * e]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=_F32,
        ) * scale  # (G, N, N)
        p = jnp.exp(s - lse_ref[:, i, :][:, :, None])  # normalized probs
        pb = p.astype(x.dtype)
        # recompute this head's output for delta and the proj weight grad
        o_i = jax.lax.dot_general(
            pb, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32,
        )  # (G, N, E) f32
        attn_scr[:, :, i * e:(i + 1) * e] = o_i.astype(x.dtype)
        da_f = dattn_scr[:, :, i * e:(i + 1) * e]
        da_b = da_f.astype(x.dtype)
        delta = jnp.sum(da_f * o_i, axis=-1)  # (G, N)
        dv = jax.lax.dot_general(
            pb, da_b, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32,
        )  # (G, N_k, E)
        dp = jax.lax.dot_general(
            da_b, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=_F32,
        )  # (G, N_q, N_k)
        dsc = (p * (dp - delta[:, :, None]) * scale).astype(x.dtype)
        dq = jax.lax.dot_general(
            dsc, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32,
        )
        dk = jax.lax.dot_general(
            dsc, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32,
        )
        dqkv_scr[:, :, i * e:(i + 1) * e] = dq
        dqkv_scr[:, :, d + i * e:d + (i + 1) * e] = dk
        dqkv_scr[:, :, 2 * d + i * e:2 * d + (i + 1) * e] = dv
    attn = attn_scr[...]  # (G, N, D) bf16
    dqkv = dqkv_scr[...]  # (G, N, 3D) f32
    dqkvb = dqkv.astype(x.dtype)

    # proj grads: dwp = attn^T dy (per-tile, then accumulated over the
    # sequential grid); staged reductions (Mosaic keepdims fragility)
    dwp = jnp.sum(
        jax.lax.dot_general(
            attn, dyb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32,
        ),
        axis=0,
    )  # (D, D)
    # single fused (0,1)-axis reductions: the 2-step form (sum axis=1,
    # then axis=0 keepdims) hits a Mosaic "Invalid relayout" on the
    # (G, D) intermediate when D is not a lane multiple (D=192
    # hardware-bisected; D=384 compiles either way)
    dbp = jnp.sum(dy, axis=(0, 1))[None, :]  # (1, D)

    # qkv grads
    dwqkv = jnp.sum(
        jax.lax.dot_general(
            xnb, dqkvb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32,
        ),
        axis=0,
    )  # (D, 3D)
    dbqkv = jnp.sum(dqkv, axis=(0, 1))[None, :]  # (1, 3D)

    dxn = _wdot(dqkvb, wqkv_ref[...], transpose=True)  # (G, N, D) f32

    ds = jnp.sum(dxn * xhat, axis=(0, 1))[None, :]
    dbl = jnp.sum(dxn, axis=(0, 1))[None, :]

    # LN VJP (per row): g = dxn * scale
    g = dxn * s_ln
    mg = jnp.sum(g, axis=-1, keepdims=True) * inv_d
    mgx = jnp.sum(g * xhat, axis=-1, keepdims=True) * inv_d
    dxln = rstd * (g - mg - xhat * mgx)
    dx_ref[...] = (dof + dxln).astype(dx_ref.dtype)

    i0 = pl.program_id(0)

    @pl.when(i0 == 0)
    def _init():
        dwqkv_ref[...] = dwqkv
        dbqkv_ref[...] = dbqkv
        dwp_ref[...] = dwp
        dbp_ref[...] = dbp
        ds_ref[...] = ds
        dbl_ref[...] = dbl

    @pl.when(i0 > 0)
    def _acc():
        dwqkv_ref[...] += dwqkv
        dbqkv_ref[...] += dbqkv
        dwp_ref[...] += dwp
        dbp_ref[...] += dbp
        ds_ref[...] += ds
        dbl_ref[...] += dbl


def _full(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _fwd_train(x, mask, ln_s, ln_b, wqkv, bqkv, wp, bp, num_heads, eps,
               interpret):
    b, n, d = x.shape
    e = d // num_heads
    scale = float(e) ** -0.5
    g = _pick_block_b(b)
    tile = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    mtile = pl.BlockSpec((g, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((g, num_heads, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fwd_train_kernel, eps=eps, d=d, h=num_heads, e=e, scale=scale
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[tile, mtile, _full((1, d)), _full((1, d)),
                  _full((d, 3 * d)), _full((1, 3 * d)),
                  _full((d, d)), _full((1, d))],
        out_specs=(tile, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, num_heads, n), _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((g, n, 3 * d), x.dtype),  # qkv slab
            pltpu.VMEM((g, n, d), x.dtype),      # head outputs
            pltpu.VMEM((g, n, 3 * d), _F32),     # f32 dot staging (qkv/proj)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, mask.astype(_F32).reshape(b, 1, 1),
      ln_s.reshape(1, d).astype(_F32), ln_b.reshape(1, d).astype(_F32),
      wqkv, bqkv.reshape(1, 3 * d).astype(_F32), wp,
      bp.reshape(1, d).astype(_F32))
    return out, lse


def _bwd_train(x, mask, do, lse, ln_s, ln_b, wqkv, bqkv, wp, num_heads,
               eps, interpret):
    b, n, d = x.shape
    e = d // num_heads
    scale = float(e) ** -0.5
    g = _pick_block_b(b)
    tile = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    mtile = pl.BlockSpec((g, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((g, num_heads, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _bwd_train_kernel, eps=eps, d=d, h=num_heads, e=e, scale=scale
    )
    dx, dwqkv, dbqkv, dwp, dbp, ds, dbl = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[tile, mtile, tile, lse_spec, _full((1, d)), _full((1, d)),
                  _full((d, 3 * d)), _full((1, 3 * d)), _full((d, d))],
        out_specs=(
            tile,
            _full((d, 3 * d)), _full((1, 3 * d)),
            _full((d, d)), _full((1, d)),
            _full((1, d)), _full((1, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((d, 3 * d), _F32),
            jax.ShapeDtypeStruct((1, 3 * d), _F32),
            jax.ShapeDtypeStruct((d, d), _F32),
            jax.ShapeDtypeStruct((1, d), _F32),
            jax.ShapeDtypeStruct((1, d), _F32),
            jax.ShapeDtypeStruct((1, d), _F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((g, n, 3 * d), x.dtype),  # recomputed qkv slab
            pltpu.VMEM((g, n, d), x.dtype),      # recomputed head outputs
            pltpu.VMEM((g, n, d), _F32),         # dattn (pre-head-split)
            pltpu.VMEM((g, n, 3 * d), _F32),     # dqkv accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # weight/LN gradient blocks are revisited every program
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, mask.astype(_F32).reshape(b, 1, 1), do, lse,
      ln_s.reshape(1, d).astype(_F32), ln_b.reshape(1, d).astype(_F32),
      wqkv, bqkv.reshape(1, 3 * d).astype(_F32), wp)
    return dx, dwqkv, dbqkv, dwp, dbp, ds, dbl


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_block_attn_train(
    x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj,
    num_heads: int, eps: float = 1e-6, interpret: bool = False,
):
    """``x + mask * proj(MHSA(qkv(LN(x))))`` in one kernel, differentiable.

    The student-path sibling of ``fused_block_attn``: no importance
    output, a stochastic-depth multiplier per image, and a full VJP whose
    residuals are only (x, mask, params, lse) — the qkv slab and scores
    are recomputed in one backward kernel.

    Args:
        x: (B, N, D) activations (bf16 on the TPU path).
        mask: (B,) f32 stochastic-depth multipliers (0 or 1/keep per
            sample; pass ones when deterministic). Not differentiated.
        ln_scale, ln_bias: (D,) LayerNorm affine params (f32).
        w_qkv: (D, 3D) fused qkv kernel cast to x.dtype; b_qkv: (3D,).
        w_proj: (D, D) projection cast to x.dtype (LayerScale gamma
            pre-folded by the caller, differentiably); b_proj: (D,).

    Returns:
        (B, N, D) in x.dtype.
    """
    out, _ = _fwd_train(x, mask, ln_scale, ln_bias, w_qkv, b_qkv,
                        w_proj, b_proj, num_heads, eps, interpret)
    return out


def _fba_fwd(x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj,
             num_heads, eps, interpret):
    out, lse = _fwd_train(x, mask, ln_scale, ln_bias, w_qkv, b_qkv,
                          w_proj, b_proj, num_heads, eps, interpret)
    return out, (x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj,
                 lse)


def _fba_bwd(num_heads, eps, interpret, res, do):
    x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, lse = res
    dx, dwqkv, dbqkv, dwp, dbp, ds, dbl = _bwd_train(
        x, mask, do.astype(x.dtype), lse, ln_scale, ln_bias, w_qkv,
        b_qkv, w_proj, num_heads, eps, interpret,
    )
    return (
        dx,
        jnp.zeros_like(mask),  # stochastic-depth mask: not a gradient path
        ds.reshape(ln_scale.shape).astype(ln_scale.dtype),
        dbl.reshape(ln_bias.shape).astype(ln_bias.dtype),
        dwqkv.astype(w_qkv.dtype),
        dbqkv.reshape(b_qkv.shape).astype(b_qkv.dtype),
        dwp.astype(w_proj.dtype),
        dbp.reshape(b_proj.shape).astype(b_proj.dtype),
    )


fused_block_attn_train.defvjp(_fba_fwd, _fba_bwd)
