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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _fwd_kernel(
    x_ref, s_ref, bl_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
    o_ref, imp_ref, *, eps: float, d: int, h: int, e: int, scale: float,
):
    x = x_ref[...]  # (G, N, D)
    xf = x.astype(_F32)
    inv_d = 1.0 / d
    mu = jnp.sum(xf, axis=-1, keepdims=True) * inv_d
    xc = xf - mu
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) * inv_d
    xn = (xc * jax.lax.rsqrt(var + eps)) * s_ref[...] + bl_ref[...]
    xnb = xn.astype(x.dtype)

    qkv = jax.lax.dot_general(
        xnb, wqkv_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=_F32,
    ) + bqkv_ref[...]
    qkvb = qkv.astype(x.dtype)  # (G, N, 3D), rounded where Dense returns

    heads = []
    imp_acc = None
    for i in range(h):
        q = qkvb[:, :, i * e:(i + 1) * e]
        k = qkvb[:, :, d + i * e:d + (i + 1) * e]
        v = qkvb[:, :, 2 * d + i * e:2 * d + (i + 1) * e]
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
        heads.append(o.astype(x.dtype))
        row0 = p[:, 0, :] / (l[:, 0] * h)  # (G, N): pre-divided head mean
        imp_acc = row0 if imp_acc is None else imp_acc + row0
    attn = jnp.concatenate(heads, axis=-1)  # (G, N, D) bf16

    y = jax.lax.dot_general(
        attn, wp_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=_F32,
    ) + bp_ref[...]
    yb = y.astype(x.dtype).astype(_F32)  # round where proj Dense returns
    o_ref[...] = (xf + yb).astype(o_ref.dtype)
    imp_ref[...] = imp_acc


def _pick_g(b: int) -> int:
    for g in (8, 4, 2):
        if b % g == 0:
            return g
    return 1


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
    g = _pick_g(b)
    tile = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    imp_spec = pl.BlockSpec((g, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _fwd_kernel, eps=eps, d=d, h=num_heads, e=e, scale=scale
    )
    out, imp = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[tile, full((1, d)), full((1, d)),
                  full((d, 3 * d)), full((1, 3 * d)),
                  full((d, d)), full((1, d))],
        out_specs=(tile, imp_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
        ),
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
