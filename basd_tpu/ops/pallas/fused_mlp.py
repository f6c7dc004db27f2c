"""Fused transformer MLP: fc1 -> tanh-GELU -> fc2 in one kernel (Pallas, TPU).

Motivation (traced, v5e, B=512, N=197): the XLA lowering of the MLP
writes the (B, N, F) hidden activation to HBM after fc1+GELU and reads
it back for fc2 — 155 MB each way per *student* layer (310 MB for the
teacher's F=1536) — and the backward pays the same traffic again for
dGELU and the two weight-gradient matmuls. Per layer that is ~1.4-1.5 ms
forward (student) against a ~0.4 ms compute floor. This kernel keeps the
hidden activation VMEM-resident per batch tile: HBM traffic collapses to
one read of x and one write of the output (plus the weights, resident
across the whole grid).

Forward math mirrors the ``Mlp`` Dense path on the bf16 TPU branch
(``models/layers.py``): bf16 operands into the MXU with f32
accumulation, the fc1 output rounded to bf16 *before* the activation
(flax ``Dense(dtype=bf16)`` returns bf16), tanh-GELU
(``jax.nn.gelu(approximate=True)``; the bf16-path choice is justified at
the call site — error at the bf16 rounding floor), hidden rounded to
bf16 into fc2. GELU itself is evaluated in f32 on the bf16-rounded
pre-activation; the deviation from flax's bf16-arithmetic GELU is below
the bf16 rounding floor (tested).

Backward is recompute-based (nothing but x is saved): per batch tile the
kernel re-runs fc1+GELU, then computes

    dW2 += h^T do        db2 += sum(do)
    dh   = do W2^T       dpre = dh * gelu'(pre)
    dW1 += x^T dpre      db1 += sum(dpre)
    dx   = dpre W1^T

with the four weight/bias gradients accumulated in f32 in revisited VMEM
blocks across a *sequential* batch-tile grid (Mosaic keeps the block
resident and writes it back once). Gradients match ``jax.grad`` of the
Dense path to bf16 tolerance (tests/test_math_core.py).

Reference semantics: timm ``Mlp`` (fc1/act/fc2) as driven by
``src/models/teacher.py``; the reference relies on torch eager + AMP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
# tanh-GELU constants (jax.nn.gelu approximate=True)
_C = 0.7978845608028654  # sqrt(2/pi)
_A = 0.044715


def _gelu_tanh(p):
    t = jnp.tanh(_C * (p + _A * p * p * p))
    return 0.5 * p * (1.0 + t), t


def _gelu_tanh_grad(p, t):
    # d/dp [0.5 p (1 + tanh(u))], u = C (p + A p^3)
    return 0.5 * (1.0 + t) + 0.5 * p * (1.0 - t * t) * _C * (
        1.0 + 3.0 * _A * p * p
    )


def _dot(a, b, contract):
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=_F32)


# NOTE: the kernels below work on a 2-D (tokens, features) view. The
# (B, N, D) activations are flattened OUTSIDE the pallas_call (a free
# row-major reshape for XLA) because Mosaic cannot flatten a
# sublane-unaligned (G, 197, D) tile in-kernel ("unsupported shape
# cast"), and a per-image loop of M=197 dots leaves the MXU pipeline
# half-empty (measured ~25% slower than the Dense chain). A row tile of
# 8 images (M=1576, 8-aligned for N=197) runs each stage as ONE large
# matmul.


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x2 = x_ref[...]  # (M, D)
    pre = _dot(x2, w1_ref[...], ((1,), (0,))) + b1_ref[...]  # (M, F) f32
    # round to bf16 exactly where the Dense path does, then f32 GELU
    preb = pre.astype(x_ref.dtype).astype(_F32)
    h, _ = _gelu_tanh(preb)
    hb = h.astype(x_ref.dtype)
    out = _dot(hb, w2_ref[...], ((1,), (0,))) + b2_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(
    x_ref, do_ref, w1_ref, b1_ref, w2_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
):
    x2 = x_ref[...]  # (M, D)
    do2 = do_ref[...]  # (M, Do)

    # recompute the forward hidden state
    pre = _dot(x2, w1_ref[...], ((1,), (0,))) + b1_ref[...]
    preb = pre.astype(x_ref.dtype).astype(_F32)
    h, t = _gelu_tanh(preb)
    hb = h.astype(x_ref.dtype)

    # fc2 gradients: contract over the token rows
    dw2 = _dot(hb, do2, ((0,), (0,)))  # (F, Do) f32
    db2 = jnp.sum(do2.astype(_F32), axis=0, keepdims=True)

    dh = _dot(do2, w2_ref[...], ((1,), (1,)))  # (M, F) f32
    dpre = dh * _gelu_tanh_grad(preb, t)
    dpreb = dpre.astype(x_ref.dtype)

    dw1 = _dot(x2, dpreb, ((0,), (0,)))  # (D, F) f32
    db1 = jnp.sum(dpre, axis=0, keepdims=True)
    dx = _dot(dpreb, w1_ref[...], ((1,), (1,)))  # (M, D) f32
    dx_ref[...] = dx.astype(dx_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2

    @pl.when(i > 0)
    def _acc():
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2


_ROW_TILE_IMAGES = 8


def _row_tile(b: int, n: int) -> int:
    """Rows per program over the flattened (B*N, ...) token view: the
    largest g <= 8 dividing B with g*N sublane-aligned; falls back to
    the whole array in one program (always legal: block == array)."""
    for g in (_ROW_TILE_IMAGES, 4, 2, 1):
        if b % g == 0 and (g * n) % 8 == 0:
            return g * n
    return b * n


def _full(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _fwd(x, w1, b1, w2, b2, interpret):
    b, n, d = x.shape
    f = w1.shape[1]
    do_ = w2.shape[1]
    m = b * n
    mt = _row_tile(b, n)
    x2 = x.reshape(m, d)  # free row-major reshape, outside the kernel
    tile = pl.BlockSpec((mt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    otile = pl.BlockSpec((mt, do_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(m // mt,),
        in_specs=[tile, _full((d, f)), _full((1, f)),
                  _full((f, do_)), _full((1, do_))],
        out_specs=otile,
        out_shape=jax.ShapeDtypeStruct((m, do_), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, w1, b1, w2, b2)
    return out.reshape(b, n, do_)


def _bwd(x, do, w1, b1, w2, interpret):
    b, n, d = x.shape
    f = w1.shape[1]
    do_ = w2.shape[1]
    m = b * n
    mt = _row_tile(b, n)
    x2 = x.reshape(m, d)
    do2 = do.reshape(m, do_)
    tile = pl.BlockSpec((mt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dotile = pl.BlockSpec((mt, do_), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(m // mt,),
        in_specs=[tile, dotile, _full((d, f)), _full((1, f)),
                  _full((f, do_))],
        out_specs=(
            tile,
            _full((d, f)), _full((1, f)),
            _full((f, do_)), _full((1, do_)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, d), x.dtype),
            jax.ShapeDtypeStruct((d, f), _F32),
            jax.ShapeDtypeStruct((1, f), _F32),
            jax.ShapeDtypeStruct((f, do_), _F32),
            jax.ShapeDtypeStruct((1, do_), _F32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # weight-gradient blocks are revisited every program ->
            # the row-tile grid must run in order
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x2, do2, w1, b1, w2)
    return dx.reshape(b, n, d), dw1, db1, dw2, db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x, w1, b1, w2, b2, interpret=False):
    """fc1 -> tanh-GELU -> fc2, VMEM-resident per batch tile.

    Args:
        x: (B, N, D) activations (bf16 on the TPU path).
        w1: (D, F) fc1 kernel, cast to x.dtype by the caller.
        b1: (F,) fc1 bias (f32).
        w2: (F, Do) fc2 kernel, cast to x.dtype by the caller.
        b2: (Do,) fc2 bias (f32).

    Returns:
        (B, N, Do) in x.dtype.
    """
    return _fwd(x, w1, b1.reshape(1, -1).astype(_F32),
                w2, b2.reshape(1, -1).astype(_F32), interpret)


def _fused_mlp_fwd(x, w1, b1, w2, b2, interpret):
    out = fused_mlp(x, w1, b1, w2, b2, interpret)
    return out, (x, w1, b1, w2)


def _fused_mlp_bwd(interpret, res, do):
    x, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _bwd(
        x, do.astype(x.dtype), w1,
        b1.reshape(1, -1).astype(_F32), w2, interpret,
    )
    # b2 is not a residual (unused in the backward); its cotangent dtype
    # follows b1's (both are f32 flax params)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(-1).astype(b1.dtype),
    )


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
