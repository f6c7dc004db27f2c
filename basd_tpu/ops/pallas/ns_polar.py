"""Fused Newton-Schulz polar factor (Pallas, TPU).

The XLA lowering of the hybrid NS iteration (5 accelerated quintic + 2
cubic steps, ``basd_tpu.ops.linalg.newton_schulz_polar``) writes every
per-iteration intermediate (g, g^2, h, y — ~1.3 GB per iteration at the
Procrustes batch (2048, 192, 384)) out to HBM: the chain is
bandwidth-bound at ~23 ms/step (traced). This kernel runs the ENTIRE
iteration VMEM-resident per batch tile: HBM traffic collapses to one
read of x and one write of the polar factor.

Math matches ``newton_schulz_polar(schedule='hybrid',
inner_dtype=bfloat16)`` exactly: f32 Frobenius prescale, bf16 matmul
operands with f32 accumulation (the MXU's native mode — Mosaic DEFAULT
dot precision IS single-pass bf16, which is the semantic here, unlike
the f32 Jacobi kernel next door that must force HIGHEST), every
intermediate cast to bf16 between matmuls.

Forward-only: the polar factor is used inside custom-VJP forwards and
backwards (nuclear norm value/subgradient), never differentiated
through.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# mirror of linalg._QUINTIC_SCHEDULE (kept in sync by
# tests/test_math_core.py::test_ns_polar_pallas_matches_xla)
_QUINTIC_SCHEDULE = (
    (4.0848, -6.8946, 2.9270),
    (3.9505, -6.3029, 2.6377),
    (3.7418, -5.5913, 2.3037),
    (2.8769, -3.1427, 1.2046),
    (2.8366, -3.0525, 1.2012),
)
_NUM_CUBIC = 2

_BF = jnp.bfloat16
_F32 = jnp.float32


def _dot_nt(a, b):
    """(T, m, k) @ (T, n, k)^T -> (T, m, n), bf16 in / f32 out."""
    return jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=_F32
    )


def _dot_nn(a, b):
    """(T, m, k) @ (T, k, n) -> (T, m, n), bf16 in / f32 out."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=_F32
    )


def _ns_kernel(x_ref, o_ref):
    x = x_ref[...].astype(_F32)
    # staged reduction + explicit broadcast: a (T, 1, 1) keepdims
    # reduction crashes this Mosaic toolchain's layout inference
    # ("arr.size() >= layout_rank" check in layout.h)
    norm2 = jnp.sum(jnp.sum(x * x, axis=2), axis=1)  # (T,)
    inv = jax.lax.rsqrt(norm2 + 1e-30)
    xb = (x * inv[:, None, None]).astype(_BF)

    for a, b, c in _QUINTIC_SCHEDULE:
        g = _dot_nt(xb, xb).astype(_BF)
        g2 = _dot_nt(g, g).astype(_BF)  # g symmetric: g g^T == g g
        h = (jnp.float32(b) * g.astype(_F32)
             + jnp.float32(c) * g2.astype(_F32)).astype(_BF)
        y = a * xb.astype(_F32) + _dot_nn(h, xb)
        xb = y.astype(_BF)

    for _ in range(_NUM_CUBIC):
        xxt = _dot_nt(xb, xb).astype(_BF)
        y = 1.5 * xb.astype(_F32) - 0.5 * _dot_nn(xxt, xb)
        xb = y.astype(_BF)

    o_ref[...] = xb


def ns_polar_hybrid(
    x: jnp.ndarray, *, tile_b: int = 16, interpret: bool = False
) -> jnp.ndarray:
    """Polar factor of ``x`` (B, r, c), hybrid NS schedule, bf16 inner.

    Requires r % 8 == 0 and c % 128 == 0 (Mosaic block tiling) and
    r <= c (callers transpose tall inputs; polar(M^T) = polar(M)^T).
    Returns bf16 (the inner dtype — callers upcast as needed).
    """
    b, r, c = x.shape
    assert r % 8 == 0 and c % 128 == 0 and r <= c, x.shape
    tile_b = max(1, min(tile_b, b))
    pad = (-b) % tile_b
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, r, c), x.dtype)], axis=0
        )
    padded = x.shape[0]
    slab = pl.BlockSpec((tile_b, r, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _ns_kernel,
        grid=(padded // tile_b,),
        in_specs=[slab],
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((padded, r, c), _BF),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # independent batch-tile programs: lets Mosaic double-buffer
            # the slab DMA of program i+1 under program i's compute
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x.astype(_F32))  # f32 in: the prescale must see unrounded values
    return out[:b]
