"""Fused 3-pass geometric shift for TrivialAugmentWide (TPU kernel).

The five TAW geometric ops (shear x/y, translate x/y, rotate via the
3-shear decomposition) are per-LINE integer shifts (see
``data/augment.py`` "shift-based geometric ops"). The XLA formulation
runs each of the three shift passes as a log2(W)-deep roll+select
cascade over HBM — ~24 full-slab passes plus 6 channel-fold transposes,
traced at ~6 ms/step on the B=512 bench (the ~190 us select_n/slice
storm in make_train_views).

This kernel keeps one block of channel-folded image planes VMEM-resident
and runs ALL THREE cascades (rows, cols, rows) plus the zero-fill masks
in VMEM: HBM sees exactly one read and one write of the slab.

Per pass the shift cascade is identical math to ``_barrel_shift``:
8 static rolls (``pltpu.roll``) selected per line by the shift's bits,
then a validity mask zeroes wrapped-in pixels. Integer pixel values
(<= 255) are exact in bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cascade(cur, s, r, axis, size):
    """Barrel shift along ``axis`` by per-line ``s`` (positive, mod size),
    then zero wrapped pixels via ``r`` (the signed shift)."""
    bits = max(1, int(size - 1).bit_length())
    if axis == 2:
        sel = s[:, :, None]  # (TB, H, 1)
        rr = r[:, :, None]
        pos = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 2)
    else:
        sel = s[:, None, :]  # (TB, 1, W)
        rr = r[:, None, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 1)
    for k in range(bits):
        step = 1 << k
        # pltpu.roll takes non-negative shifts; a left-roll by ``step``
        # is a right-roll by ``size - step``
        rolled = pltpu.roll(cur, (size - step) % size, axis)
        take = ((sel >> k) & 1) != 0
        cur = jnp.where(take, rolled, cur)
    valid = (pos >= rr) & (pos < size + rr)
    return jnp.where(valid, cur, jnp.zeros_like(cur))


def _geom_kernel(x_ref, r1_ref, r2_ref, r3_ref, o_ref):
    tb, h, w = x_ref.shape
    # Mosaic's vector rotate only exists for 32-bit lanes ("Rotate with
    # non-32-bit data" is unimplemented): cascade in f32 inside VMEM —
    # integer pixel values stay exact — while HBM still moves bf16
    cur = x_ref[...].astype(jnp.float32)
    r1 = r1_ref[...]
    r2 = r2_ref[...]
    r3 = r3_ref[...]
    # pass 1: rows (shift along W per (plane, row))
    cur = _cascade(cur, jnp.remainder(-r1, w), r1, 2, w)
    # pass 2: cols (shift along H per (plane, col))
    cur = _cascade(cur, jnp.remainder(-r2, h), r2, 1, h)
    # pass 3: rows again (rotate's second x-shear)
    cur = _cascade(cur, jnp.remainder(-r3, w), r3, 2, w)
    o_ref[...] = cur.astype(o_ref.dtype)


def geom_shift3(
    x: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    r3: jnp.ndarray,
    *,
    tile_b: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply rows(r1) -> cols(r2) -> rows(r3) integer line shifts with
    zero fill, channel-folded planes VMEM-resident.

    Args:
        x: (G, H, W, C) image batch (uint8 or float; shifted as bf16 —
            exact for integer pixel values).
        r1, r3: (G, H) int32 row shifts (out[y, x] = in[y, x - r]).
        r2: (G, W) int32 column shifts (out[y, x] = in[y - r, x]).

    Returns:
        (G, H, W, C), same dtype as ``x``.
    """
    g, h, w, c = x.shape
    xc = jnp.moveaxis(x, -1, 1).reshape(g * c, h, w).astype(jnp.bfloat16)

    def fold(r):
        return (
            jnp.broadcast_to(r[:, None], (g, c) + r.shape[1:])
            .reshape(g * c, -1)
            .astype(jnp.int32)
        )

    out = pl.pallas_call(
        _geom_kernel,
        grid=(pl.cdiv(g * c, tile_b),),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((tile_b, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g * c, h, w), jnp.bfloat16),
        interpret=interpret,
    )(xc, fold(r1), fold(r2), fold(r3))
    return jnp.moveaxis(out.reshape(g, c, h, w), 1, -1).astype(x.dtype)
