"""Parity of the fused geometric-shift kernel (ops/pallas/geom_shift.py,
interpret lowering) against the XLA roll+select shift path it replaces
(``_shift_rows``/``_shift_cols`` — themselves PIL-parity-locked through
tests/test_augment.py's TAW oracles)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from basd_tpu.data.augment import _shift_cols, _shift_rows
from basd_tpu.ops.pallas.geom_shift import geom_shift3

RNG = np.random.default_rng(5)


def _ref(x, r1, r2, r3):
    out = _shift_rows(x, r1)
    out = _shift_cols(out, r2)
    return _shift_rows(out, r3)


def _case(g, h, w, lo, hi):
    x = jnp.asarray(RNG.integers(0, 256, (g, h, w, 3), dtype=np.uint8))
    r1 = jnp.asarray(RNG.integers(lo, hi, (g, h)), jnp.int32)
    r2 = jnp.asarray(RNG.integers(lo, hi, (g, w)), jnp.int32)
    r3 = jnp.asarray(RNG.integers(lo, hi, (g, h)), jnp.int32)
    return x, r1, r2, r3


def test_matches_xla_shift_path_u8():
    x, r1, r2, r3 = _case(5, 24, 32, -12, 13)
    out = geom_shift3(x, r1, r2, r3, tile_b=8, interpret=True)
    ref = _ref(x, r1, r2, r3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_matches_with_partial_last_block():
    # g*c = 21 with tile_b=8 -> a remainder block exercises the masked
    # final program
    x, r1, r2, r3 = _case(7, 16, 16, -7, 8)
    out = geom_shift3(x, r1, r2, r3, tile_b=8, interpret=True)
    ref = _ref(x, r1, r2, r3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_zero_shift_is_identity():
    x = jnp.asarray(RNG.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8))
    z_h = jnp.zeros((3, 16), jnp.int32)
    out = geom_shift3(x, z_h, z_h, z_h, tile_b=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_full_shift_blanks_image():
    x = jnp.asarray(RNG.integers(1, 256, (2, 16, 16, 3), dtype=np.uint8))
    r1 = jnp.full((2, 16), 16, jnp.int32)  # shift by the full width
    z = jnp.zeros((2, 16), jnp.int32)
    out = geom_shift3(x, r1, z, z, tile_b=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0)
