"""Batched symmetric eigensolver: parallel-ordered cyclic Jacobi in Pallas.

Motivation (north star: fused Pallas kernels for the BASD spectral
pipeline): the Grassmannian selector performs dozens of independent
(D_s x D_s) symmetric eigendecompositions per step; XLA's QDWH eigh
custom-calls cost ~74 ms/step of a 513 ms step at batch 512 (traced).

Design — everything is full-width vector algebra, no slices/concats
(Mosaic rejects misaligned lane concatenation):

- pairs are FIXED as (j, j + m), m = n/2. With per-pair rotation
  coefficients (c_j, s_j) computed simultaneously at lanes j and j+m,
  the lane-j+m copies come out as (c, -s), so BOTH row and column
  rotations collapse to one uniform elementwise update:

      A <- C * A - S * roll(A, m)            (columns; lane roll)
      A <- C' * A - S' * roll(A, m, sublane) (rows; sublane roll)
      V <- C * V - S * roll(V, m)            (eigenvector accumulation)

  where C/S are the full-width coefficient vectors (S antisymmetric
  across the halves). The 2x2 diagonal entries (a_pp, a_qq, a_pq) are
  extracted with masked diagonal reductions of A and roll(A, -m).

- the round-robin tournament advance (music-chairs, element 0 fixed) is
  a fixed permutation sigma applied to rows, columns, and V columns each
  round; it decomposes into 4 static rolls + iota-masked selects.

- fixed sweep count keeps shapes static; matrices are processed
  ``tile_b`` per grid program, batched on the leading axis so the VPU
  lanes stay full.

Outputs match ``jnp.linalg.eigh`` up to ordering (sorted ascending) and
per-column sign.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_robin_schedule(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n-1, n/2) top/bottom pairing schedule (host-side reference)."""
    m = n // 2
    top = list(range(0, n, 2))
    bot = list(range(1, n, 2))
    tops, bots = [], []
    for _ in range(n - 1):
        tops.append(top.copy())
        bots.append(bot.copy())
        top_new = [top[0], bot[0]] + top[1:-1]
        bot_new = bot[1:] + [top[-1]]
        top, bot = top_new, bot_new
    return np.asarray(tops), np.asarray(bots)


def _roll(x, shift, axis):
    return pltpu.roll(x, shift, axis=axis)


def _permute_pairs(x: jnp.ndarray, idx: jnp.ndarray, axis: int, m: int):
    """Apply the round-robin slot permutation sigma along ``axis``.

    sigma (destination <- source): 0<-0, 1<-m, i<-i-1 for 2<=i<m,
    m+i<-m+i+1 for 0<=i<m-2... i.e. slots [m, 2m-2] <- +1, slot
    2m-1 <- m-1. Realized with rolls (dest i <- src i-s means roll by s):
      cand_a = roll(+1)   for 2<=i<=m-1
      cand_b = roll(-1)   for m<=i<=2m-2
      cand_c = roll(1-m)  for i == 1        (src m)
      cand_d = roll(+m)   for i == 2m-1     (src m-1)
      keep x              for i == 0
    """
    n = x.shape[axis]
    a = _roll(x, 1, axis)
    b = _roll(x, n - 1, axis)  # roll(-1)
    c = _roll(x, (1 - m) % n, axis)
    d = _roll(x, m, axis)
    out = jnp.where((idx >= 2) & (idx <= m - 1), a, x)
    out = jnp.where((idx >= m) & (idx <= 2 * m - 2), b, out)
    out = jnp.where(idx == 1, c, out)
    out = jnp.where(idx == 2 * m - 1, d, out)
    return out


def _jacobi_kernel(
    a_ref, w_ref, v_ref, *, n: int, sweeps: int, tile_b: int,
    compute_vectors: bool,
):
    m = n // 2
    eps = 1e-30

    a = a_ref[...].astype(jnp.float32)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)
    v = jnp.broadcast_to(eye, (tile_b, n, n))

    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_b, n, n), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (tile_b, n, n), 1)
    lane_vec = jax.lax.broadcasted_iota(jnp.int32, (tile_b, 1, n), 2)

    def one_round(carry):
        a, v = carry
        # pair-diagonal extraction at full width:
        #   d[j]   = A[j, j]
        #   dr[j]  = A[j, (j+m) mod n]  (= a_pq at lane j, symmetric)
        d = jnp.sum(a * eye, axis=-1)  # (tile_b, n)
        a_shift = _roll(a, (-m) % n, 2)  # lane j holds A[:, j+m]
        dr = jnp.sum(a_shift * eye, axis=-1)
        app = d
        aqq = _roll(d[:, None, :], (-m) % n, 2)[:, 0, :]  # d[j+m]
        apq = dr

        abs_apq = jnp.abs(apq)
        tau = (aqq - app) / (2.0 * jnp.where(abs_apq < eps, 1.0, apq))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(abs_apq < eps, 0.0, t)
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c
        # lanes j and j+m of (c, s) computed independently satisfy
        # c[j+m] = c[j], s[j+m] = -s[j] (tau flips sign) — the uniform
        # update A <- C*A - S*roll(A, m) is exact on both halves.

        c_col = c[:, None, :]
        s_col = s[:, None, :]
        partner_cols = _roll(a, m, 2)  # lane j holds A[:, j-m mod n]=A[:, j+m]
        a = c_col * a - s_col * partner_cols

        c_row = c[:, :, None]
        s_row = s[:, :, None]
        partner_rows = _roll(a, m, 1)
        a = c_row * a - s_row * partner_rows

        if compute_vectors:
            partner_v = _roll(v, m, 2)
            v = c_col * v - s_col * partner_v

        # round-robin advance on rows, columns, and V columns
        a = _permute_pairs(a, sub, 1, m)
        a = _permute_pairs(a, lane, 2, m)
        if compute_vectors:
            v = _permute_pairs(v, lane, 2, m)
        return a, v

    def sweep_body(_, carry):
        return jax.lax.fori_loop(
            0, n - 1, lambda _, c2: one_round(c2), carry
        )

    a, v = jax.lax.fori_loop(0, sweeps, sweep_body, (a, v))

    w_ref[...] = jnp.sum(a * eye, axis=-1)
    if compute_vectors:
        v_ref[...] = v
    else:
        v_ref[...] = jnp.broadcast_to(eye, (tile_b, n, n))


def jacobi_eigh(
    a: jnp.ndarray,
    *,
    sweeps: int = 10,
    tile_b: int = 8,
    compute_vectors: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigh via parallel Jacobi (ascending eigenvalues).

    Args:
        a: (B, n, n) symmetric float32; n must be even.
        compute_vectors: skip eigenvector accumulation (values-only
            callers, e.g. principal-angle spectra).

    Returns:
        (w, v): (B, n) ascending eigenvalues, (B, n, n) eigenvectors
        (identity when ``compute_vectors=False``).
    """
    batch, n, n2 = a.shape
    assert n == n2 and n % 2 == 0, f"need even square matrices, got {a.shape}"
    pad = (-batch) % tile_b
    if pad:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))], 0
        )
    padded = a.shape[0]

    kernel = functools.partial(
        _jacobi_kernel, n=n, sweeps=sweeps, tile_b=tile_b,
        compute_vectors=compute_vectors,
    )
    w, v = pl.pallas_call(
        kernel,
        grid=(padded // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((padded, n), jnp.float32),
            jax.ShapeDtypeStruct((padded, n, n), jnp.float32),
        ),
        interpret=interpret,
    )(a.astype(jnp.float32))

    w = w[:batch]
    v = v[:batch]
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    if compute_vectors:
        v_sorted = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    else:
        v_sorted = v
    return w_sorted, v_sorted
