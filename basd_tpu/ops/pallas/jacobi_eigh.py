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

Status (v5e, remote-compile toolchain): correct (5.8e-4 max eigenvalue
error at 8 sweeps on (48, 96, 96)) but ~10x slower than XLA's QDWH —
Mosaic unrolls the round loop and lowers the unit-shift rolls on
non-128-aligned lanes to expensive shuffle sequences. Kept as an opt-in
backend ('jacobi'); 'gram' (QDWH) remains the default. Next round:
128-aligned layouts and grouped rotations.
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
    a_ref, w_ref, v_ref, a_s, v_s, *, n: int, sweeps: int, tile_b: int,
    compute_vectors: bool,
):
    m = n // 2
    eps = 1e-30

    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_b, n, n), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (tile_b, n, n), 1)

    # state lives in VMEM scratch and is updated in place each round —
    # without the ref round-trip Mosaic stack-allocates every unrolled
    # iteration of the loop (observed: 125MB scoped-vmem OOM).
    a_s[...] = a_ref[...].astype(jnp.float32)
    v_s[...] = jnp.broadcast_to(eye, (tile_b, n, n))

    def one_round(_, carry):
        a = a_s[...]
        # pair-diagonal extraction at full width:
        d = jnp.sum(a * eye, axis=-1)  # (tile_b, n): A[j, j]
        a_shift = _roll(a, (-m) % n, 2)  # lane j holds A[:, j+m]
        dr = jnp.sum(a_shift * eye, axis=-1)  # A[j, j+m]
        app = d
        aqq = _roll(d[:, None, :], (-m) % n, 2)[:, 0, :]  # d[j+m]
        apq = dr

        abs_apq = jnp.abs(apq)
        tau = (aqq - app) / (2.0 * jnp.where(abs_apq < eps, 1.0, apq))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(abs_apq < eps, 0.0, t)
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c
        # lanes j and j+m of (c, s) satisfy c[j+m] = c[j], s[j+m] = -s[j],
        # so A <- C*A - S*roll(A, m) is the exact rotation on both halves.

        c_col = c[:, None, :]
        s_col = s[:, None, :]
        a = c_col * a - s_col * _roll(a, m, 2)
        c_row = c[:, :, None]
        s_row = s[:, :, None]
        a = c_row * a - s_row * _roll(a, m, 1)

        # round-robin advance on rows and columns
        a = _permute_pairs(a, sub, 1, m)
        a = _permute_pairs(a, lane, 2, m)
        a_s[...] = a

        if compute_vectors:
            v = v_s[...]
            v = c_col * v - s_col * _roll(v, m, 2)
            v = _permute_pairs(v, lane, 2, m)
            v_s[...] = v
        return carry

    jax.lax.fori_loop(0, sweeps * (n - 1), one_round, 0)

    w_ref[...] = jnp.sum(a_s[...] * eye, axis=-1)
    if compute_vectors:
        v_ref[...] = v_s[...]
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
        # Mosaic unrolls the round loop and its liveness analysis keeps
        # ~2 temporaries per unrolled round on the VMEM stack; raise the
        # scoped limit well above the 16MB default (v5e VMEM is 128MB).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, n, n), jnp.float32),
            pltpu.VMEM((tile_b, n, n), jnp.float32),
        ],
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
