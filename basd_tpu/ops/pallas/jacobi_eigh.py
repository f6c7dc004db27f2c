"""Batched symmetric eigensolver: parallel-ordered cyclic Jacobi in Pallas.

Motivation (north star: fused Pallas kernels for the BASD spectral
pipeline): the Grassmannian selector performs dozens of independent
(D_s x D_s) symmetric eigendecompositions per step. XLA lowers
``jnp.linalg.eigh`` to QDWH — accurate, but dominated by small sequential
panel factorizations that leave the TPU idle (~1.25 ms per 192x192 matrix
measured on v5e).

This kernel instead runs one-sweep-parallel Jacobi:

- matrices are paired as (top half, bottom half) rows; all n/2 Jacobi
  rotations of a round are independent and apply as ELEMENTWISE
  row/column combinations of two (n/2, n) blocks — pure VPU work, no
  gathers;
- the round-robin tournament ordering advances with static-slice
  concatenations (no dynamic permutation);
- several matrices are processed per grid program, stacked on the
  sublane axis so the VPU lanes stay full;
- a fixed sweep count keeps shapes/control flow static (10 sweeps drives
  off-diagonal mass to ~f32 roundoff for the matrices BASD produces).

Outputs match ``jnp.linalg.eigh`` up to eigenvalue ordering (we sort
ascending to match) and per-column sign.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_robin_schedule(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Precompute the (n-1, n/2) top/bottom index schedule (host-side,
    for reference/testing only — the kernel realizes the same schedule
    with static slices)."""
    m = n // 2
    top = list(range(0, n, 2))
    bot = list(range(1, n, 2))
    tops, bots = [], []
    for _ in range(n - 1):
        tops.append(top.copy())
        bots.append(bot.copy())
        # music-chairs rotation, element 0 fixed
        top_new = [top[0], bot[0]] + top[1:-1]
        bot_new = bot[1:] + [top[-1]]
        top, bot = top_new, bot_new
    return np.asarray(tops), np.asarray(bots)


def _jacobi_kernel(a_ref, w_ref, v_ref, *, n: int, sweeps: int, tile_b: int):
    """Kernel body: diagonalize ``tile_b`` matrices of size (n, n).

    Refs:
        a_ref: (tile_b, n, n) input symmetric matrices (VMEM).
        w_ref: (tile_b, n) eigenvalues out.
        v_ref: (tile_b, n, n) eigenvectors out (columns).
    """
    m = n // 2
    eps = 1e-30

    a = a_ref[...].astype(jnp.float32)
    # v starts as identity
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)
    v = jnp.broadcast_to(eye, (tile_b, n, n))

    diag_top = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(jnp.float32)

    def one_round(a, v):
        a_tt = a[:, :m, :m]
        a_tb = a[:, :m, m:]
        a_bb = a[:, m:, m:]
        app = jnp.sum(a_tt * diag_top, axis=-1)
        aqq = jnp.sum(a_bb * diag_top, axis=-1)
        apq = jnp.sum(a_tb * diag_top, axis=-1)

        abs_apq = jnp.abs(apq)
        tau = (aqq - app) / (2.0 * jnp.where(abs_apq < eps, 1.0, apq))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(abs_apq < eps, 0.0, t)
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c

        c_row = c[:, :, None]
        s_row = s[:, :, None]
        top = a[:, :m, :]
        bot = a[:, m:, :]
        new_top = c_row * top - s_row * bot
        new_bot = s_row * top + c_row * bot

        c_col = c[:, None, :]
        s_col = s[:, None, :]
        a2_left = jnp.concatenate([new_top[:, :, :m], new_bot[:, :, :m]], 1)
        a2_right = jnp.concatenate([new_top[:, :, m:], new_bot[:, :, m:]], 1)
        new_left = c_col * a2_left - s_col * a2_right
        new_right = s_col * a2_left + c_col * a2_right

        v_left = v[:, :, :m]
        v_right = v[:, :, m:]
        nv_left = c_col * v_left - s_col * v_right
        nv_right = s_col * v_left + c_col * v_right

        # --- round-robin advance ---
        # pair-slot permutation applies simultaneously to row blocks
        # (sublanes) and column blocks (lanes) of A, and columns of V.
        def adv_rows(blk):  # blk: (tile_b, n, k) rows ordered [T; B]
            t_blk = blk[:, :m]
            b_blk = blk[:, m:]
            nt = jnp.concatenate(
                [t_blk[:, 0:1], b_blk[:, 0:1], t_blk[:, 1 : m - 1]], axis=1
            )
            nb = jnp.concatenate([b_blk[:, 1:m], t_blk[:, m - 1 : m]], axis=1)
            return jnp.concatenate([nt, nb], axis=1)

        def adv_cols(left, right):  # (tile_b, r, m) each
            nl = jnp.concatenate(
                [left[:, :, 0:1], right[:, :, 0:1], left[:, :, 1 : m - 1]],
                axis=2,
            )
            nr = jnp.concatenate(
                [right[:, :, 1:m], left[:, :, m - 1 : m]], axis=2
            )
            return nl, nr

        new_left, new_right = adv_cols(new_left, new_right)
        a_next = adv_rows(jnp.concatenate([new_left, new_right], axis=2))
        nv_left, nv_right = adv_cols(nv_left, nv_right)
        v_next = jnp.concatenate([nv_left, nv_right], axis=2)
        return a_next, v_next

    def sweep_body(_, carry):
        a, v = carry

        def rb(_, c2):
            return one_round(*c2)

        return jax.lax.fori_loop(0, n - 1, rb, (a, v))

    a, v = jax.lax.fori_loop(0, sweeps, sweep_body, (a, v))

    # diagonal of A = eigenvalues (in the final permuted order); V columns
    # are in the SAME permuted order, so (w, V) pairs stay consistent.
    eye_n = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)
    w = jnp.sum(a * eye_n, axis=-1)  # (tile_b, n)
    w_ref[...] = w
    v_ref[...] = v


def jacobi_eigh(
    a: jnp.ndarray,
    *,
    sweeps: int = 10,
    tile_b: int = 8,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigh via parallel Jacobi (ascending eigenvalues).

    Args:
        a: (B, n, n) symmetric float32; n must be even.

    Returns:
        (w, v): (B, n) ascending eigenvalues, (B, n, n) eigenvectors
        (column i pairs with w[..., i]).
    """
    batch, n, n2 = a.shape
    assert n == n2 and n % 2 == 0, f"need even square matrices, got {a.shape}"
    pad = (-batch) % tile_b
    if pad:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))], 0
        )
    padded = a.shape[0]

    kernel = functools.partial(_jacobi_kernel, n=n, sweeps=sweeps, tile_b=tile_b)
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
    v_sorted = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    return w_sorted, v_sorted
