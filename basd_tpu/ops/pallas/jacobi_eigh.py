"""Batched symmetric eigensolver: matmul-formulation Brent-Luk Jacobi.

Motivation (north star: fused Pallas kernels for the BASD spectral
pipeline): the Grassmannian selector performs dozens of independent
small symmetric eigendecompositions per step. XLA's eigh custom-call
serializes the batch — measured (scripts/microbench.py, v5e):
``(1,96,96)`` 1.7 ms but ``(48,96,96)`` 17.6 ms (~0.35 ms *per matrix*),
``(16,192,192)`` 18.1 ms — so a kernel that keeps the whole batch
resident in VMEM and applies every rotation batch-parallel on the MXU
wins on exactly the shapes the selector produces.

Design — every data movement is a matmul against a CONSTANT matrix
(iota-built in the kernel), no lane rolls (v1 of this kernel lowered
unit-shift rolls to shuffle cascades and lost 10x; see git history):

- pairs are FIXED in slot space as (j, (j+m) % n), m = n/2. The swap
  involution ``S[i,k] = [k == (i+m) % n]`` extracts partner diagonals
  (``d @ S``) and off-diagonals (``sum(A*S, -1)``), and carries the
  rotation's off-diagonal coefficients.
- computing the Jacobi angle formula FULL-WIDTH per slot j gives
  ``c[j+m] = c[j]`` and ``s[j+m] = -s[j]`` automatically (tau is odd
  under p<->q exchange), so the Givens aggregate for all m pairs is the
  dense matrix ``J = diag(c) + diag(s) S``.
- the Brent-Luk round advance (music chairs, slot 0 fixed) is a
  constant column-permutation ``P``; folding it in gives ONE rotation
  matrix per round, ``Jt = diag(c) P + diag(s) (S P)``, and the round
  update is three batched MXU matmuls:

      A <- Jt^T A Jt        V <- V Jt

  The loop body is round-invariant (same constants every round), so
  ``lax.fori_loop`` compiles one body for ``sweeps * (n-1)`` trips.

Outputs match ``jnp.linalg.eigh`` up to ordering (sorted ascending
outside the kernel) and per-column sign.

Status (v5e, measured): all in-kernel dots need ``Precision.HIGHEST`` —
TPU DEFAULT evaluates f32 dots as single-pass bf16 and ~1000 chained
bf16 rotations destroy orthogonality (the iteration visibly diverges).
With that, on the selector's in-step (48, 96, 96) clustered-spectrum
principal-angle batch the kernel at 6 sweeps runs ~12.4 ms vs ~15.4 ms
for the QDWH custom-call (bench: 294 -> 286 ms/step) — the 'jacobi'
backend uses it there. At (16, 192, 192) the 2(n-1)*sweeps sequential
rounds cost ~31 ms vs QDWH's ~17 ms, so the stacked subspace eigh stays
on XLA regardless of backend.

Why the (L+P, 192, 192) stacked eigh cannot be shrunk either (round-3
analysis, closing the "win or retire 192^2" question):

- *Rank-cap projection* (randomized range finder to r_cap=96 before the
  eigh) breaks MP-rank semantics: the noise threshold's sigma^2 is the
  MEDIAN covariance eigenvalue — the 96th of 192 ascending
  (selector.py sigma2 line, reference layer_selector.py:69-74) — which
  lives in exactly the part of the spectrum a top-subspace sketch
  discards. The full spectrum is required, and computing it separately
  (eigvalsh) costs as much as the factorization.
- *Eigenvector-free reformulation* (spectral projectors via a matrix
  sign / polar function shifted at the MP threshold) still needs the
  sorted eigenvalues twice: for the median above, and because the
  principal-angle distance weights each direction by its singular value
  (spectral_grassmann_distance_sq) — a projector collapses precisely
  that grading.

So eigenvalues are inescapable, ordered, and full-spectrum; QDWH's
measured 17 ms at (16, 192, 192) stands as the best available and the
Jacobi kernel is scoped to the principal-angle batch where it wins.
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


def _jacobi_kernel(
    a_ref, w_ref, v_ref, a_s, v_s, *, n: int, sweeps: int, tile_b: int,
    compute_vectors: bool,
):
    m = n // 2
    eps = 1e-30
    f32 = jnp.float32

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)  # s
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)  # d / k
    eye = (row == col).astype(f32)
    # swap involution: S[i, k] = [k == (i + m) % n]
    swap = (col == (row + m) % n).astype(f32)
    # music-chairs column permutation P[s, d] = [s == sigma(d)], where
    # sigma(0)=0, sigma(1)=m, sigma(d)=d-1 (2<=d<m), sigma(d)=d+1
    # (m<=d<=n-2), sigma(n-1)=m-1  (slot 0 fixed, halves counter-rotate)
    perm = (
        ((col == 0) & (row == 0))
        | ((col == 1) & (row == m))
        | ((col >= 2) & (col <= m - 1) & (row == col - 1))
        | ((col >= m) & (col <= n - 2) & (row == col + 1))
        | ((col == n - 1) & (row == m - 1))
    ).astype(f32)
    # TPU DEFAULT precision computes f32 dots as single-pass bf16;
    # ~1000 chained rotation rounds at bf16 precision destroy
    # orthogonality and the iteration diverges (observed). HIGHEST is
    # true-f32 emulation (Mosaic supports only DEFAULT/HIGHEST).
    prec = jax.lax.Precision.HIGHEST
    swap_perm = jax.lax.dot_general(
        swap, perm, (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    )

    # state lives in VMEM scratch and is updated in place each round
    a_s[...] = a_ref[...].astype(f32)
    if compute_vectors:
        v_s[...] = jnp.broadcast_to(eye, (tile_b, n, n))

    def one_round(_, carry):
        a = a_s[...]
        d = jnp.sum(a * eye, axis=-1)  # (B, n): A[j, j]
        aqq = jax.lax.dot_general(
            d, swap, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=prec,
        )  # d[(j+m) % n]
        apq = jnp.sum(a * swap, axis=-1)  # A[j, (j+m) % n]

        abs_apq = jnp.abs(apq)
        ok = abs_apq > eps
        tau = (aqq - d) / (2.0 * jnp.where(ok, apq, 1.0))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(ok, t, 0.0)
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c
        # slots j and j+m carry (c, s) and (c, -s): J = diag(c)+diag(s)S
        # annihilates all m off-diagonal pairs; fold in the round advance
        jt = c[:, :, None] * perm[None] + s[:, :, None] * swap_perm[None]

        ajt = jax.lax.dot_general(
            a, jt, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
            precision=prec,
        )
        a_s[...] = jax.lax.dot_general(
            jt, ajt, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32,
            precision=prec,
        )
        if compute_vectors:
            v_s[...] = jax.lax.dot_general(
                v_s[...], jt, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32, precision=prec,
            )
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
    tile_b: int | None = None,
    compute_vectors: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigh via matmul-form parallel Jacobi.

    Args:
        a: (B, n, n) symmetric float32; n must be even.
        tile_b: matrices per grid program (default: the whole batch —
            grid programs serialize on the single TensorCore, so one
            program maximizes batch-parallel MXU work; VMEM use is
            ~4 * tile_b * n^2 f32).
        compute_vectors: skip eigenvector accumulation (values-only).

    Returns:
        (w, v): (B, n) ascending eigenvalues, (B, n, n) eigenvectors
        (identity when ``compute_vectors=False``).
    """
    batch, n, n2 = a.shape
    assert n == n2 and n % 2 == 0, f"need even square matrices, got {a.shape}"
    if tile_b is None:
        # ~4 live (tile_b, n, n) f32 arrays; stay under ~48MB of VMEM
        tile_b = max(1, min(batch, (48 * 2**20) // (4 * 4 * n * n)))
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
