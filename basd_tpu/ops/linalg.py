"""Spectral linear-algebra core, designed for the TPU compilation model.

The reference delegates its hot numerics to cuSOLVER via
``torch.linalg.{svd, svdvals, eigvalsh, matrix_norm(ord="nuc")}``
(reference: ``src/losses/layer_selector.py:16,36,92,99``,
``src/losses/relational.py:47-48``). On TPU, XLA lowers general SVD to an
expensive iterative decomposition, while batched *symmetric*
eigendecomposition is comparatively fast and batches well. Every SVD the
BASD pipeline needs is therefore recast here as a symmetric eigenproblem:

- singular values of ``M``            -> ``sqrt(eigvals(M M^T))``
- right singular vectors of tall ``X`` -> ``eigvecs(X^T X)``
- nuclear norm of ``M``               -> ``sum(sqrt(eigvals(M M^T)))`` with a
  custom VJP whose backward is the polar factor of ``M`` computed by a
  Newton-Schulz iteration (pure MXU matmuls, no decomposition in the
  backward pass, stable under (near-)degenerate singular values where the
  textbook SVD/eigh backward blows up).

A ``backend="svd"`` parity path using ``jnp.linalg`` SVD directly is kept
for float-tolerance comparison against the PyTorch reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Spectral-path contractions must be f32-exact on TPU (default TPU matmul
# precision is bf16); this mirrors the reference's .float() loss math.
HI = jax.lax.Precision.HIGHEST

_SAFE_EIG_FLOOR = 1e-30


def sym_eigh_desc(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigh with eigenvalues in descending order.

    Returns ``(vals, vecs)`` where ``vecs[..., :, i]`` is the eigenvector of
    ``vals[..., i]``.
    """
    vals, vecs = jnp.linalg.eigh(a)
    return vals[..., ::-1], vecs[..., ::-1]


def _safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with zero (not inf/nan) gradient at x <= 0."""
    safe = jnp.sqrt(jnp.where(x > _SAFE_EIG_FLOOR, x, _SAFE_EIG_FLOOR))
    return jnp.where(x > _SAFE_EIG_FLOOR, safe, 0.0)


def singular_values_gram(m: jnp.ndarray, impl: str = "xla") -> jnp.ndarray:
    """Descending singular values of ``m`` (..., r, c) via the smaller Gram.

    Differentiable (vector-based eigenvalue backward — stable at
    degeneracies); equals ``torch.linalg.svdvals`` up to ~sqrt(eps)
    relative accuracy in the smallest values (Gram squaring).
    """
    r, c = m.shape[-2], m.shape[-1]
    if r <= c:
        gram = jnp.einsum("...ij,...kj->...ik", m, m, precision=HI)
    else:
        gram = jnp.einsum("...ji,...jk->...ik", m, m, precision=HI)
    vals = eigvalsh_only(gram, impl)[..., ::-1]
    return _safe_sqrt(vals)


def singular_values(m: jnp.ndarray, backend: str = "gram") -> jnp.ndarray:
    if backend == "gram":
        return singular_values_gram(m)
    if backend == "jacobi":
        return singular_values_gram(m, impl="jacobi")
    if backend == "svd":
        return jnp.linalg.svd(m, compute_uv=False)
    raise ValueError(f"unknown backend {backend!r}")


# -- degeneracy-safe symmetric eigendecomposition -------------------------

_EIGH_GRAD_CLAMP = 1e-6


def _eigh_impl(a: jnp.ndarray, impl: str) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward eigh dispatch: XLA QDWH or the Pallas parallel-Jacobi
    kernel ('jacobi', TPU fast path for many small batched matrices)."""
    if impl == "jacobi":
        from basd_tpu.ops.pallas.jacobi_eigh import jacobi_eigh

        batch_shape = a.shape[:-2]
        n = a.shape[-1]
        # interpret mode off-TPU so CPU tests of the jacobi backend work
        interpret = jax.default_backend() != "tpu"
        # 6 sweeps: the BASD matrices are PSD Grams with decaying or
        # [0,1]-clustered spectra, where cyclic Jacobi reaches the f32
        # floor in <=4 sweeps (measured, scripts/microbench.py); 6 keeps
        # a 1.5x margin while staying ahead of the QDWH custom-call on
        # the in-step (48, 96, 96) principal-angle batch.
        w, v = jacobi_eigh(a.reshape((-1, n, n)), sweeps=6,
                           interpret=interpret)
        return w.reshape(batch_shape + (n,)), v.reshape(batch_shape + (n, n))
    return jnp.linalg.eigh(a)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def eigvalsh_only(a: jnp.ndarray, impl: str = "xla") -> jnp.ndarray:
    """Eigenvalues (ascending) with a vector-based backward
    ``dA = V diag(dw) V^T`` — stable at degeneracies (no gap
    denominators), unlike differentiating through a full eigh."""
    if impl == "jacobi":
        return _eigh_impl(a, impl)[0]
    return jnp.linalg.eigvalsh(a)


def _eigvalsh_only_fwd(a, impl):
    w, v = _eigh_impl(a, impl)
    return w, v


def _eigvalsh_only_bwd(impl, v, dw):
    da = jnp.einsum("...ik,...k,...jk->...ij", v, dw, v, precision=HI)
    return (da,)


eigvalsh_only.defvjp(_eigvalsh_only_fwd, _eigvalsh_only_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def safe_eigh(a: jnp.ndarray, impl: str = "xla") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigh (ascending) whose backward clamps the
    1/(lambda_j - lambda_i) factors.

    The textbook eigh/SVD backward is undefined at repeated eigenvalues;
    with bf16-quantized activations feeding the Gram matrices, exact ties
    occur in practice and poison training with NaNs (observed on TPU).
    Clamping the eigenvalue gaps yields the standard "safe" subgradient:
    exact wherever the decomposition is differentiable, bounded at the
    degeneracies (where any basis of the eigenspace is equally valid, so
    the loss is insensitive to the unresolved rotation).
    """
    return _eigh_impl(a, impl)


def _safe_eigh_fwd(a, impl):
    w, v = _eigh_impl(a, impl)
    return (w, v), (w, v)


def _safe_eigh_bwd(impl, res, cotangents):
    w, v = res
    dw, dv = cotangents
    # F_ij = 1 / (w_j - w_i), clamped near degeneracies, zero diagonal
    diffs = w[..., None, :] - w[..., :, None]
    sign = jnp.where(diffs >= 0, 1.0, -1.0)
    denom = sign * jnp.maximum(jnp.abs(diffs), _EIGH_GRAD_CLAMP)
    f = 1.0 / denom
    eye = jnp.eye(w.shape[-1], dtype=w.dtype)
    f = f * (1.0 - eye)
    vt_dv = jnp.einsum("...ki,...kj->...ij", v, dv, precision=HI)
    inner = f * vt_dv + eye * dw[..., None, :]
    da = jnp.einsum(
        "...ik,...kl,...jl->...ij", v, inner, v, precision=HI
    )
    # symmetrize: the primal is only defined on symmetric inputs
    return ((da + jnp.swapaxes(da, -1, -2)) / 2.0,)


safe_eigh.defvjp(_safe_eigh_fwd, _safe_eigh_bwd)


def safe_eigh_desc(
    a: jnp.ndarray, impl: str = "xla"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    vals, vecs = safe_eigh(a, impl)
    return vals[..., ::-1], vecs[..., ::-1]


def right_singular_vectors(
    x: jnp.ndarray, backend: str = "gram"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Singular values and right singular vectors of ``x`` (..., m, n).

    Returns ``(s, v)`` with ``s`` descending and ``v[..., :, i]`` the i-th
    right singular vector (so ``v`` corresponds to ``Vt.T`` / ``V`` in torch
    SVD notation, up to per-column sign — all BASD uses are sign-invariant).

    The default backend forms the (n, n) Gram matrix ``x^T x`` (a single
    MXU-friendly contraction over the large token axis) and eigendecomposes
    it; gradients flow through ``jnp.linalg.eigh``'s backward.
    """
    if backend == "svd":
        _, s, vt = jnp.linalg.svd(x, full_matrices=False)
        return s, jnp.swapaxes(vt, -1, -2)
    gram = jnp.einsum("...ji,...jk->...ik", x, x, precision=HI)
    impl = "jacobi" if backend == "jacobi" else "xla"
    vals, vecs = safe_eigh_desc(gram, impl)
    return _safe_sqrt(vals), vecs


def rank_one_update_eigvals(
    w: jnp.ndarray, c: jnp.ndarray, rho: float, iters: int = 40
) -> jnp.ndarray:
    """Ascending eigenvalues of ``diag(w) + rho * c c^T`` (rho > 0).

    Vectorized bisection on the secular equation
    ``f(lam) = 1 + rho * sum_i c_i^2 / (w_i - lam)`` over the interlacing
    intervals ``w_j <= lam_j <= w_{j+1}`` (Golub 1973). All elementwise —
    no decomposition. 40 halvings reach f32 interval resolution; measured
    ~4e-7 relative accuracy vs a direct eigvalsh.

    Used to recover the UNCENTERED covariance spectrum (for
    Marchenko-Pastur ranks) from the centered Gram eigendecomposition the
    selector already computes: ``Z^T Z = Gram_centered + M mu mu^T`` — a
    rank-one update — so the (L,)-batch of covariance eigh calls
    disappears (XLA's QDWH eigh is ~1 ms/matrix on v5e regardless of
    batching; reference semantics: ``src/losses/layer_selector.py`` MP
    rank on projected tokens).

    Args:
        w: (..., N) ascending eigenvalues of the base matrix.
        c: (..., N) update vector IN THE EIGENBASIS (``V^T u``).
        rho: positive scalar multiplier.
    """
    c2 = jnp.square(c)
    hi_last = w[..., -1:] + rho * jnp.sum(c2, axis=-1, keepdims=True)
    lo = w
    hi = jnp.concatenate([w[..., 1:], hi_last], axis=-1)

    def secular(lam):
        diff = w[..., None, :] - lam[..., :, None]
        diff = jnp.where(jnp.abs(diff) < 1e-30, 1e-30, diff)
        return 1.0 + rho * jnp.sum(c2[..., None, :] / diff, axis=-1)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = secular(mid) < 0  # f increases from -inf to +inf per gap
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


# -- Newton-Schulz polar factor ------------------------------------------

# Accelerated odd-quintic coefficient schedule (PolarExpress/Muon-style):
# p(x) = a x + (b G + c G^2) x with G = x x^T. Early steps multiply small
# singular values by ~4x per step (vs 1.5x for the plain cubic), so the
# full spectrum reaches ~1 in 5 steps even at condition 1e5; two plain
# cubic steps then quadratically flatten the residual ripple (a value
# sigma = 1 + d maps to 1 - 1.5 d^2). Measured (scripts/microbench.py):
# nuclear-norm relative error <= 2.5e-4 across conditioning 1..1e5 —
# matching the 18-step cubic on easy spectra and beating it on hard ones —
# at ~60% of its cost.
_QUINTIC_SCHEDULE = (
    (4.0848, -6.8946, 2.9270),
    (3.9505, -6.3029, 2.6377),
    (3.7418, -5.5913, 2.3037),
    (2.8769, -3.1427, 1.2046),
    (2.8366, -3.0525, 1.2012),
)


def newton_schulz_polar(
    m: jnp.ndarray,
    steps: int = 18,
    inner_dtype=jnp.bfloat16,
    schedule: str = "cubic",
) -> jnp.ndarray:
    """Polar factor ``U V^T`` of ``m`` (..., r, c) by Newton-Schulz iteration.

    ``schedule='cubic'``: ``steps`` iterations of ``X <- 1.5 X - 0.5 X X^T X``
    after Frobenius prescaling (spectral norm <= 1 < sqrt(3), the NS
    convergence region). Singular values flow to 1 (zero stays zero), i.e.
    the limit is the minimum-norm subgradient of the nuclear norm.

    ``schedule='hybrid'``: 5 accelerated quintic steps + 2 cubic cleanup
    steps (see ``_QUINTIC_SCHEDULE``) — the TPU fast path. Trimming the
    tail was probed (scripts/ns_schedule_probe.py, r5): dropping one
    cubic (~10% fewer matmuls, ~1 ms/step) costs 2-3x in nuclear-value
    error on decaying spectra (1.3e-2 -> 2.1e-2 worst-case synthetic;
    realistic flat-ish spectra 2.9e-4 -> 5.6e-4) — kept at 5q+2c.

    The iteration runs in ``inner_dtype`` (bf16 by default — full MXU
    rate). bf16 rounding perturbs the polar by ~1e-2 in the worst
    direction, which costs only ~3e-4 relative error in the nuclear-norm
    value (second-order insensitivity) and ~1% in the gradient direction;
    pass ``inner_dtype=jnp.float32`` for the high-precision variant.

    On TPU the bf16 hybrid schedule dispatches to the fused Pallas
    kernel (``ops.pallas.ns_polar``) when the trailing dims satisfy its
    tiling constraints: the XLA lowering round-trips ~1.3 GB of
    intermediates to HBM per iteration at the Procrustes batch and is
    bandwidth-bound; the kernel keeps the whole iteration VMEM-resident.
    """
    if (
        schedule == "hybrid"
        and inner_dtype == jnp.bfloat16
        and m.ndim >= 3
        and jax.default_backend() == "tpu"
    ):
        *batch, r, c = m.shape
        flip = r > c
        rr, cc = (c, r) if flip else (r, c)
        if rr % 8 == 0 and cc % 128 == 0:
            from basd_tpu.ops.pallas.ns_polar import ns_polar_hybrid

            x = m.astype(jnp.float32).reshape((-1, r, c))
            if flip:
                x = jnp.swapaxes(x, -1, -2)
            p = ns_polar_hybrid(x)
            if flip:
                p = jnp.swapaxes(p, -1, -2)
            return p.reshape(m.shape).astype(m.dtype)
    dtype = m.dtype
    x = m.astype(jnp.float32)
    norm = jnp.sqrt(
        jnp.sum(jnp.square(x), axis=(-2, -1), keepdims=True) + 1e-30
    )
    x = (x / norm).astype(inner_dtype)
    prec = HI if inner_dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    def cubic(x):
        xxt = jnp.einsum("...ij,...kj->...ik", x, x, precision=prec,
                         preferred_element_type=jnp.float32)
        y = 1.5 * x.astype(jnp.float32) - 0.5 * jnp.einsum(
            "...ik,...kj->...ij", xxt.astype(inner_dtype), x,
            precision=prec, preferred_element_type=jnp.float32,
        )
        return y.astype(inner_dtype)

    def quintic(x, a, b, c):
        # every intermediate that hits HBM stays in inner_dtype (the f32
        # matmul accumulators convert in the epilogue — XLA fuses the
        # casts), halving the Gram-chain bandwidth; the polar iteration is
        # a contraction toward sigma=1, so bf16 ripple here is absorbed by
        # the later steps and the final cubic cleanup.
        g = jnp.einsum("...ij,...kj->...ik", x, x, precision=prec,
                       preferred_element_type=jnp.float32).astype(inner_dtype)
        g2 = jnp.einsum("...ij,...kj->...ik", g, g, precision=prec,
                        preferred_element_type=jnp.float32).astype(inner_dtype)
        h = (jnp.float32(b) * g.astype(jnp.float32)
             + jnp.float32(c) * g2.astype(jnp.float32)).astype(inner_dtype)
        y = a * x.astype(jnp.float32) + jnp.einsum(
            "...ik,...kj->...ij", h, x,
            precision=prec, preferred_element_type=jnp.float32,
        )
        return y.astype(inner_dtype)

    # unrolled (static step count): lets XLA pipeline the matmul chain
    # instead of a while-loop barrier per iteration
    if schedule == "hybrid":
        for a, b, c in _QUINTIC_SCHEDULE:
            x = quintic(x, a, b, c)
        for _ in range(2):
            x = cubic(x)
    else:
        for _ in range(steps):
            x = cubic(x)
    return x.astype(dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def nuclear_norm(m: jnp.ndarray) -> jnp.ndarray:
    """Nuclear norm of ``m`` (..., r, c) -> (...).

    Forward: sum of singular values via Gram eigendecomposition.
    Backward: ``g * polar(m)`` via Newton-Schulz (the nuclear-norm
    subgradient), replacing the degenerate-sensitive SVD backward.
    Equivalent to ``torch.linalg.matrix_norm(m, ord="nuc")``
    (reference: ``src/losses/relational.py:48``).
    """
    return jnp.sum(singular_values_gram(m), axis=-1)


def _nuclear_fwd(m):
    return nuclear_norm(m), m


def _nuclear_bwd(m, g):
    polar = newton_schulz_polar(m, schedule="hybrid")
    return (g[..., None, None] * polar,)


nuclear_norm.defvjp(_nuclear_fwd, _nuclear_bwd)


def nuclear_norm_ref(m: jnp.ndarray) -> jnp.ndarray:
    """Parity backend: nuclear norm via jnp SVD (torch-matching gradients
    away from degeneracies)."""
    return jnp.sum(jnp.linalg.svd(m, compute_uv=False), axis=-1)


@jax.custom_vjp
def nuclear_norm_ns(m: jnp.ndarray) -> jnp.ndarray:
    """Nuclear norm via the polar factor alone: ``||M||_* = tr(P^T M)``
    with ``P = polar(M)`` from Newton-Schulz — pure batched MXU matmuls,
    no eigendecomposition anywhere.

    The maximizer characterization ``||M||_* = max_{||Q||_2<=1} tr(Q^T M)``
    is attained at Q = P and is FIRST-ORDER INSENSITIVE to errors in P, so
    a moderately-converged polar gives a second-order-accurate value. One
    NS iteration is shared between forward and backward (grad = P).
    """
    p = newton_schulz_polar(m, schedule="hybrid")
    return jnp.einsum("...ij,...ij->...", p.astype(jnp.float32),
                      m.astype(jnp.float32), precision=HI)


def _nuclear_ns_fwd(m):
    p = newton_schulz_polar(m, schedule="hybrid")
    val = jnp.einsum("...ij,...ij->...", p.astype(jnp.float32),
                     m.astype(jnp.float32), precision=HI)
    return val, p


def _nuclear_ns_bwd(p, g):
    return (g[..., None, None] * p,)


nuclear_norm_ns.defvjp(_nuclear_ns_fwd, _nuclear_ns_bwd)


def orthogonal_matrix(key: jax.Array, rows: int, cols: int, dtype=jnp.float32):
    """Random orthogonal (rows, cols) matrix with orthonormal rows (rows <=
    cols) or columns (rows >= cols), matching the semantics of
    ``torch.nn.init.orthogonal_`` (reference:
    ``src/losses/layer_selector.py:51-56``)."""
    flat = jax.random.normal(key, (max(rows, cols), min(rows, cols)), dtype=jnp.float32)
    q, r = jnp.linalg.qr(flat)
    # sign correction for a uniform (Haar) distribution
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    if rows < cols:
        q = q.T
    return q.astype(dtype)
