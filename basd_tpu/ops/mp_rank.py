"""Marchenko-Pastur rank estimation.

Reference semantics (``src/losses/layer_selector.py:8-20``): given features
``(M, D)``, form the covariance ``X^T X / M`` (or the Gram ``X X^T / M``
when ``M < D``), take ``sigma^2`` as the *median* eigenvalue, and count
eigenvalues above the MP upper edge ``lambda_plus = sigma^2 (1+sqrt(q))^2``
with ``q = D / M``.

TPU-first notes:

- the rank is returned as a traced scalar ``int32`` array, NOT a Python
  int — downstream consumers build static-shape *masks* from it instead of
  dynamic slices, keeping the whole selector jit-compilable;
- ``median`` follows torch's convention (lower of the two middle elements
  for even length), which differs from ``jnp.median`` (their average);
- batched input uses one batched ``eigvalsh``, the TPU fast path.
"""

from __future__ import annotations

import jax.numpy as jnp

from basd_tpu.ops.linalg import HI, eigvalsh_only


def _torch_style_median(sorted_vals: jnp.ndarray) -> jnp.ndarray:
    """Median over the last axis of pre-sorted values, torch convention
    (element at index (n-1)//2)."""
    n = sorted_vals.shape[-1]
    return sorted_vals[..., (n - 1) // 2]


def marchenko_pastur_rank(features: jnp.ndarray, impl: str = "xla") -> jnp.ndarray:
    """MP rank of ``features`` (..., M, D) -> (...,) int32 (traced).

    ``q = D / M`` regardless of which Gram matrix is formed, exactly as the
    reference computes it.
    """
    m, d = features.shape[-2], features.shape[-1]
    q = d / m
    f32 = features.astype(jnp.float32)
    if m >= d:
        cov = jnp.einsum("...ji,...jk->...ik", f32, f32, precision=HI) / m
    else:
        cov = jnp.einsum("...ij,...kj->...ik", f32, f32, precision=HI) / m
    eigvals = eigvalsh_only(cov, impl)  # ascending
    sigma2 = _torch_style_median(eigvals)
    lambda_plus = sigma2 * (1.0 + q**0.5) ** 2
    return jnp.sum(eigvals > lambda_plus[..., None], axis=-1).astype(jnp.int32)
