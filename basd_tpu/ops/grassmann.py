"""Grassmannian subspace extraction and spectrally-weighted principal angles.

Reference semantics:

- ``_grassmann_subspace`` (``src/losses/layer_selector.py:23-37``): center
  the projected tokens, SVD, return the top-k right-singular basis and the
  top-k singular values as spectral weights.
- principal angles (``src/losses/layer_selector.py:96-105``):
  ``theta = acos(clamp(svdvals(U_s^T U_t), <= 1-eps))`` and the distance
  ``d^2 = sum(sw * theta^2) / sum(sw)``.

TPU-first redesign — static shapes under data-dependent ranks:

The per-layer MP rank ``k`` changes every step, and the reference slices
``Vt[:k]`` — a dynamic shape jit cannot compile. Here every subspace is kept
at its full (D, D) basis together with a boolean *rank mask*; the masked
cross-basis matrix ``diag(m) G diag(m)`` has exactly the top-k x top-k block
of ``G`` surviving, so its singular values are the reference's k principal
cosines followed by exact zeros. The padded zeros map to ``theta = pi/2``
but carry zero spectral weight (the weights are masked with the same mask),
so the weighted distance is *exactly* the dynamic-shape value.
"""

from __future__ import annotations

import jax.numpy as jnp

from basd_tpu.ops.linalg import HI, right_singular_vectors, singular_values

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def grassmann_subspace(
    z: jnp.ndarray, backend: str = "gram"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full PCA basis and singular values of projected tokens.

    Args:
        z: (..., M, D) projected tokens (will be centered in float32).

    Returns:
        basis: (..., D, D) right-singular vectors, descending by singular
            value (column i of ``basis`` is the i-th direction).
        svals: (..., D) singular values, descending.
    """
    z = z.astype(jnp.float32)
    z = z - jnp.mean(z, axis=-2, keepdims=True)
    svals, basis = right_singular_vectors(z, backend=backend)
    return basis, svals


def rank_mask(ranks: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(...,) int ranks -> (..., dim) float32 mask of the top-``rank`` slots."""
    idx = jnp.arange(dim)
    return (idx < ranks[..., None]).astype(jnp.float32)


def spectral_grassmann_distance_sq(
    basis_s: jnp.ndarray,
    basis_t: jnp.ndarray,
    spectral_weights: jnp.ndarray,
    mask: jnp.ndarray,
    backend: str = "gram",
) -> jnp.ndarray:
    """Spectrally-weighted squared Grassmannian distance.

    Args:
        basis_s: (..., D, D) student basis (descending directions).
        basis_t: (..., D, D) teacher basis.
        spectral_weights: (..., D) teacher singular values (descending).
        mask: (..., D) top-k rank mask (1 for kept directions).

    Returns:
        (...,) weighted squared distance ``sum(sw * theta^2) / sum(sw)``.
    """
    g = jnp.einsum("...di,...dj->...ij", basis_s, basis_t, precision=HI)
    gm = mask[..., :, None] * g * mask[..., None, :]
    sigma = singular_values(gm, backend=backend)
    theta = jnp.arccos(jnp.minimum(sigma, 1.0 - _F32_EPS))
    sw = spectral_weights * mask
    num = jnp.sum(sw * jnp.square(theta), axis=-1)
    den = jnp.sum(sw, axis=-1)
    return num / jnp.maximum(den, _F32_EPS)
