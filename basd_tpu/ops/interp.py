"""Parameter-free 1-D linear interpolation along the token axis.

Matches ``torch.nn.functional.interpolate(mode="linear",
align_corners=False)`` exactly (half-pixel centers, edge clamp), which the
reference uses in two places:

- aligning mixed-teacher token counts to the student grid
  (reference: ``src/losses/combined.py:9-14``);
- resampling attention importance weights (reference:
  ``src/losses/relational.py:29-33``).

TPU-first design: instead of gathers, interpolation is expressed as a
matmul with a precomputed static ``(target, source)`` weight matrix — the
shapes are static under jit, the matrix has two nonzeros per row, and the
contraction runs on the MXU fused with surrounding ops.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _interp_matrix_np(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix W with out = W @ inp, half-pixel linear weights."""
    if src == dst:
        return np.eye(src, dtype=np.float32)
    scale = src / dst
    # half-pixel source coordinate of each output center, clamped to >= 0
    # (PyTorch clamps the real-valued coordinate at 0; the upper side is
    # handled by clamping the right index below).
    x = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    x = np.maximum(x, 0.0)
    i0 = np.floor(x).astype(np.int64)
    i0 = np.minimum(i0, src - 1)
    i1 = np.minimum(i0 + 1, src - 1)
    frac = (x - i0).astype(np.float64)
    w = np.zeros((dst, src), dtype=np.float64)
    rows = np.arange(dst)
    np.add.at(w, (rows, i0), 1.0 - frac)
    np.add.at(w, (rows, i1), frac)
    return w.astype(np.float32)


def interp_matrix(src: int, dst: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(src, dst), dtype=dtype)


def linear_interp1d(x: jnp.ndarray, target_len: int, axis: int = -1) -> jnp.ndarray:
    """Linearly resample ``x`` along ``axis`` to ``target_len``."""
    axis = axis % x.ndim
    src = x.shape[axis]
    if src == target_len:
        return x
    w = interp_matrix(src, target_len, dtype=x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("...s,ts->...t", moved, w)
    return jnp.moveaxis(out, -1, axis)


def align_token_count(tokens: jnp.ndarray, target_n: int) -> jnp.ndarray:
    """Resample (B, N, D) tokens to (B, target_n, D) along the token axis.

    Equivalent to the reference's ``_align_token_count``
    (``src/losses/combined.py:9-14``).
    """
    return linear_interp1d(tokens, target_n, axis=1)
