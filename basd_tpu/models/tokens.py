"""Packed per-layer token collections.

The frozen teacher's per-layer tokens are the largest tensor in a BASD
step: (L, B, N, D) bf16 is ~0.9 GB at bench shapes. The reference
collects them as a Python list of hook outputs and strips the CLS row
per layer (``src/models/teacher.py:202``); a literal port pays three
whole-stack HBM copies per step on TPU:

- the 4-D view of the aliased flat collection buffer is a real copy
  (the (N, D) minor pair is sublane-padded when N % 8 != 0 — traced at
  2.9 ms/step at bench shapes);
- the CLS strip ``stack[:, :, 1:, :]`` is another (2.9 ms);
- and the selector / mixing einsums then re-read the stripped copy.

``PackedTokens`` keeps the collection in its native flat layout
(L, B*N, D) — a zero-copy view of the kernel's aliased output buffer —
plus a tiny (L, B, D) CLS slab collected as a separate scan output.
Consumers that need patch-only statistics subtract the CLS slab's
contribution (exact — see ``losses.selector``) or zero-weight the CLS
row (exact for the attention-weighted Procrustes loss, whose every
per-token term carries the importance weight — see ``losses.combined``).
``to_dense()`` recovers the reference-shaped stripped stack for
consumers outside the hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PackedTokens:
    """Flat per-layer token collection.

    Attributes:
        flat: (L, B*N, D) tokens of all L layers, rows ordered (b, n).
        cls: (L, B, D) per-layer CLS-token rows, or None when the model
            has no CLS token. Redundant with ``flat`` (row b*N of each
            (b, ...) group) but avoids a strided gather to access them.
        batch: B (static).
        num_tokens: N including the CLS row when present (static).
        has_cls: whether row 0 of every (b, ...) group is a CLS token.
    """

    flat: jnp.ndarray
    cls: Optional[jnp.ndarray]
    batch: int = struct.field(pytree_node=False)
    num_tokens: int = struct.field(pytree_node=False)
    has_cls: bool = struct.field(pytree_node=False)

    @property
    def num_patch_tokens(self) -> int:
        return self.num_tokens - 1 if self.has_cls else self.num_tokens

    @property
    def num_layers(self) -> int:
        return self.flat.shape[0]

    @property
    def dim(self) -> int:
        return self.flat.shape[-1]

    def to_dense(self) -> jnp.ndarray:
        """Reference-shaped (L, B, N_patch, D) stack (CLS stripped).

        Materializes the padded 4-D layout — use only off the hot path
        (calibration, tests, non-packed fallbacks).
        """
        l, _, d = self.flat.shape
        x = self.flat.reshape(l, self.batch, self.num_tokens, d)
        return x[:, :, 1:, :] if self.has_cls else x


def pack_dense(
    full: jnp.ndarray, *, has_cls: bool
) -> PackedTokens:
    """Build a PackedTokens from a dense (L, B, N, D) stack INCLUDING
    the CLS row (test/fallback helper — materializes the flat copy)."""
    l, b, n, d = full.shape
    return PackedTokens(
        flat=full.reshape(l, b * n, d),
        cls=full[:, :, 0, :] if has_cls else None,
        batch=b,
        num_tokens=n,
        has_cls=has_cls,
    )
