"""Attention-weighted Procrustes loss.

Reference: ``geometric_relational_loss`` (``src/losses/relational.py:5-50``):
importance weights from teacher attention, parameter-free 1-D resample to
the student token count, weighted centering, ``sqrt(w)`` scaling, then
``mean_B( tr(S^T S) + tr(T^T T) - 2 ||S_w^T T_w||_nuc )`` where the nuclear
norm of the (D_s, D_t) cross-covariance (a batched rectangular SVD in the
reference) handles arbitrary dimension mismatch with zero parameters.

TPU-first notes:

- attention maps are never materialized here: callers pass the already
  *reduced* importance vector per image (the CLS attention row head-mean,
  or the query-mean), because both reductions are linear and commute with
  the selector's layer mixing — see ``basd_tpu.models.vit``;
- the nuclear norm runs through ``basd_tpu.ops.linalg.nuclear_norm``
  (Gram-eigh forward, Newton-Schulz polar backward) instead of batched SVD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from basd_tpu.ops import linalg
from basd_tpu.ops.interp import linear_interp1d
from basd_tpu.ops.linalg import HI


def reduce_attention_importance(
    attn: jnp.ndarray, *, has_cls_token: bool
) -> jnp.ndarray:
    """Collapse a full attention map (B, H, N, N) to per-token importance.

    With a CLS token the CLS query row (keys 1:) mean over heads is used
    (reference: ``src/losses/relational.py:22-24``); otherwise the mean over
    heads and queries (``:27``).
    """
    if has_cls_token:
        return jnp.mean(attn[:, :, 0, 1:], axis=1)
    return jnp.mean(attn, axis=(1, 2))


def geometric_relational_loss(
    student_tokens: jnp.ndarray,
    teacher_tokens: jnp.ndarray,
    importance: jnp.ndarray,
    *,
    nuclear_backend: str = "gram",
) -> jnp.ndarray:
    """Attention-weighted Procrustes loss.

    Args:
        student_tokens: (B, N_s, D_s).
        teacher_tokens: (B, N_s, D_t) — already aligned to the student
            token count.
        importance: (B, N_w) reduced attention importance; linearly
            resampled to N_s if the token counts differ.

    Returns:
        scalar loss (mean over the batch).
    """
    s = student_tokens.astype(jnp.float32)
    t = teacher_tokens.astype(jnp.float32)
    n_s = s.shape[1]

    w = importance.astype(jnp.float32)
    if w.shape[-1] != n_s:
        w = linear_interp1d(w, n_s, axis=-1)
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    # 3-pass f32 emulation (~1e-6 relative) on the loss-value path: the
    # cross-covariance feeds a nuclear norm whose value is first-order
    # insensitive to its perturbations; HIGHEST (6-pass) doubles the
    # cost of the two largest loss einsums for no visible accuracy
    # (unlike the selector's Grams, which feed MP rank thresholds and
    # stay HIGHEST).
    prec = jax.lax.Precision.HIGH
    mu_s = jnp.einsum("bn,bnd->bd", w, s, precision=prec)[:, None, :]
    mu_t = jnp.einsum("bn,bnd->bd", w, t, precision=prec)[:, None, :]
    s_c = s - mu_s
    t_c = t - mu_t

    w_sqrt = jnp.sqrt(w)[..., None]
    s_w = w_sqrt * s_c
    t_w = w_sqrt * t_c

    tr_s = jnp.sum(jnp.square(s_w), axis=(1, 2))
    tr_t = jnp.sum(jnp.square(t_w), axis=(1, 2))
    cross = jnp.einsum("bns,bnt->bst", s_w, t_w, precision=prec)
    if nuclear_backend == "svd":
        nuclear = linalg.nuclear_norm_ref(cross)
    elif nuclear_backend == "eigh":
        nuclear = linalg.nuclear_norm(cross)
    else:
        # TPU fast path ('gram'/'ns'): trace against the Newton-Schulz
        # polar factor — pure batched MXU matmuls, ~2e-5 relative accuracy,
        # measured ~16x faster than batched eigvalsh on v5e.
        nuclear = linalg.nuclear_norm_ns(cross)

    return jnp.mean(tr_s + tr_t - 2.0 * nuclear)


def geometric_relational_loss_ident(
    student_tokens: jnp.ndarray,
    teacher_tokens: jnp.ndarray,
    importance: jnp.ndarray,
    *,
    nuclear_backend: str = "gram",
) -> jnp.ndarray:
    """Identity-form Procrustes loss, batched over leading dims.

    The same mathematical function as ``geometric_relational_loss``
    (reference ``src/losses/relational.py:5-50``) — value- AND
    gradient-identical in exact arithmetic — rewritten through the
    weighted-centering identities so the teacher side is never centered
    or weighted:

        sum_n w_n (s_n - mu_s)(t_n - mu_t)^T = sum_n (w_n (s_n - mu_s)) t_n^T
        sum_n w_n ||t_n - mu_t||^2           = sum_n w_n ||t_n||^2 - ||mu_t||^2

    (both because ``sum_n w_n (s_n - mu_s) = 0`` and ``sum_n w_n = 1``).
    At distillation shapes the teacher panel is the 2-4x larger side —
    the standard form materializes its f32 upcast, centering and
    sqrt(w)-scaling (~1.2 GB/step at bench shapes, traced at ~6 ms);
    here the raw (often bf16) teacher tokens feed the cross dot and one
    fused moment pass directly. Gradients flow by plain autodiff — the
    identity holds pointwise in (s, t, w), so the differential matches.

    Args:
        student_tokens: (..., N, D_s).
        teacher_tokens: (..., N, D_t), token count already aligned.
        importance: (..., N) unnormalized weights.

    Returns:
        (...,)-shaped per-batch loss (caller means over what it wants);
        note the standard form means over the batch itself.
    """
    s = student_tokens.astype(jnp.float32)
    w = importance.astype(jnp.float32)
    if w.shape[-1] != s.shape[-2]:
        w = linear_interp1d(w, s.shape[-2], axis=-1)
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    prec = jax.lax.Precision.HIGH
    mu_s = jnp.einsum("...n,...nd->...d", w, s, precision=prec)
    s_c = s - mu_s[..., None, :]
    sw2 = w[..., None] * s_c  # full w on the student side
    tr_s = jnp.sum(sw2 * s_c, axis=(-1, -2))

    # teacher side: never per-point centered or sqrt(w)-weighted. Both
    # tr_t and cross are exactly invariant to ANY constant channel shift
    # of t (cross because sum_n w_n s_c,n = 0; tr_t because it is a
    # weighted variance), so shift by a cheap stop-grad slice mean: the
    # raw-moment form sum w||t||^2 - ||mu||^2 cancels catastrophically
    # on real ViT residual streams (outlier channels with means >> std
    # — measured ~1e-2 on the bench loss), while the shifted form works
    # at the centered scale. The (t - c) subtract has no materialized
    # consumer of its own — XLA fuses it into the rowsq reduce and the
    # cross dot's operand read.
    b_slice = min(teacher_tokens.shape[-3], 64)
    c = jax.lax.stop_gradient(
        jnp.mean(
            teacher_tokens[..., :b_slice, :, :].astype(jnp.float32),
            axis=(-3, -2), keepdims=True,
        )
    )
    t_c = teacher_tokens.astype(jnp.float32) - c
    rowsq = jnp.einsum(
        "...nd,...nd->...n", t_c, t_c, precision=prec,
    )
    mu_tc = jnp.einsum("...n,...nd->...d", w, t_c, precision=prec)
    tr_t = jnp.einsum("...n,...n->...", w, rowsq) - jnp.sum(
        jnp.square(mu_tc), axis=-1
    )

    cross = jnp.einsum("...ns,...nt->...st", sw2, t_c, precision=prec)
    if nuclear_backend == "svd":
        nuclear = linalg.nuclear_norm_ref(cross)
    elif nuclear_backend == "eigh":
        nuclear = linalg.nuclear_norm(cross)
    else:
        nuclear = linalg.nuclear_norm_ns(cross)
    return tr_s + tr_t - 2.0 * nuclear
