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

    if nuclear_backend not in ("svd", "eigh"):
        # NS-polar fast path: hand-written VJP (see _ident_core) — same
        # math, but the backward is expressed as a handful of fused
        # einsums instead of autodiff's materialized (.., N, D) broadcast
        # chains, and the residual set shrinks to {inputs, polar factor,
        # first moments} (autodiff saves the centered/weighted f32 panels
        # — ~1.2 GB at bench shapes).
        return _ident_core(student_tokens, teacher_tokens, w)

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
    c = _slice_mean_shift(teacher_tokens)
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
    else:
        nuclear = linalg.nuclear_norm(cross)
    return tr_s + tr_t - 2.0 * nuclear


def _slice_mean_shift(teacher_tokens: jnp.ndarray) -> jnp.ndarray:
    """Stop-grad constant channel shift (batch-slice + token mean)."""
    b_slice = min(teacher_tokens.shape[-3], 64)
    return jax.lax.stop_gradient(
        jnp.mean(
            teacher_tokens[..., :b_slice, :, :].astype(jnp.float32),
            axis=(-3, -2), keepdims=True,
        )
    )


@jax.custom_vjp
def _ident_core(s_in: jnp.ndarray, t_in: jnp.ndarray, w: jnp.ndarray):
    """Identity-form Procrustes loss core with a hand-written VJP.

    Inputs: ``s_in (..., N, D_s)`` / ``t_in (..., N, D_t)`` (any float
    dtype), ``w (..., N)`` NORMALIZED f32 weights. Value matches the
    inline 'gram' path of ``geometric_relational_loss_ident`` bit-for-bit
    (same ops, same order). The backward uses the closed forms (all
    exploiting ``sum_n w_n s_c,n = 0`` and treating the polar factor P as
    the constant nuclear-norm subgradient, exactly like
    ``linalg.nuclear_norm_ns``):

        ds_pre = 2 w (s_c - t_c P^T);  ds_n = ds_pre_n - w_n sum_m ds_pre_m
        dt     = 2 w (t_c - mu_tc - s_c P)
        dw_n   = ||s_c,n||^2 + ||t_c,n||^2 - 2 t_c,n . mu_tc
                 - 2 s_c,n . (t_c P^T)_n + 2 s_n . (P mu_tc)

    — three batched (N, D) x (D, D') contractions and row reductions; no
    materialized outer-product broadcasts (XLA's transpose-jvp of the
    moment einsums builds several (..., N, D) f32 temporaries and
    add_any's them — traced ~4 ms/step at bench shapes).
    """
    val, _ = _ident_core_fwd(s_in, t_in, w)
    return val


def _ident_core_fwd(s_in, t_in, w):
    prec = jax.lax.Precision.HIGH
    s = s_in.astype(jnp.float32)
    mu_s = jnp.einsum("...n,...nd->...d", w, s, precision=prec)
    s_c = s - mu_s[..., None, :]
    sw2 = w[..., None] * s_c
    tr_s = jnp.sum(sw2 * s_c, axis=(-1, -2))

    c = _slice_mean_shift(t_in)
    t_c = t_in.astype(jnp.float32) - c
    rowsq = jnp.einsum("...nd,...nd->...n", t_c, t_c, precision=prec)
    mu_tc = jnp.einsum("...n,...nd->...d", w, t_c, precision=prec)
    tr_t = jnp.einsum("...n,...n->...", w, rowsq) - jnp.sum(
        jnp.square(mu_tc), axis=-1
    )

    cross = jnp.einsum("...ns,...nt->...st", sw2, t_c, precision=prec)
    p = linalg.newton_schulz_polar(cross, schedule="hybrid")
    nuclear = jnp.einsum(
        "...ij,...ij->...", p.astype(jnp.float32), cross.astype(jnp.float32),
        precision=linalg.HI,
    )
    val = tr_s + tr_t - 2.0 * nuclear
    return val, (s_in, t_in, w, c, mu_s, mu_tc, p)


def _ident_core_bwd(res, g):
    s_in, t_in, w, c, mu_s, mu_tc, p = res
    prec = jax.lax.Precision.HIGH
    s = s_in.astype(jnp.float32)
    s_c = s - mu_s[..., None, :]
    t_c = t_in.astype(jnp.float32) - c
    p = p.astype(jnp.float32)

    # t_c @ P^T (N, D_s) and s_c @ P (N, D_t) — the only heavy work
    tp = jnp.einsum("...nt,...st->...ns", t_c, p, precision=prec)
    sp = jnp.einsum("...ns,...st->...nt", s_c, p, precision=prec)

    g2w = (2.0 * g[..., None]) * w  # (..., N)
    ds_pre = g2w[..., None] * (s_c - tp)
    colsum = jnp.sum(ds_pre, axis=-2)  # (..., D_s)
    ds = ds_pre - w[..., None] * colsum[..., None, :]
    dt = g2w[..., None] * (t_c - mu_tc[..., None, :] - sp)

    # dw = ||s_c||^2 + ||t_c||^2 - 2 t_c.mu_tc - 2 s_c.tp + 2 s.pmu,
    # regrouped (s = s_c + mu_s) into two row-dots whose second operands
    # are elementwise expressions — XLA fuses the broadcasts into the
    # multiply-reduce instead of materializing (.., N, D) broadcast
    # panels (the naive grouping traced ~3 ms of broadcast+reduce at
    # B=1024), plus one per-batch scalar term.
    pmu = jnp.einsum("...st,...t->...s", p, mu_tc, precision=prec)
    dw = g[..., None] * (
        jnp.einsum(
            "...ns,...ns->...n",
            s_c, s_c - 2.0 * tp + 2.0 * pmu[..., None, :],
            precision=prec,
        )
        + jnp.einsum(
            "...nt,...nt->...n",
            t_c, t_c - 2.0 * mu_tc[..., None, :],
            precision=prec,
        )
        + 2.0 * jnp.einsum("...s,...s->...", mu_s, pmu, precision=prec)[
            ..., None
        ]
    )
    return ds.astype(s_in.dtype), dt.astype(t_in.dtype), dw.astype(w.dtype)


_ident_core.defvjp(_ident_core_fwd, _ident_core_bwd)
