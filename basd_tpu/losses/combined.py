"""Combined BASD loss: CE + mean per-extraction-point Procrustes, UW-SO
balanced.

Reference: ``BASDLoss`` (``src/losses/combined.py:17-85``): evenly-spaced
extraction points over the student depth, selector mixing, token-count
alignment by 1-D interpolation, attention-weighted Procrustes per point
(averaged), and UW-SO inverse-loss weighting of ``[CE, geo]``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from basd_tpu.losses.selector import (
    SelectorConfig,
    init_selector,
    packed_gram_eligible,
    select_and_mix,
)
from basd_tpu.models.tokens import PackedTokens
from basd_tpu.ops.interp import align_token_count, linear_interp1d
from basd_tpu.ops.losses import cross_entropy, uwso_combine, uwso_weights
from basd_tpu.ops.procrustes import (
    geometric_relational_loss,
    geometric_relational_loss_ident,
)


def extraction_layers(student_depth: int, num_points: int) -> list[int]:
    """Evenly-spaced extraction indices (reference:
    ``src/losses/combined.py:34-40``; uses Python banker's rounding)."""
    if num_points == 1:
        return [student_depth - 1]
    return [
        round(i * (student_depth - 1) / (num_points - 1)) for i in range(num_points)
    ]


@dataclass(frozen=True)
class BASDLossConfig:
    student_dim: int
    teacher_dim: int
    student_depth: int
    num_student_tokens: int
    num_extraction_points: int
    label_smoothing: float
    teacher_has_cls_token: bool  # kept for API parity; reduction happens
    # upstream in the teacher forward (see ops.procrustes)
    backend: str = "gram"
    max_rank: int | None = None
    # relational-loss formulation: 'ident' rewrites the attention-weighted
    # Procrustes loss through the weighted-centering identities so the
    # (2-4x larger) teacher panel is consumed raw — value- and gradient-
    # identical to 'composed' in exact arithmetic (tests/
    # test_procrustes_ident.py), ~6 ms less HBM traffic per bench step.
    # 'composed' keeps the reference-shaped centering/sqrt(w) composition;
    # the 'svd' backend always uses it (full reference-parity path).
    # Config key: basd.relational_impl. Was the BASD_RELATIONAL_IDENT env
    # var before round 5 (ADVICE r4: env vars must not gate loss semantics).
    relational_impl: str = "ident"

    @property
    def token_layers(self) -> list[int]:
        return extraction_layers(self.student_depth, self.num_extraction_points)

    @property
    def selector_config(self) -> SelectorConfig:
        return SelectorConfig(
            num_extraction_points=self.num_extraction_points,
            student_dim=self.student_dim,
            teacher_dim=self.teacher_dim,
            backend=self.backend,
            max_rank=self.max_rank,
        )


def init_basd_loss(key: jax.Array, cfg: BASDLossConfig) -> tuple[dict, dict]:
    """Initialize (params, buffers) of the loss (the selector state)."""
    return init_selector(key, cfg.selector_config)


def basd_loss(
    params: dict,
    buffers: dict,
    student_logits: jnp.ndarray,
    targets: jnp.ndarray,
    student_intermediates: jnp.ndarray,
    teacher_tokens: jnp.ndarray,
    teacher_importance: jnp.ndarray,
    cfg: BASDLossConfig,
) -> tuple[jnp.ndarray, dict]:
    """Full BASD objective.

    Args:
        student_intermediates: (P, B, N_s, D_s) — tokens at the extraction
            points (CLS already stripped), ordered as ``cfg.token_layers``.
        teacher_tokens: (L, B, N_t, D_t) frozen teacher layer tokens.
        teacher_importance: (L, B, N_t) reduced attention importance.
        targets: (B,) int labels or (B, C) soft (mixed) targets.

    Returns:
        (loss, aux) where aux holds ce/geo components, UW-SO weights and
        selector diagnostics.
    """
    ce = cross_entropy(student_logits, targets, cfg.label_smoothing)

    if isinstance(teacher_tokens, PackedTokens):
        # the packed (flat, CLS-kept) collection rides the hot path only
        # when the loss can consume it without re-layout: the fused Gram
        # selector (shared predicate — the SAME call select_and_mix gates
        # on, so the stages can't drift) plus the identity-form relational
        # loss. Mismatched token counts stay packed: the CLS strip + 1-D
        # interpolation to the student grid is one small matmul on the
        # P-point mixed panel (see below), not a whole-L-stack re-layout.
        packed_ok = (
            packed_gram_eligible(teacher_tokens, cfg.selector_config)
            and cfg.relational_impl == "ident"
        )
        if not packed_ok:
            teacher_tokens = teacher_tokens.to_dense()
    packed = isinstance(teacher_tokens, PackedTokens)

    mixed_tokens, mixed_importance, sel_aux = select_and_mix(
        params,
        buffers,
        student_intermediates,
        teacher_tokens,
        teacher_importance,
        cfg.selector_config,
    )

    if packed:
        if teacher_tokens.num_patch_tokens == cfg.num_student_tokens:
            # mixed_tokens (P, B, N, D) still carries the mixed CLS row at
            # n = 0. Give it ZERO Procrustes weight instead of stripping:
            # every per-token term of the identity-form loss is multiplied
            # by w_n (ops/procrustes.py:geometric_relational_loss_ident),
            # so a zero-weight row contributes nothing — exactly the
            # stripped loss, minus two whole-stack copies. The student
            # panel gets a dead zero row to keep token indices aligned.
            t_pan = mixed_tokens
            if teacher_tokens.has_cls:
                s_pan = jnp.concatenate(
                    [
                        jnp.zeros_like(student_intermediates[:, :, :1]),
                        student_intermediates,
                    ],
                    axis=2,
                )
                w_pan = jnp.concatenate(
                    [jnp.zeros_like(mixed_importance[..., :1]), mixed_importance],
                    axis=-1,
                )
            else:
                s_pan, w_pan = student_intermediates, mixed_importance
        else:
            # mismatched token counts: strip the mixed CLS row (a slice
            # XLA fuses into the interp matmul's operand read) and
            # resample the small P-point mixed panel to the student grid —
            # the same F.interpolate-parity matmul the dense path applies
            # (reference: src/losses/combined.py:9-14). Importance is
            # resampled inside the ident loss (relational.py:29-33). The
            # whole L-layer stack still never takes a dense re-layout.
            patches = (
                mixed_tokens[:, :, 1:]
                if teacher_tokens.has_cls
                else mixed_tokens
            )
            t_pan = linear_interp1d(patches, cfg.num_student_tokens, axis=2)
            s_pan, w_pan = student_intermediates, mixed_importance
        geo_per_point = jnp.mean(
            geometric_relational_loss_ident(
                s_pan, t_pan, w_pan, nuclear_backend=cfg.backend
            ),
            axis=-1,
        )
        geo = jnp.mean(geo_per_point)

        vals = jnp.stack([ce, geo])
        loss = uwso_combine(vals)
        aux = {
            "ce_loss": ce,
            "geo_loss": geo,
            "geo_per_point": geo_per_point,
            "uwso_weights": uwso_weights(vals),
            **sel_aux,
        }
        return loss, aux

    # align mixed-teacher token counts to the student grid
    aligned = align_token_count(
        mixed_tokens.reshape((-1,) + mixed_tokens.shape[2:]),
        cfg.num_student_tokens,
    ).reshape(mixed_tokens.shape[:2] + (cfg.num_student_tokens, -1))

    if cfg.backend in ("gram", "jacobi") and cfg.relational_impl == "ident":
        # identity-form relational loss: never centers/weights the (2x
        # larger) mixed-teacher panel — same function, ~6 ms less HBM
        # traffic per step at bench shapes (ops/procrustes.py). A fully
        # fused Pallas formulation was built and hardware-validated in
        # round 4 but LOST to XLA (61.8 vs 46.5 ms fwd chain — Mosaic
        # scheduling; see PARITY.md) and was deleted. 'svd' keeps the
        # reference-shaped composition (centered/sqrt(w) panels).
        geo_per_point = jnp.mean(
            geometric_relational_loss_ident(
                student_intermediates, aligned, mixed_importance,
                nuclear_backend=cfg.backend,
            ),
            axis=-1,
        )
    else:
        geo_per_point = jax.vmap(
            lambda s, t, w: geometric_relational_loss(
                s, t, w, nuclear_backend=cfg.backend
            )
        )(student_intermediates, aligned, mixed_importance)
    geo = jnp.mean(geo_per_point)

    vals = jnp.stack([ce, geo])
    loss = uwso_combine(vals)

    aux = {
        "ce_loss": ce,
        "geo_loss": geo,
        "geo_per_point": geo_per_point,
        "uwso_weights": uwso_weights(vals),
        **sel_aux,
    }
    return loss, aux
