"""Spectrally-adaptive Grassmannian layer selector (the BASD core novelty).

Reference: ``GrassmannianLayerSelector`` (``src/losses/layer_selector.py:
40-152``). State: two frozen random-orthogonal projections ``proj_s
(D_s, D_s)`` / ``proj_t (D_s, D_t)`` and one learnable log-temperature per
extraction point (init ``log(e - 1)`` => ``softplus^-1(1.0)``) — the
"four learnable parameters" of the README. Per step:

1. project every teacher layer's tokens to the shared D_s space and
   estimate its Marchenko-Pastur rank (no grad), clamped to D_s - 1;
2. extract each teacher layer's top-k PCA basis + singular values (no
   grad);
3. per extraction point, extract the student subspace (DIFFERENTIABLE —
   gradients flow into the student tokens through the eigh/svd backward),
   compute spectrally-weighted principal-angle distances to every teacher
   layer, and softmax(-d^2 / tau) into mixing weights;
4. mix all teacher layers' tokens — and attention importance — with those
   weights.

TPU-first redesign relative to the reference:

- everything is batched: one (L,)-batched eigh for ranks, one for teacher
  subspaces, one (P,)-batched student decomposition, one (P, L)-batched
  principal-angle solve — no Python loops over layers inside jit;
- data-dependent ranks become static-shape masks
  (see ``basd_tpu.ops.grassmann``);
- full (L, B, H, N, N) attention stacks are never formed: the selector
  mixes *reduced* per-token importance (B, N), which is exact because the
  downstream attention reduction is linear (see
  ``basd_tpu.ops.procrustes.reduce_attention_importance``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from basd_tpu.ops.grassmann import (
    grassmann_subspace,
    rank_mask,
    spectral_grassmann_distance_sq,
)
from basd_tpu.models.tokens import PackedTokens
from basd_tpu.ops.linalg import orthogonal_matrix

# 3-pass f32 emulation: ~2e-6 relative accuracy, half the cost of the
# 6-pass HIGHEST — used for the projections AND (since round 2) the Gram
# contractions; see the in-line note at the Gram einsums for why the MP
# rank thresholds tolerate it.
_PROJ_PREC = jax.lax.Precision.HIGH
from basd_tpu.ops.mp_rank import marchenko_pastur_rank


@dataclass(frozen=True)
class SelectorConfig:
    num_extraction_points: int
    student_dim: int
    teacher_dim: int
    backend: str = "gram"  # 'gram'/'jacobi' (TPU fast paths), 'svd' (parity)
    # static cap on subspace rank: shrinks the (P, L)-batched principal-
    # angle eigendecompositions from (D_s, D_s) to (max_rank, max_rank).
    # ViT features have intrinsic dims far below D_s (MP ranks ~20-130),
    # so a cap of e.g. D_s/2 rarely binds; None = exact reference
    # semantics (rank <= D_s - 1).
    max_rank: int | None = None


def init_selector(
    key: jax.Array, cfg: SelectorConfig
) -> tuple[dict, dict]:
    """Returns (params, buffers).

    ``params['log_temperatures']``: (P,) learnable.
    ``buffers``: frozen orthogonal projections (never updated; part of the
    checkpoint, replicated across the mesh).
    """
    k_s, k_t = jax.random.split(key)
    params = {
        "log_temperatures": jnp.full(
            (cfg.num_extraction_points,), math.log(math.e - 1.0), jnp.float32
        )
    }
    buffers = {
        "proj_s": orthogonal_matrix(k_s, cfg.student_dim, cfg.student_dim),
        "proj_t": orthogonal_matrix(k_t, cfg.student_dim, cfg.teacher_dim),
    }
    return params, buffers


def temperatures(params: dict) -> jnp.ndarray:
    return jax.nn.softplus(params["log_temperatures"])


def _token_gram(toks: jnp.ndarray) -> jnp.ndarray:
    """(K, B, N, D) -> (K, D, D) f32 Gram in TOKEN space.

    4-D form (contract b,n directly, no (K, B*N, D) reshape): the 4-D
    einsum keeps the dot read layout-free for the teacher's cls-strip
    slice of the aliased collection stack. bf16 x bf16 products are
    exact in the f32 accumulator, so bf16 inputs use DEFAULT (full-rate
    MXU) precision.
    """
    prec = None if toks.dtype == jnp.bfloat16 else _PROJ_PREC
    return jnp.einsum(
        "kbnd,kbne->kde", toks, toks,
        precision=prec, preferred_element_type=jnp.float32,
    )


def _centered_gram(
    toks: jnp.ndarray, proj: jnp.ndarray, m: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(K, D_s, D_s) centered Gram of the projected tokens + (K, D_s)
    projected channel means.

    Formed via the shift identity: for ANY constant c,
    ``P[(T-c)^T(T-c)]P^T - m (P d)(P d)^T`` with ``d = mu - c`` equals
    the centered Gram identically (same value AND gradient). With
    ``c = stop_gradient(mu)`` both terms live at the CENTERED numerical
    scale, which matters because ViT/DINOv2 activations carry outlier
    channels whose means dwarf the centered scale: Gramming raw tokens
    and subtracting ``m mu mu^T`` cancels in f32 (the Gram entries are
    stored at O(m mu^2) magnitude, so eps32*m*mu_max^2 of absolute
    noise survives — measured ~0.6% of centered scale and an MP-rank
    flip at mu/sigma ~ 300; locked by
    tests/test_selector.py::test_centered_gram_outlier_channel_means).
    Costs one materialization of the shifted stack at the input dtype
    (bf16 rounding of the shifted values enters at sigma-scale, below
    the bf16 input noise already present).
    """
    from basd_tpu.ops.linalg import HI

    # NOTE: a single-pass fused Pallas kernel for this op (centered Gram
    # + mean over the (K, B, N, D) stack in one VMEM pass) was built and
    # hardware-validated for parity in round 4, but its Mosaic schedule
    # ran 4-18x SLOWER than this three-pass XLA lowering (~8.8 ms/step
    # at bench teacher shapes; broadcast-subtract relayout pathology)
    # across every probed variant, so it was deleted rather than kept as
    # opt-in dead code.
    mu_dt = jnp.float32 if toks.dtype == jnp.bfloat16 else toks.dtype
    mu_tok = jnp.mean(toks, axis=(1, 2), dtype=mu_dt)  # (K, D)
    shift = jax.lax.stop_gradient(mu_tok)
    shifted = (toks - shift[:, None, None, :]).astype(toks.dtype)
    sand = jnp.einsum(
        "si,kij,tj->kst", proj, _token_gram(shifted), proj, precision=HI,
    )
    mu_p = mu_tok @ proj.T  # (K, D_s)
    d = mu_p - shift @ proj.T
    return sand - m * d[:, :, None] * d[:, None, :], mu_p


def _centered_gram_flat(
    flat: jnp.ndarray,
    cls: jnp.ndarray | None,
    proj: jnp.ndarray,
    m: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``_centered_gram`` over the PATCH rows of a flat (K, B*N, D)
    packed collection (models.tokens.PackedTokens), CLS rows excluded
    exactly via the tiny (K, B, D) CLS slab:

        sum_patch t t^T = sum_all t t^T - sum_cls t t^T

    (both sides shifted by the same stop-grad channel mean, so the
    identity holds term by term at the centered numerical scale). Never
    materializes the 4-D stack or its CLS strip — the two whole-stack
    copies the dense path pays on TPU. ``m`` is the PATCH row count
    (B * (N - 1) with a CLS token). No-grad intended (the teacher side);
    the student side keeps the dense ``_centered_gram``.
    """
    from basd_tpu.ops.linalg import HI

    mu_dt = jnp.float32 if flat.dtype == jnp.bfloat16 else flat.dtype
    # Known headroom (r5 trace): this sum re-reads the whole packed
    # stack (~2.5 ms at B=1024, HLO convert_reduce_fusion) just to get
    # per-layer channel means. The collect kernel
    # (fused_block_mlp.fused_ln_mlp_collect) could emit each slab's
    # (1, D) column sum as a third accumulated output (same revisited-
    # block pattern as its bwd weight grads) and pass it down, making
    # this free — not landed in r5 (out of validated-hardware time).
    s_all = jnp.sum(flat, axis=1, dtype=mu_dt)  # (K, D)
    if cls is not None:
        s_all = s_all - jnp.sum(cls, axis=1, dtype=mu_dt)
    mu_tok = s_all / m  # (K, D) patch-row mean
    shift = jax.lax.stop_gradient(mu_tok)
    shifted = (flat - shift[:, None, :]).astype(flat.dtype)
    prec = None if flat.dtype == jnp.bfloat16 else _PROJ_PREC
    g = jnp.einsum(
        "kmd,kme->kde", shifted, shifted,
        precision=prec, preferred_element_type=jnp.float32,
    )
    if cls is not None:
        sc = (cls - shift[:, None, :]).astype(flat.dtype)
        g = g - jnp.einsum(
            "kbd,kbe->kde", sc, sc,
            precision=prec, preferred_element_type=jnp.float32,
        )
    sand = jnp.einsum("si,kij,tj->kst", proj, g, proj, precision=HI)
    mu_p = mu_tok @ proj.T
    d = mu_p - shift @ proj.T
    return sand - m * d[:, :, None] * d[:, None, :], mu_p


def packed_gram_eligible(tokens, cfg: SelectorConfig) -> bool:
    """Whether a teacher collection can ride the fused packed Gram fast
    path: a ``PackedTokens`` under a gram/jacobi backend with enough rows
    (M >= D_s) for the Gram-eigh subspace extraction to be full-rank-safe.

    This is the ONE eligibility predicate — ``select_and_mix`` densifies
    ineligible packed inputs with it, and ``losses.combined`` gates its
    packed consumption on the same call, so the two stages cannot drift
    (ADVICE r4 medium: the predicate used to be duplicated and hand-synced).
    """
    return (
        isinstance(tokens, PackedTokens)
        and cfg.backend in ("gram", "jacobi")
        and tokens.batch * tokens.num_patch_tokens >= cfg.student_dim
    )


def select_and_mix(
    params: dict,
    buffers: dict,
    student_tokens: jnp.ndarray,
    teacher_tokens: jnp.ndarray,
    teacher_importance: jnp.ndarray,
    cfg: SelectorConfig,
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Mix all teacher layers into one soft target per extraction point.

    Args:
        student_tokens: (P, B, N_s, D_s) tokens at the P extraction points.
        teacher_tokens: (L, B, N_t, D_t) per-teacher-layer tokens (frozen,
            CLS-stripped), or a ``models.tokens.PackedTokens`` flat
            collection WITH its CLS rows — the TPU fast path, consumed
            without the whole-stack relayout/strip copies (Grams via
            ``_centered_gram_flat``; exact equivalence locked by
            tests/test_packed_tokens.py). Packed inputs off the
            gram/jacobi fast path are densified internally.
        teacher_importance: (L, B, N_patch) reduced attention importance.

    Returns:
        mixed_tokens: (P, B, N_t, D_t); for packed inputs N_t INCLUDES
            the mixed CLS row at n=0 (callers zero-weight it — see
            losses.combined).
        mixed_importance: (P, B, N_patch)
        aux: dict with 'ranks' (L,), 'mix_weights' (P, L),
             'distances_sq' (P, L), 'temperatures' (P,).
    """
    proj_s = buffers["proj_s"]
    proj_t = buffers["proj_t"]
    d_s = cfg.student_dim

    packed = packed_gram_eligible(teacher_tokens, cfg)
    if isinstance(teacher_tokens, PackedTokens) and not packed:
        # packed collections only ride the fused Gram fast path;
        # the parity/tiny paths get the reference-shaped stack
        teacher_tokens = teacher_tokens.to_dense()
    if packed:
        m_t = teacher_tokens.batch * teacher_tokens.num_patch_tokens
        L = teacher_tokens.num_layers
        t_flat_all = jax.lax.stop_gradient(teacher_tokens.flat)
        t_cls = (
            jax.lax.stop_gradient(teacher_tokens.cls)
            if teacher_tokens.has_cls
            else None
        )
        tok_dtype = t_flat_all.dtype
    else:
        L = teacher_tokens.shape[0]
        t_tokens = jax.lax.stop_gradient(teacher_tokens)
        m_t = t_tokens.shape[1] * t_tokens.shape[2]
        tok_dtype = teacher_tokens.dtype
    P = student_tokens.shape[0]
    t_imp = jax.lax.stop_gradient(teacher_importance)

    r_cap = min(cfg.max_rank or d_s, d_s)

    if cfg.backend in ("gram", "jacobi") and m_t >= d_s:
        # fused TPU path: ONE batched eigendecomposition covers the
        # teacher subspaces (centered, no-grad) and the student bases
        # (centered, differentiable). The MP-rank covariance spectra are
        # recovered from the teacher Gram spectra by a rank-one secular
        # update (Z^T Z = Gram_c + M mu mu^T) — elementwise bisection, no
        # extra eigh batch (see ops.linalg.rank_one_update_eigvals).
        #
        # Round-3 restructure: the (L, M, D_s) / (P, M, D_s) projected
        # panels are never materialized. Z^T Z = P (T^T T) P^T, so the
        # Grams are computed in TOKEN space from the bf16 activations
        # directly and sandwich-projected by the frozen orthogonal maps.
        # bf16 x bf16 products are EXACT in f32 (8+8 mantissa bits < 24),
        # so the DEFAULT-precision MXU einsum with f32 accumulation is
        # exact-per-product and full-rate. Frees ~1.2 GB of per-step HBM
        # at B=512 (~2.4 GB at B=1024, the difference that makes batch
        # 1024 fit).
        #
        # Numerics: ViT/DINOv2 activations carry outlier channels whose
        # means dwarf the centered scale; Gramming RAW tokens and then
        # subtracting M*mu*mu^T cancels in f32 (the gram entries are
        # stored at O(M*mu^2) magnitude, so eps32*M*mu_max^2 of absolute
        # noise survives the subtraction — measured ~0.6% of centered
        # scale and an MP-rank flip at mu/sigma ~ 300). So the Gram is
        # formed from tokens SHIFTED by a stop-gradient channel mean:
        # for ANY constant c, (T-c)^T(T-c) - M(mu-c)(mu-c)^T is
        # identically the centered Gram (same value AND gradient), and
        # with c ~= mu both terms live at the centered scale — no
        # cancellation. Costs one bf16 materialization of the shifted
        # stack (the rounding enters at sigma-scale, below the bf16
        # input noise already present).
        from basd_tpu.ops.linalg import (
            HI,
            _safe_sqrt,
            rank_one_update_eigvals,
            safe_eigh,
        )

        if packed:
            gram_tc, mu_t = _centered_gram_flat(
                t_flat_all, t_cls, proj_t, m_t
            )
        else:
            gram_tc, mu_t = _centered_gram(t_tokens, proj_t, m_t)

        m_s = student_tokens.shape[1] * student_tokens.shape[2]
        gram_sc, _ = _centered_gram(student_tokens, proj_s, m_s)

        stacked = jnp.concatenate(
            [jax.lax.stop_gradient(gram_tc), gram_sc], axis=0
        )
        # the (L+P, D_s, D_s) stacked eigh always uses XLA QDWH: at 192^2
        # the Jacobi kernel's 2(n-1)*sweeps sequential rounds cost more
        # than the custom call (measured 31 vs 17 ms); the 'jacobi'
        # backend wins only on the (P*L, r_cap, r_cap) principal-angle
        # batch below (clustered [0,1] spectra, 12 vs 15 ms in-step).
        w_all, v_all = safe_eigh(stacked, "xla")  # ascending

        # MP rank from the covariance spectra (reference: torch-style
        # median = lower middle element; q = D / M)
        w_t_asc = jax.lax.stop_gradient(w_all[:L])
        c_t = jnp.einsum(
            "lds,ld->ls", jax.lax.stop_gradient(v_all[:L]), mu_t,
            precision=HI,
        )  # V^T mu, per eigencolumn
        w_cov = rank_one_update_eigvals(w_t_asc, c_t, float(m_t)) / m_t
        sigma2 = w_cov[:, (d_s - 1) // 2]
        lam_plus = sigma2 * (1.0 + (d_s / m_t) ** 0.5) ** 2
        raw_ranks = jnp.sum(w_cov > lam_plus[:, None], axis=-1).astype(jnp.int32)
        # reference semantics clamp to D_s - 1 (layer_selector.py:73); any
        # FURTHER clamp by the static r_cap changes the computed loss —
        # counted in aux['rank_cap_hits'] so training can surface it.
        ref_ranks = jnp.minimum(raw_ranks, d_s - 1)
        ranks = jnp.minimum(ref_ranks, r_cap)

        w_t = w_all[:L, ::-1]
        basis_t = v_all[:L, :, ::-1][:, :, :r_cap]
        svals_t = _safe_sqrt(w_t)[:, :r_cap]
        basis_s = v_all[L:, :, ::-1][:, :, :r_cap]
    else:
        # parity path ('svd', or tiny M < D_s): materialize the projected
        # panels exactly as the reference does (layer_selector.py:51-56)
        t_flat = t_tokens.reshape(L, -1, t_tokens.shape[-1])
        s_flat = student_tokens.reshape(P, -1, student_tokens.shape[-1])
        z_t = jnp.einsum(
            "lmd,sd->lms", t_flat.astype(jnp.float32), proj_t,
            precision=_PROJ_PREC,
        )
        z_s = jnp.einsum(
            "pmd,sd->pms", s_flat.astype(jnp.float32), proj_s,
            precision=_PROJ_PREC,
        )
        rank_impl = "jacobi" if cfg.backend == "jacobi" else "xla"
        ref_ranks = jnp.minimum(
            marchenko_pastur_rank(z_t, impl=rank_impl), d_s - 1
        )  # (L,) reference semantics (layer_selector.py:73)
        ranks = jnp.minimum(ref_ranks, r_cap)
        basis_t, svals_t = grassmann_subspace(z_t, backend=cfg.backend)
        basis_t = jax.lax.stop_gradient(basis_t)[:, :, :r_cap]
        svals_t = jax.lax.stop_gradient(svals_t)[:, :r_cap]
        basis_s, _ = grassmann_subspace(z_s, backend=cfg.backend)
        basis_s = basis_s[:, :, :r_cap]

    masks = rank_mask(ranks, r_cap)  # (L, r_cap)

    # ---- principal angles, batched over (P, L) --------------------------
    d_sq = spectral_grassmann_distance_sq(
        basis_s[:, None],  # (P, 1, D, R)
        basis_t[None, :],  # (1, L, D, R)
        svals_t[None, :],
        masks[None, :],
        backend=cfg.backend,
    )  # (P, L)

    tau = temperatures(params)  # (P,)
    weights = jax.nn.softmax(-d_sq / tau[:, None], axis=-1)  # (P, L)

    # mirror the reference's cast of weights to the token dtype
    # (src/losses/layer_selector.py:110) before mixing.
    w_tok = weights.astype(tok_dtype)
    if packed:
        # mix the flat stack directly; the (P, B, N, D) view of the
        # mixed panel is the ONLY padded-layout materialization left
        # (P = 4 extraction points vs the L = 12 layer stack the dense
        # path reshapes + strips). mix_stack is the relayout-free fused
        # kernel: the plain einsum made XLA transpose the whole ~930 MB
        # stack to an (M, L, D) operand first (traced 3.4 ms copy +
        # 2.2 ms dot at bench shapes; the kernel is one ~1.6 ms
        # bandwidth pass).
        from basd_tpu.ops.pallas.mix_stack import mix_stack

        mixed_tokens = mix_stack(w_tok, t_flat_all).reshape(
            P, teacher_tokens.batch, teacher_tokens.num_tokens, -1
        )
    else:
        mixed_tokens = jnp.einsum("pl,lbnd->pbnd", w_tok, t_tokens)
    mixed_importance = jnp.einsum(
        "pl,lbn->pbn", weights.astype(teacher_importance.dtype), t_imp
    )

    aux = {
        "ranks": ranks,
        # layers whose reference-semantics rank the static cap truncated
        # this step: nonzero means the loss is computed on a smaller
        # subspace than the reference would use (silent-semantics guard —
        # the trainer warns / optionally errors on it).
        "rank_cap_hits": jnp.sum(ref_ranks > ranks).astype(jnp.int32),
        "mix_weights": weights,
        "distances_sq": d_sq,
        "temperatures": tau,
    }
    return mixed_tokens, mixed_importance, aux
