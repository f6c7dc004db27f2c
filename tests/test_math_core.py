"""Float-tolerance parity tests: JAX math core vs torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from basd_tpu.ops import (
    cross_entropy,
    geometric_relational_loss,
    grassmann_subspace,
    linear_interp1d,
    marchenko_pastur_rank,
    newton_schulz_polar,
    nuclear_norm,
    orthogonal_matrix,
    rank_mask,
    reduce_attention_importance,
    spectral_grassmann_distance_sq,
    uwso_combine,
)

from .oracles import (
    grassmann_d2_oracle,
    interp1d_oracle,
    mp_rank_oracle,
    procrustes_oracle,
    smoothed_ce_oracle,
    subspace_oracle,
    uwso_oracle,
)

RNG = np.random.default_rng(0)


def _lowrank(m, d, r, noise=0.01, rng=RNG):
    a = rng.standard_normal((m, r))
    b = rng.standard_normal((r, d))
    return (a @ b + noise * rng.standard_normal((m, d))).astype(np.float32)


# ---------------------------------------------------------------- MP rank


@pytest.mark.parametrize("m,d,r", [(512, 64, 8), (1024, 96, 24), (48, 96, 5)])
def test_mp_rank_matches_oracle(m, d, r):
    x = _lowrank(m, d, r, noise=0.05)
    ours = int(marchenko_pastur_rank(jnp.asarray(x)))
    assert ours == mp_rank_oracle(x)


def test_mp_rank_batched():
    xs = np.stack([_lowrank(256, 48, k, noise=0.05) for k in (3, 9, 17)])
    ours = np.asarray(marchenko_pastur_rank(jnp.asarray(xs)))
    ref = [mp_rank_oracle(x) for x in xs]
    assert ours.tolist() == ref


def test_mp_rank_is_jittable():
    x = _lowrank(256, 48, 7)
    jit_rank = jax.jit(marchenko_pastur_rank)
    assert int(jit_rank(jnp.asarray(x))) == mp_rank_oracle(x)


# ------------------------------------------------------------- subspaces


@pytest.mark.parametrize("backend", ["gram", "svd"])
def test_grassmann_subspace_matches_svd(backend):
    z = _lowrank(400, 64, 12, noise=0.1)
    basis, svals = grassmann_subspace(jnp.asarray(z), backend=backend)
    basis_ref, svals_ref = subspace_oracle(z, 64)
    # dominant (above-rank) singular values: tight; noise tail: Gram
    # squaring costs ~sqrt(eps) relative accuracy there, and those
    # directions carry near-zero spectral weight downstream.
    np.testing.assert_allclose(
        np.asarray(svals)[:12], svals_ref[:12], rtol=2e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(svals)[12:], svals_ref[12:], rtol=3e-2, atol=1e-2
    )
    # basis columns match up to sign for well-separated singular values
    k = 12
    dots = np.abs(np.sum(np.asarray(basis)[:, :k] * basis_ref[:, :k], axis=0))
    np.testing.assert_allclose(dots, np.ones(k), atol=5e-3)


# ------------------------------------------------ principal-angle distance


@pytest.mark.parametrize("backend", ["gram", "svd"])
def test_masked_distance_equals_dynamic_slice_oracle(backend):
    d_s = 48
    z_s = _lowrank(500, d_s, 10, noise=0.2)
    z_t = _lowrank(500, d_s, 20, noise=0.2)
    basis_s, _ = grassmann_subspace(jnp.asarray(z_s), backend="svd")
    basis_t, svals_t = grassmann_subspace(jnp.asarray(z_t), backend="svd")

    for k in (1, 5, 17, 47):
        mask = rank_mask(jnp.asarray(k), d_s)
        ours = float(
            spectral_grassmann_distance_sq(
                basis_s, basis_t, svals_t, mask, backend=backend
            )
        )
        ref = grassmann_d2_oracle(
            np.asarray(basis_s), np.asarray(basis_t), np.asarray(svals_t), k
        )
        # gram backend pays ~sqrt(eps) near sigma->1 (acos amplification);
        # svd backend should track the oracle tightly.
        rtol = 5e-4 if backend == "svd" else 3e-3
        np.testing.assert_allclose(ours, ref, rtol=rtol, atol=5e-5)


def test_distance_gradient_flows_to_student_basis():
    d_s = 32
    z_t = _lowrank(300, d_s, 8)
    basis_t, svals_t = grassmann_subspace(jnp.asarray(z_t))
    mask = rank_mask(jnp.asarray(8), d_s)

    def f(z_s):
        basis_s, _ = grassmann_subspace(z_s)
        return spectral_grassmann_distance_sq(basis_s, basis_t, svals_t, mask)

    g = jax.grad(f)(jnp.asarray(_lowrank(300, d_s, 6)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


# ----------------------------------------------------------- interpolation


@pytest.mark.parametrize("src,dst", [(256, 196), (196, 256), (64, 64), (7, 13), (13, 7), (5, 4)])
def test_linear_interp_matches_torch(src, dst):
    x = RNG.standard_normal((3, src)).astype(np.float32)
    ours = np.asarray(linear_interp1d(jnp.asarray(x), dst, axis=-1))
    ref = interp1d_oracle(x, dst)
    # matmul-form interp vs torch gather-lerp: ~1e-5 f32 noise
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_interp_token_axis():
    x = RNG.standard_normal((2, 50, 16)).astype(np.float32)
    ours = np.asarray(linear_interp1d(jnp.asarray(x), 30, axis=1))
    ref = np.transpose(
        interp1d_oracle(np.transpose(x, (0, 2, 1)).reshape(-1, 50), 30).reshape(
            2, 16, 30
        ),
        (0, 2, 1),
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


# ------------------------------------------------------------ nuclear norm


def test_nuclear_norm_forward():
    m = RNG.standard_normal((4, 24, 48)).astype(np.float32)
    ours = np.asarray(nuclear_norm(jnp.asarray(m)))
    ref = np.linalg.svd(m, compute_uv=False).sum(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_newton_schulz_polar_is_orthogonal():
    m = np.random.default_rng(42).standard_normal((24, 48)).astype(np.float32)
    p = np.asarray(newton_schulz_polar(jnp.asarray(m)))
    # bf16 inner iteration: ~1e-2 orthogonality
    np.testing.assert_allclose(p @ p.T, np.eye(24), atol=3e-2)
    p32 = np.asarray(newton_schulz_polar(jnp.asarray(m), inner_dtype=jnp.float32))
    np.testing.assert_allclose(p32 @ p32.T, np.eye(24), atol=5e-3)


def test_nuclear_norm_gradient_is_polar():
    m = np.random.default_rng(43).standard_normal((16, 20)).astype(np.float32)
    g = np.asarray(jax.grad(lambda x: jnp.sum(nuclear_norm(x)))(jnp.asarray(m)))
    u, _, vt = np.linalg.svd(m, full_matrices=False)
    # bf16 NS polar: ~1-2e-2 per-element gradient accuracy
    np.testing.assert_allclose(g, u @ vt, atol=3e-2)


# --------------------------------------------------------------- procrustes


@pytest.mark.parametrize("has_cls", [True, False])
@pytest.mark.parametrize("backend", ["gram", "svd"])
def test_procrustes_matches_oracle(has_cls, backend):
    b, h, n_s, n_t, d_s, d_t = 3, 4, 16, 25, 24, 40
    s = RNG.standard_normal((b, n_s, d_s)).astype(np.float32)
    t = RNG.standard_normal((b, n_s, d_t)).astype(np.float32)
    n_attn = n_t + 1 if has_cls else n_t
    logits = RNG.standard_normal((b, h, n_attn, n_attn)).astype(np.float32)
    attn = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    imp = reduce_attention_importance(jnp.asarray(attn), has_cls_token=has_cls)
    ours = float(
        geometric_relational_loss(
            jnp.asarray(s), jnp.asarray(t), imp, nuclear_backend=backend
        )
    )
    ref = procrustes_oracle(s, t, attn, has_cls)
    # gram backend: sqrt-of-eigenvalue tail accuracy costs ~1e-3 relative
    rtol = 2e-4 if backend == "svd" else 2e-3
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=2e-4)


def test_procrustes_zero_for_identical():
    # local RNG: the module-shared RNG made this order-dependent (the
    # bound is relative to the draw's energy, which varies per stream)
    rng = np.random.default_rng(99)
    b, n, d = 2, 12, 16
    s = rng.standard_normal((b, n, d)).astype(np.float32)
    imp = np.full((b, n), 1.0 / n, np.float32)
    val = float(
        geometric_relational_loss(jnp.asarray(s), jnp.asarray(s), jnp.asarray(imp))
    )
    # loss = 2*(tr(S_w^T S_w) - ||S_w^T S_w||_*) = 0 exactly; the bf16
    # Newton-Schulz nuclear norm leaves ~1e-3-relative residual. The loss
    # scales with the importance-WEIGHTED CENTERED trace (~d), not the raw
    # token energy (~n*d), so bound by that (ADVICE r2, low).
    sc = s - s.mean(axis=1, keepdims=True)  # uniform importance -> plain mean
    tr_w = float(np.mean(np.sum(sc * sc, axis=(1, 2)) / n))
    assert abs(val) < 3e-3 * 2.0 * tr_w


def test_procrustes_gradients_finite():
    b, n, d_s, d_t = 2, 10, 8, 12
    s = RNG.standard_normal((b, n, d_s)).astype(np.float32)
    t = RNG.standard_normal((b, n, d_t)).astype(np.float32)
    imp = np.abs(RNG.standard_normal((b, n))).astype(np.float32) + 0.1
    g = jax.grad(
        lambda x: geometric_relational_loss(x, jnp.asarray(t), jnp.asarray(imp))
    )(jnp.asarray(s))
    assert np.isfinite(np.asarray(g)).all()


# ------------------------------------------------------------ scalar losses


def test_uwso_matches_oracle():
    vals = [2.3, 0.017]
    ours = float(uwso_combine(jnp.asarray(vals, jnp.float32)))
    np.testing.assert_allclose(ours, uwso_oracle(vals), rtol=1e-6)


@pytest.mark.parametrize("smoothing", [0.0, 0.01, 0.1])
def test_cross_entropy_hard_targets(smoothing):
    logits = RNG.standard_normal((8, 10)).astype(np.float32)
    targets = RNG.integers(0, 10, 8)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets), smoothing))
    ref = smoothed_ce_oracle(logits, targets, smoothing)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cross_entropy_soft_targets():
    logits = RNG.standard_normal((8, 10)).astype(np.float32)
    raw = np.abs(RNG.standard_normal((8, 10))).astype(np.float32)
    targets = raw / raw.sum(-1, keepdims=True)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets), 0.02))
    ref = smoothed_ce_oracle(logits, targets, 0.02)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


# ----------------------------------------------------------- orthogonality


def test_orthogonal_matrix_shapes():
    k = jax.random.PRNGKey(0)
    sq = orthogonal_matrix(k, 16, 16)
    np.testing.assert_allclose(
        np.asarray(sq @ sq.T), np.eye(16), atol=1e-5
    )
    wide = orthogonal_matrix(k, 16, 32)
    np.testing.assert_allclose(np.asarray(wide @ wide.T), np.eye(16), atol=1e-5)


# ------------------------------------------------------- degeneracy safety


def test_safe_eigh_gradients_finite_under_degeneracy():
    """bf16-quantized activations produce exactly repeated eigenvalues in
    the Gram matrices; the textbook eigh backward returns NaN there
    (observed as NaN losses on TPU). safe_eigh must stay finite."""
    from basd_tpu.ops.linalg import safe_eigh

    # rank-1 gram: eigenvalue 0 repeated (d-1) times
    v = np.ones((6, 1), np.float32)
    a = jnp.asarray(v @ v.T)

    def f(a):
        w, vecs = safe_eigh(a)
        return jnp.sum(w * jnp.arange(6.0)) + jnp.sum(vecs * 0.1)

    g = jax.grad(f)(a)
    assert np.isfinite(np.asarray(g)).all()


def test_selector_grads_finite_with_duplicate_tokens():
    """Duplicate token rows (common after bf16 rounding at init) must not
    produce NaN gradients through the subspace extraction."""
    from basd_tpu.ops.grassmann import (
        grassmann_subspace,
        rank_mask,
        spectral_grassmann_distance_sq,
    )

    base = RNG.standard_normal((4, 16)).astype(np.float32)
    z_s = np.repeat(base, 25, axis=0)  # massively degenerate
    z_t = _lowrank(100, 16, 5)
    basis_t, svals_t = grassmann_subspace(jnp.asarray(z_t))
    mask = rank_mask(jnp.asarray(5), 16)

    def f(z):
        basis_s, _ = grassmann_subspace(z)
        return spectral_grassmann_distance_sq(basis_s, basis_t, svals_t, mask)

    val, g = jax.value_and_grad(f)(jnp.asarray(z_s))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()


def test_rank_one_update_eigvals_matches_direct():
    """Secular recovery of the uncentered covariance spectrum from the
    centered Gram eigendecomposition (ops.linalg.rank_one_update_eigvals)
    must match a direct eigvalsh to f32 accuracy."""
    import numpy as np
    import jax.numpy as jnp
    from basd_tpu.ops.linalg import rank_one_update_eigvals

    rng = np.random.default_rng(3)
    m, d = 2000, 96
    for _ in range(3):
        z = rng.standard_normal((m, d)).astype(np.float32) * np.logspace(
            0, -2, d, dtype=np.float32
        )
        mu = z.mean(0)
        gram = (z - mu).T @ (z - mu)
        w, v = np.linalg.eigh(gram)
        lam = rank_one_update_eigvals(
            jnp.asarray(w[None]), jnp.asarray((v.T @ mu)[None]), float(m)
        )
        ref = np.linalg.eigvalsh(z.T @ z)
        np.testing.assert_allclose(
            np.asarray(lam)[0], ref, rtol=2e-5, atol=1e-4 * ref[-1]
        )


def test_ns_polar_pallas_matches_xla():
    """The fused Pallas NS kernel must reproduce the XLA hybrid path
    bit-for-bit in spirit (same schedule, same bf16 casts) — checked at
    bf16-noise tolerance, plus schedule constants kept in sync."""
    import jax.numpy as jnp
    import numpy as np

    from basd_tpu.ops import linalg
    from basd_tpu.ops.pallas import ns_polar

    assert ns_polar._QUINTIC_SCHEDULE == linalg._QUINTIC_SCHEDULE

    rng = np.random.default_rng(11)
    # ill-conditioned batch: decaying spectrum over (B, 16, 128)
    b, r, c = 5, 16, 128
    u = np.linalg.qr(rng.standard_normal((b, r, r)))[0]
    v = np.linalg.qr(rng.standard_normal((b, c, c)))[0][:, :, :r]
    # condition 1e2: the bf16 hybrid drives this full spectrum to ~1
    # (at 1e-4 tail singular values the orthogonality defect is bf16-
    # visible in BOTH paths — the first assert still locks parity)
    s = np.logspace(0, -2, r)
    m = jnp.asarray(
        np.einsum("bik,k,bjk->bij", u, s, v), jnp.float32
    )
    ref = linalg.newton_schulz_polar(m, schedule="hybrid")
    out = ns_polar.ns_polar_hybrid(m, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-2
    )
    # polar property: out^T out ~ I on the row space
    p = np.asarray(out, np.float64)
    ppt = np.einsum("bik,bjk->bij", p, p)
    np.testing.assert_allclose(
        ppt, np.broadcast_to(np.eye(r), (b, r, r)), atol=5e-2
    )
