"""Packed (flat + CLS slab) teacher collections vs the dense stack.

The packed representation (models.tokens.PackedTokens) exists purely to
avoid whole-stack HBM copies on TPU (4-D relayout + CLS strip, ~6 ms/step
at bench shapes); it must be a pure re-layout of the same math:

- the selector's centered Gram over patch rows, computed from the full
  flat stack minus the CLS slab's contribution, equals the dense strip's
  Gram (reference semantics: ``src/losses/layer_selector.py:51-73``
  operate on CLS-stripped hook outputs, ``teacher.py:202``);
- the combined loss with a zero-weighted CLS row equals the stripped
  loss exactly (every per-token term of the attention-weighted
  Procrustes carries w_n — ``src/losses/relational.py:30-45``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basd_tpu.losses.combined import BASDLossConfig, basd_loss, init_basd_loss
from basd_tpu.losses.selector import SelectorConfig, init_selector, select_and_mix
from basd_tpu.models.tokens import PackedTokens, pack_dense

RNG = np.random.default_rng(7)

L, P, B, N_T, D_T, D_S = 3, 2, 4, 9, 12, 8  # N_T includes the CLS row
N_PATCH = N_T - 1


def _mk_inputs():
    full = jnp.asarray(
        RNG.standard_normal((L, B, N_T, D_T)).astype(np.float32)
    )
    # outlier channel means, like real ViT residual streams
    full = full + jnp.asarray(
        (RNG.standard_normal((1, 1, 1, D_T)) * 5.0).astype(np.float32)
    )
    s_int = jnp.asarray(
        RNG.standard_normal((P, B, N_PATCH, D_S)).astype(np.float32)
    )
    imp = jnp.asarray(
        RNG.uniform(0.1, 1.0, (L, B, N_PATCH)).astype(np.float32)
    )
    return full, s_int, imp


def test_pack_dense_roundtrip():
    full, _, _ = _mk_inputs()
    pt = pack_dense(full, has_cls=True)
    assert pt.num_patch_tokens == N_PATCH
    np.testing.assert_array_equal(
        np.asarray(pt.to_dense()), np.asarray(full[:, :, 1:, :])
    )
    np.testing.assert_array_equal(
        np.asarray(pt.cls), np.asarray(full[:, :, 0, :])
    )


@pytest.mark.parametrize("backend", ["gram", "jacobi"])
def test_packed_selector_matches_dense(backend):
    full, s_int, imp = _mk_inputs()
    cfg = SelectorConfig(
        num_extraction_points=P, student_dim=D_S, teacher_dim=D_T,
        backend=backend,
    )
    params, buffers = init_selector(jax.random.PRNGKey(0), cfg)

    dense_tokens = full[:, :, 1:, :]
    mt_d, mi_d, aux_d = select_and_mix(
        params, buffers, s_int, dense_tokens, imp, cfg
    )
    mt_p, mi_p, aux_p = select_and_mix(
        params, buffers, s_int, pack_dense(full, has_cls=True), imp, cfg
    )

    np.testing.assert_array_equal(
        np.asarray(aux_d["ranks"]), np.asarray(aux_p["ranks"])
    )
    np.testing.assert_allclose(
        np.asarray(aux_d["distances_sq"]), np.asarray(aux_p["distances_sq"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(aux_d["mix_weights"]), np.asarray(aux_p["mix_weights"]),
        rtol=1e-5, atol=1e-6,
    )
    # packed mixing keeps the CLS row at n=0; patch rows must match
    assert mt_p.shape == (P, B, N_T, D_T)
    np.testing.assert_allclose(
        np.asarray(mt_d), np.asarray(mt_p[:, :, 1:, :]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mi_d), np.asarray(mi_p), rtol=1e-6, atol=1e-7
    )


def test_packed_selector_falls_back_for_svd():
    full, s_int, imp = _mk_inputs()
    cfg = SelectorConfig(
        num_extraction_points=P, student_dim=D_S, teacher_dim=D_T,
        backend="svd",
    )
    params, buffers = init_selector(jax.random.PRNGKey(0), cfg)
    mt_d, _, _ = select_and_mix(
        params, buffers, s_int, full[:, :, 1:, :], imp, cfg
    )
    mt_p, _, _ = select_and_mix(
        params, buffers, s_int, pack_dense(full, has_cls=True), imp, cfg
    )
    # the svd parity path densifies internally: same stripped shape
    assert mt_p.shape == mt_d.shape
    np.testing.assert_allclose(
        np.asarray(mt_d), np.asarray(mt_p), rtol=1e-5, atol=1e-6
    )


def test_packed_basd_loss_matches_dense_value_and_grad():
    full, s_int, imp = _mk_inputs()
    cfg = BASDLossConfig(
        student_dim=D_S, teacher_dim=D_T, student_depth=4,
        num_student_tokens=N_PATCH, num_extraction_points=P,
        label_smoothing=0.0, teacher_has_cls_token=True, backend="gram",
    )
    params, buffers = init_basd_loss(jax.random.PRNGKey(0), cfg)
    logits = jnp.asarray(RNG.standard_normal((B, 10)).astype(np.float32))
    targets = jnp.asarray(RNG.integers(0, 10, (B,)))

    def run(teacher_tokens, p, s):
        loss, aux = basd_loss(
            p, buffers, logits, targets, s, teacher_tokens, imp, cfg
        )
        return loss, aux

    dense_tokens = full[:, :, 1:, :]
    packed = pack_dense(full, has_cls=True)

    l_d, g_d = jax.value_and_grad(
        lambda p, s: run(dense_tokens, p, s)[0], argnums=(0, 1)
    )(params, s_int)
    l_p, g_p = jax.value_and_grad(
        lambda p, s: run(packed, p, s)[0], argnums=(0, 1)
    )(params, s_int)

    np.testing.assert_allclose(float(l_d), float(l_p), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_d[0]["log_temperatures"]),
        np.asarray(g_p[0]["log_temperatures"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(g_d[1]), np.asarray(g_p[1]), rtol=1e-4, atol=1e-6
    )
    _, aux_d = run(dense_tokens, params, s_int)
    _, aux_p = run(packed, params, s_int)
    np.testing.assert_allclose(
        float(aux_d["geo_loss"]), float(aux_p["geo_loss"]), rtol=1e-5
    )


@pytest.mark.parametrize("n_s", [N_PATCH + 3, N_PATCH - 2])
def test_packed_basd_loss_token_mismatch_matches_dense(n_s):
    """A student grid that needs interpolation rides the packed path via
    the CLS strip + interp matmul on the P-point mixed panel (r5; the
    reference's default dinov2_vitb14 teacher has 256 patches vs 196
    student tokens) — value AND grad must equal the dense aligned loss
    (reference: src/losses/combined.py:9-14 interpolation semantics)."""
    rng = np.random.default_rng(1000 + n_s)  # order-independent data
    full = jnp.asarray(rng.standard_normal((L, B, N_T, D_T)).astype(np.float32))
    full = full + jnp.asarray(
        (rng.standard_normal((1, 1, 1, D_T)) * 5.0).astype(np.float32)
    )
    imp = jnp.asarray(rng.uniform(0.1, 1.0, (L, B, N_PATCH)).astype(np.float32))
    s_int = jnp.asarray(
        rng.standard_normal((P, B, n_s, D_S)).astype(np.float32)
    )
    cfg = BASDLossConfig(
        student_dim=D_S, teacher_dim=D_T, student_depth=4,
        num_student_tokens=n_s, num_extraction_points=P,
        label_smoothing=0.0, teacher_has_cls_token=True, backend="gram",
    )
    params, buffers = init_basd_loss(jax.random.PRNGKey(0), cfg)
    logits = jnp.asarray(rng.standard_normal((B, 10)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 10, (B,)))

    def run(tokens, p, s):
        return basd_loss(
            p, buffers, logits, targets, s, tokens, imp, cfg
        )[0]

    dense_tokens = full[:, :, 1:, :]
    packed = pack_dense(full, has_cls=True)
    l_d, g_d = jax.value_and_grad(
        lambda p, s: run(dense_tokens, p, s), argnums=(0, 1)
    )(params, s_int)
    l_p, g_p = jax.value_and_grad(
        lambda p, s: run(packed, p, s), argnums=(0, 1)
    )(params, s_int)
    np.testing.assert_allclose(float(l_d), float(l_p), rtol=1e-5)
    # the temperature gradient is a softmax-Jacobian covariance with heavy
    # cancellation (dL/dw_l terms O(loss) cancel to an O(1e-2) grad); f32
    # rounding-path differences between the two layouts surface at ~1e-4
    # absolute. Verified exact in float64 (agreement to 1e-8).
    np.testing.assert_allclose(
        np.asarray(g_d[0]["log_temperatures"]),
        np.asarray(g_p[0]["log_temperatures"]),
        rtol=2e-2, atol=5e-4,
    )
    # student grads pass through the f32 eigh backward (1/(λ_i - λ_j)
    # amplification) — same f64-exactness argument as above.
    np.testing.assert_allclose(
        np.asarray(g_d[1]), np.asarray(g_p[1]), rtol=1e-2, atol=5e-4
    )
