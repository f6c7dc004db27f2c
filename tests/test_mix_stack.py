"""Parity tests for the fused layer-stack mixing kernel (ops/pallas/
mix_stack.py): the Pallas program (interpret lowering) and the custom VJP
must match the plain ``pl,lmd->pmd`` einsum it replaces (reference
semantics: src/losses/layer_selector.py:110-118)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from basd_tpu.ops.pallas.mix_stack import _mix_fwd_pallas, mix_stack

RNG = np.random.default_rng(11)
L, M, D, P = 12, 512, 48, 4


def _inputs(dtype):
    w = jnp.asarray(RNG.standard_normal((P, L)).astype(np.float32), dtype)
    t = jnp.asarray(
        RNG.standard_normal((L, M, D)).astype(np.float32), dtype
    )
    return w, t


def test_kernel_matches_einsum_f32():
    w, t = _inputs(jnp.float32)
    out = _mix_fwd_pallas(w, t, interpret=True)
    ref = jnp.einsum("pl,lmd->pmd", w, t)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_kernel_matches_einsum_bf16():
    w, t = _inputs(jnp.bfloat16)
    out = _mix_fwd_pallas(w, t, interpret=True)
    # the kernel accumulates in f32 (like the einsum's preferred f32
    # accumulation) then rounds once to bf16
    ref = jnp.einsum(
        "pl,lmd->pmd", w, t, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_non_divisible_m_uses_smaller_tile():
    w, t = _inputs(jnp.float32)
    t = t[:, : 8 * 41]  # M = 328 = 8 * 41: tile search lands on 8
    out = _mix_fwd_pallas(w, t, interpret=True)
    ref = jnp.einsum("pl,lmd->pmd", w, t)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_dw_kernel_matches_einsum():
    """The r5 dL/dw Pallas reduction (native-layout bandwidth pass with
    SMEM scalar accumulators, replacing XLA's double-relayout lowering
    of ``pmd,lmd->pl``) matches the einsum, f32 and bf16 operands."""
    from basd_tpu.ops.pallas.mix_stack import _dw_pallas

    for dtype, tol in ((jnp.float32, 1e-4), (jnp.bfloat16, 5e-3)):
        _, t = _inputs(dtype)
        g = jnp.asarray(
            RNG.standard_normal((P, M, D)).astype(np.float32), dtype
        )
        dw = _dw_pallas(g, t, interpret=True)
        ref = jnp.einsum("pmd,lmd->pl", g, t,
                         preferred_element_type=jnp.float32)
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(dw), np.asarray(ref, dtype=np.float32),
            rtol=tol, atol=tol * scale
        )


def test_custom_vjp_matches_einsum_grad():
    """dL/dw of mix_stack == dL/dw of the einsum; the stack cotangent is
    dead (stop-gradient call sites) but must still be zeros of the right
    shape."""
    w, t = _inputs(jnp.float32)
    g = jnp.asarray(RNG.standard_normal((P, M, D)).astype(np.float32))

    def via_kernel(w):
        return jnp.sum(mix_stack(w, t) * g)

    def via_einsum(w):
        return jnp.sum(jnp.einsum("pl,lmd->pmd", w, t) * g)

    gk = jax.grad(via_kernel)(w)
    ge = jax.grad(via_einsum)(w)
    # grads are M*D-element f32 sums (magnitude O(100)); summation-order
    # noise sits at ~1e-4 absolute
    np.testing.assert_allclose(np.asarray(gk), np.asarray(ge),
                               rtol=1e-4, atol=2e-3)

    # t cotangent: exists, zero
    dt = jax.grad(lambda t_: jnp.sum(mix_stack(w, t_) * g))(t)
    assert dt.shape == t.shape
    np.testing.assert_array_equal(np.asarray(dt), 0.0)
