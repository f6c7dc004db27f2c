"""Fused attention-weighted Procrustes statistics (Pallas, TPU).

Reference semantics: ``geometric_relational_loss`` over the selector's
mixed teacher tokens (``src/losses/relational.py:5-50``,
``src/losses/layer_selector.py:110-117``). The XLA lowering of that
chain materializes, per step at bench shapes: the mixed teacher tokens
(``pl,lbnd->pbnd``, 928 MB stack read + 308 MB write), the f32
centered/weighted panels, and the (P, B, D_s, D_t) cross-covariance
einsum — traced at ~8 ms/step forward. This kernel computes, in ONE
pass over the teacher stack and the student extraction stack:

    tm[p]    = sum_l wts[p,l] t[l]          (selector mixing, bf16 like
                                             the reference's dtype cast)
    mu_s/mu_t = importance-weighted means
    cross[p,b] = sum_n w_n (s_n - mu_s)(tm_n - mu_t)^T
    rowsq_s/rowsq_t[p,b,n] = w_n ||s_n - mu_s||^2 / w_n ||tm_n - mu_t||^2

so ``tr_s = sum_n rowsq_s`` etc. The mixed tokens never touch HBM.

Requires the mixed-teacher token count to equal the student token count
(no 1-D resample inside — callers fall back to the XLA path otherwise)
and pre-normalized importance weights ``w`` (the tiny normalize stays
in XLA).

Numerics: the mixing accumulates bf16(wts) * bf16(t) into f32 and
rounds to bf16 — mirroring the reference's weight cast and the XLA
einsum's accumulate-then-cast. All in-kernel f32 dots use
Precision.HIGHEST (Mosaic DEFAULT evaluates f32 dots as single-pass
bf16); the unfused path uses HIGH (3-pass) for the cross, so the kernel
is slightly MORE accurate there. Row reductions ride the MXU (ones-block
dots) — Mosaic's multi-axis vector reductions are pathologically slow
(probed round 4).

Differentiability: ``fused_relational_stats`` carries a custom VJP
w.r.t. (s, w, wts) — an analytic XLA backward (the derivation uses the
weighted-centering identities sum_n w_n sc_n = 0, which kill every
mu-chain term; see _bwd). The teacher stack is frozen (zero cotangent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF = jnp.bfloat16
_HI = jax.lax.Precision.HIGHEST


def _kernel(s_ref, t_ref, w_ref, wts_ref, cross_ref, rs_ref, rt_ref,
            mus_ref, mut_ref, *, p_points: int, n_layers: int):
    s = s_ref[...]   # (P, tb, N, Ds) bf16
    w = w_ref[...]   # (P, tb, N) f32 (normalized)
    wts = wts_ref[...]  # (P, L) f32 (used as bf16, see below)
    tb, n = s.shape[1], s.shape[2]

    ws = jnp.sqrt(w)  # (P, tb, N)
    ones8 = jnp.ones((tb, 8, n), _BF)

    for p in range(p_points):
        # selector mixing: weights cast to the token dtype (reference
        # layer_selector.py:110), f32 accumulate, round to the token
        # dtype — the XLA einsum's exact arithmetic
        wl = wts[p].astype(t_ref.dtype).astype(_F32)  # (L,)
        tm = t_ref[0].astype(_F32) * wl[0]
        for l in range(1, n_layers):
            tm = tm + t_ref[l].astype(_F32) * wl[l]
        tm = tm.astype(t_ref.dtype).astype(_F32)  # (tb, N, Dt)

        wp = w[p]  # (tb, N)
        # weighted means on the MXU: (tb, 1, N) @ (tb, N, D) -> (tb, 1, D)
        mu_t = jax.lax.dot_general(
            wp[:, None, :], tm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32, precision=_HI,
        )
        sf = s[p].astype(_F32)
        mu_s = jax.lax.dot_general(
            wp[:, None, :], sf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32, precision=_HI,
        )
        wsp = ws[p][:, :, None]  # (tb, N, 1)
        sw = wsp * (sf - mu_s)
        tw = wsp * (tm - mu_t)

        cross_ref[p] = jax.lax.dot_general(
            sw, tw, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32, precision=_HI,
        )

        # rowsq via ones-dot: sum_d x^2 as (tb, 8, N) @ (tb, N, ...) is
        # wrong-side; use x*x contracted with an all-ones lane block
        for src, dst in ((sw, rs_ref), (tw, rt_ref)):
            sq = src * src  # (tb, N, D)
            o = jnp.ones((tb, src.shape[2], 8), _F32)
            r = jax.lax.dot_general(
                sq, o, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=_F32, precision=_HI,
            )  # (tb, N, 8)
            dst[p] = r[:, :, 0]

        mus_ref[p] = mu_s[:, 0, :]
        mut_ref[p] = mu_t[:, 0, :]


def _fwd_pallas(s, t, w, wts, interpret):
    p_pts, b, n, ds = s.shape
    n_layers, _, _, dt = t.shape
    tile_b = 8
    while b % tile_b:
        tile_b //= 2

    grid = (b // tile_b,)
    out = pl.pallas_call(
        functools.partial(_kernel, p_points=p_pts, n_layers=n_layers),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pts, tile_b, n, ds), lambda j: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, tile_b, n, dt), lambda j: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pts, tile_b, n), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pts, n_layers), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_pts, tile_b, ds, dt), lambda j: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pts, tile_b, n), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pts, tile_b, n), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pts, tile_b, ds), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pts, tile_b, dt), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pts, b, ds, dt), _F32),
            jax.ShapeDtypeStruct((p_pts, b, n), _F32),
            jax.ShapeDtypeStruct((p_pts, b, n), _F32),
            jax.ShapeDtypeStruct((p_pts, b, ds), _F32),
            jax.ShapeDtypeStruct((p_pts, b, dt), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(s, t, w, wts)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_relational_stats(s, t, w, wts, interpret=False):
    """Fused mixing + weighted Procrustes statistics.

    Args:
        s: (P, B, N, Ds) bf16 student extraction tokens.
        t: (L, B, N, Dt) bf16 frozen teacher layer tokens (stop-grad).
        w: (P, B, N) f32 normalized importance weights (sum_n w = 1).
        wts: (P, L) f32 selector mixing weights.

    Returns:
        cross: (P, B, Ds, Dt) f32 weighted cross-covariance.
        tr_s, tr_t: (P, B) f32 weighted traces.
    """
    cross, rs, rt, _, _ = _fwd_pallas(s, t, w, wts, interpret)
    return cross, jnp.sum(rs, axis=-1), jnp.sum(rt, axis=-1)


def _vjp_fwd(s, t, w, wts, interpret):
    cross, rs, rt, mu_s, mu_t = _fwd_pallas(s, t, w, wts, interpret)
    out = (cross, jnp.sum(rs, axis=-1), jnp.sum(rt, axis=-1))
    return out, (s, t, w, wts, mu_s, mu_t)


def _vjp_bwd(interpret, res, cts):
    s, t, w, wts, mu_s, mu_t = res
    dc, dtrs, dtrt = cts

    # recompute the mixed tokens (token dtype, the forward's arithmetic)
    wl = wts.astype(t.dtype)
    tm = jnp.einsum("pl,lbnd->pbnd", wl, t)  # accumulate-in-f32
    tc = tm.astype(_F32) - mu_t[:, :, None, :]
    sc = s.astype(_F32) - mu_s[:, :, None, :]

    prec = jax.lax.Precision.HIGH
    # cross cotangent pushed to each side (the mu-chain terms vanish by
    # the weighted-centering identities sum_n w_n sc_n = 0)
    u_s = jnp.einsum("pbst,pbnt->pbns", dc, tc, precision=prec)
    u_t = jnp.einsum("pbst,pbns->pbnt", dc, sc, precision=prec)
    w4 = w[..., None]
    ds = w4 * (2.0 * dtrs[:, :, None, None] * sc + u_s)
    dtm = w4 * (2.0 * dtrt[:, :, None, None] * tc + u_t)

    # d/dw_n = dtrs ||sc_n||^2 + dtrt ||tc_n||^2 + sc_n^T dC tc_n
    dw = (
        dtrs[:, :, None] * jnp.sum(sc * sc, axis=-1)
        + dtrt[:, :, None] * jnp.sum(tc * tc, axis=-1)
        + jnp.sum(sc * u_s, axis=-1)
    )

    # through the mixing: d wts[p,l] = sum_{b,n,d} dtm . t_l (the dtype
    # casts backprop as identity)
    dwts = jnp.einsum(
        "pbnd,lbnd->pl", dtm.astype(t.dtype), t, precision=prec,
        preferred_element_type=_F32,
    )

    return (
        ds.astype(s.dtype),
        jnp.zeros_like(t),  # frozen teacher (caller stop-grads anyway)
        dw,
        dwts.astype(wts.dtype),
    )


fused_relational_stats.defvjp(_vjp_fwd, _vjp_bwd)
