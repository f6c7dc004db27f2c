"""Fused layer-stack mixing: ``mixed[p] = sum_l w[p,l] * t[l]``.

Motivation (traced round 5, B=512 bench): the selector's mixing einsum
``pl,lmd->pmd`` over the packed teacher collection (L=12, M=B*N=100864,
D=384 bf16) makes XLA relayout the ENTIRE ~930 MB stack to an
(M, L, D)-contiguous operand before its dot — a 3.4 ms transpose copy on
top of the 2.2 ms dot (HLO: ``copy.4589`` feeding ``fusion.618``). The
contraction itself is trivial (K = L = 12): the op is pure bandwidth, so
the right program reads each stack element ONCE in its native (L, M, D)
layout and writes the (P, M, D) mixed panel once — ~1.24 GB of traffic,
~1.6 ms at HBM speed, no relayout.

This kernel does exactly that: grid over M tiles, each program holding
the (L, TM, D) slab of every layer in VMEM and accumulating the P
weighted sums as VPU FMAs (the MXU has nothing to chew on at K=12).

Gradients: ``t`` is the stop-gradient teacher stack; only ``w`` needs a
VJP, and dL/dw[p,l] = <dmixed[p], t[l]> is the einsum ``pmd,lmd->pl``.
XLA's lowering of that einsum is a trap at stack scale (r5 trace): a
(P, L) output with a 38.7M-element contraction makes it relayout BOTH
operands to M-minor tilings — a 3.4 ms copy of the full stack plus a
1.0 ms copy of the cotangent feeding a 2.0 ms multiply-reduce fusion.
``_dw_pallas`` replaces it: one native-layout bandwidth pass over both
operands, accumulating the (P, L) scalars in SMEM across the M-tile
grid (~1.1 GB of reads, no copies).

Reference semantics: ``src/losses/layer_selector.py:110-118`` (weights
cast to token dtype, then weighted layer sum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mix_kernel(w_ref, t_ref, o_ref, *, num_p: int, num_l: int):
    # w lives in SMEM (scalar per-(p,l) reads); layers are upcast one at
    # a time so the VMEM stack holds one (TM, D) f32 transient + P f32
    # accumulators, not an f32 copy of the whole (L, TM, D) block
    t0 = t_ref[0].astype(jnp.float32)
    accs = [w_ref[p, 0] * t0 for p in range(num_p)]
    for l in range(1, num_l):
        tl = t_ref[l].astype(jnp.float32)
        for p in range(num_p):
            accs[p] = accs[p] + w_ref[p, l] * tl
    for p in range(num_p):
        o_ref[p, :, :] = accs[p].astype(o_ref.dtype)


def _mix_fwd_pallas(
    w: jnp.ndarray, t: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    num_l, m, d = t.shape
    num_p = w.shape[0]
    # largest power-of-two M tile <= 512 that divides M (M = B*N keeps a
    # power-of-two batch factor at every production shape); VMEM use is
    # (L + P) * TM * D * 2B  (~5.5 MB at the bench shape)
    tm = 512
    while tm > 8 and m % tm:
        tm //= 2
    kernel = functools.partial(_mix_kernel, num_p=num_p, num_l=num_l)
    return pl.pallas_call(
        kernel,
        grid=(m // tm,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((num_p, num_l), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((num_l, tm, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_p, tm, d), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_p, m, d), t.dtype),
        interpret=interpret,
    )(w.astype(jnp.float32), t)
    # w enters as f32 SCALARS in SMEM (exact upcast of the caller's
    # token-dtype weights): products against the bf16 layers accumulate
    # in f32 exactly like the einsum's preferred-f32 contraction


@jax.custom_vjp
def mix_stack(w: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(P, L) weights x (L, M, D) stack -> (P, M, D) mixed panel.

    Dispatches to the relayout-free Pallas kernel on TPU (M a multiple of
    8, modest L*D block); identical-math XLA einsum elsewhere. ``t`` is
    treated as constant (zero cotangent) — the teacher stack is always
    consumed under ``stop_gradient``.
    """
    return _mix_impl(w, t)


def _mix_impl(w, t):
    if (
        jax.default_backend() == "tpu"
        and t.ndim == 3
        and t.shape[1] % 8 == 0
        and t.shape[0] * t.shape[2] <= 32768
    ):
        return _mix_fwd_pallas(w, t)
    return jnp.einsum("pl,lmd->pmd", w, t)


def _mix_vjp_fwd(w, t):
    return _mix_impl(w, t), (w, t)


def _dw_kernel(g_ref, t_ref, o_ref, *, num_p: int, num_l: int, grid_m: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for p in range(num_p):
            for l in range(num_l):
                o_ref[p, l] = jnp.float32(0.0)

    # one f32 upcast of the cotangent tile, layers upcast one at a time
    gs = [g_ref[p].astype(jnp.float32) for p in range(num_p)]
    for l in range(num_l):
        tl = t_ref[l].astype(jnp.float32)
        for p in range(num_p):
            o_ref[p, l] = o_ref[p, l] + jnp.sum(gs[p] * tl)


def _dw_pallas(g: jnp.ndarray, t: jnp.ndarray, *, interpret: bool = False):
    num_l, m, d = t.shape
    num_p = g.shape[0]
    tm = 512
    while tm > 8 and m % tm:
        tm //= 2
    kernel = functools.partial(
        _dw_kernel, num_p=num_p, num_l=num_l, grid_m=m // tm
    )
    return pl.pallas_call(
        kernel,
        grid=(m // tm,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((num_p, tm, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_l, tm, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (P, L) scalar accumulators live in SMEM and revisit every grid
        # step (constant index map -> resident across the sequential
        # TPU grid); initialized at i == 0, final value after last tile
        out_specs=pl.BlockSpec((num_p, num_l), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((num_p, num_l), jnp.float32),
        interpret=interpret,
    )(g, t)


def _mix_vjp_bwd(res, g):
    w, t = res
    if (
        jax.default_backend() == "tpu"
        and t.ndim == 3
        and t.shape[1] % 8 == 0
        and t.shape[0] * t.shape[2] <= 32768
        and g.shape == (w.shape[0],) + t.shape[1:]
    ):
        dw = _dw_pallas(g, t).astype(w.dtype)
    else:
        # f32 accumulation, cast back to the weights' dtype (matching
        # the einsum VJP it replaces)
        dw = jnp.einsum(
            "pmd,lmd->pl", g, t, preferred_element_type=jnp.float32
        ).astype(w.dtype)
    # t rides under stop_gradient at every call site; its cotangent is
    # dead there, and XLA DCEs the broadcast-zero
    return dw, jnp.zeros_like(t)


mix_stack.defvjp(_mix_vjp_fwd, _mix_vjp_bwd)
