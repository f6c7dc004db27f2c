"""Single-pass centered token Gram (Pallas, TPU).

The Grassmannian selector needs, per layer stack (K, B, N, D), the
CENTERED token-space Gram ``G_c = sum_r (t_r - mu)(t_r - mu)^T`` plus the
channel mean ``mu`` (reference semantics: ``src/losses/layer_selector.py:
51-56`` center-then-SVD, rebuilt as Gram eigh — see
``basd_tpu/losses/selector.py``). The XLA lowering of that computation
makes THREE full passes over the stack (933 MB at the bench teacher
shapes): the mean reduce, the shifted-stack materialization
``(toks - stop_grad(mu)).astype(bf16)``, and the Gram einsum read —
traced at ~8.8 ms/step combined.

This kernel produces the same quantities in ONE pass over the stack
using the exact shift identity: for ANY constant c,

    G_c = sum_r (t_r - c)(t_r - c)^T - (1/m) s s^T,   s = sum_r (t_r - c)

holds identically (same value and same gradient, since ``d/dt [G_c]``
is independent of c). ``c`` is a cheap XLA mean over a leading SLICE of
the batch (~1/8 of one pass) computed outside the kernel — within
O(sigma/sqrt(slice rows)) of the full mean, so both accumulated terms
live at the centered numerical scale and the subtraction cancels
nothing (the same argument as the selector's stop-gradient shift; locked
there by ``tests/test_selector.py::test_centered_gram_outlier_channel_
means``). Hardware note (v5e, probed): an in-kernel ``c`` carried
through VMEM scratch from the first batch tile ran ~170 ms — some
Mosaic scheduling pathology — while the same kernel with a constant
shift runs at the DMA floor; hence the out-of-kernel ``c``.

Matching the unfused path's arithmetic: the shifted values are rounded
to the input dtype before the MXU product (exactly like the
materialized ``shifted`` stack; bf16 x bf16 products are exact in the
f32 accumulator, so Mosaic DEFAULT dot precision is the correct
semantic). The column sums ``s`` ride the MXU too (an all-ones
sublane-block dot — probed at the DMA floor, unlike Mosaic's
multi-axis vector reductions), so they see the same rounding.

Differentiability: ``centered_token_gram`` carries a custom VJP —
``dL/dt_r = (dG + dG^T)(t_r - mu) + dmu / m`` — identical to what
autodiff produces through the unfused path (where the correction term's
gradient vanishes at d = mu - stop_grad(mu) = 0). The backward is a
small XLA einsum, not a kernel.

An optional ``skip_first_token`` masks token row 0 (the CLS token) out
of every sum, letting callers feed the raw (K, B, 1+N, D) collection
stack without materializing the cls-stripped slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF = jnp.bfloat16


def _kernel(x_ref, c_ref, g_ref, s_ref, *, skip: bool):
    b = pl.program_id(1)
    x = x_ref[0].astype(_F32)  # (tile_b, N, D)
    tb, n, d = x.shape

    xf = x - c_ref[0]  # (1, D) broadcasts over (tile_b, N, D)
    if skip:
        # multiplicative row mask instead of a sublane slice (a [1:, :]
        # slice of the token axis would force an unaligned relayout)
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (n, d), 0) >= 1
        ).astype(_F32)
        xf = xf * mask[None]

    # shifted values round to the INPUT dtype before the products,
    # exactly like the unfused path's materialized `shifted` stack. bf16
    # inputs use the single-pass MXU dot (products exact in the f32
    # accumulator); f32 inputs need HIGHEST — Mosaic DEFAULT evaluates
    # f32 dots as single-pass bf16 (documented gotcha).
    xs = xf.astype(x_ref.dtype)
    prec = (
        jax.lax.Precision.DEFAULT
        if x_ref.dtype == _BF
        else jax.lax.Precision.HIGHEST
    )
    part = jax.lax.dot_general(
        xs, xs, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32, precision=prec,
    )
    g_blk = jnp.sum(part, axis=0)  # (D, D) — leading-dim reduce: fast

    # column sums on the MXU: ones-block dot, then the (fast) leading
    # reduce. All 8 output rows are identical copies.
    ones = jnp.ones((tb, 8, n), x_ref.dtype)
    sp = jax.lax.dot_general(
        ones, xs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32, precision=prec,
    )  # (tile_b, 8, D)
    s_blk = jnp.sum(sp, axis=0)  # (8, D)

    @pl.when(b == 0)
    def _():
        g_ref[...] = g_blk[None]
        s_ref[...] = s_blk[None]

    @pl.when(b > 0)
    def _():
        g_ref[...] += g_blk[None]
        s_ref[...] += s_blk[None]


def _gram_pallas(
    toks: jnp.ndarray, skip_first_token: bool, interpret: bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    k, b, n, d = toks.shape
    tile_b = 16
    while b % tile_b:
        tile_b //= 2
    m = b * (n - 1 if skip_first_token else n)

    # approximate shift constant from a leading batch slice (any c is
    # exact under the identity; c ~ mu keeps both terms at the centered
    # scale). stop_gradient: the exact-identity gradient never sees c.
    b0 = min(b, 64)
    sl = toks[:, :b0, 1:, :] if skip_first_token else toks[:, :b0]
    c = jax.lax.stop_gradient(
        jnp.mean(sl.astype(_F32), axis=(1, 2))
    )  # (K, D)

    g, s8 = pl.pallas_call(
        functools.partial(_kernel, skip=skip_first_token),
        grid=(k, b // tile_b),
        in_specs=[
            pl.BlockSpec((1, tile_b, n, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, d, d), _F32),
            jax.ShapeDtypeStruct((k, 8, d), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # outer dim independent, inner dim accumulates into the
            # revisited output blocks: sequential
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(toks, c[:, None, :])
    s = s8[:, 0]
    g_c = g - s[:, :, None] * s[:, None, :] * jnp.float32(1.0 / m)
    mu = c + s * jnp.float32(1.0 / m)
    return g_c, mu


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def centered_token_gram(
    toks: jnp.ndarray, skip_first_token: bool = False,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(K, B, N, D) tokens -> (centered Gram (K, D, D) f32, mean (K, D) f32).

    Token rows are everything except row 0 when ``skip_first_token``
    (cls stays in the input stack, out of the statistics). Input is
    expected bf16 (the shifted values round to bf16 before the MXU
    products, matching the unfused selector path's materialized stack).
    """
    return _gram_pallas(toks, skip_first_token, interpret)


def _fwd(toks, skip_first_token, interpret):
    g_c, mu = _gram_pallas(toks, skip_first_token, interpret)
    return (g_c, mu), (toks, mu)


def _bwd(skip_first_token, interpret, res, cts):
    toks, mu = res
    dg, dmu = cts
    k, b, n, d = toks.shape
    m = b * (n - 1 if skip_first_token else n)
    sym = dg + jnp.swapaxes(dg, -1, -2)
    centered = toks.astype(_F32) - mu[:, None, None, :]
    dt = jnp.einsum(
        "kbnd,kde->kbne", centered, sym,
        preferred_element_type=_F32,
    )
    dt = dt + (dmu * jnp.float32(1.0 / m))[:, None, None, :]
    if skip_first_token:
        rowmask = (jnp.arange(n) >= 1).astype(_F32)
        dt = dt * rowmask[None, None, :, None]
    return (dt.astype(toks.dtype),)


centered_token_gram.defvjp(_fwd, _bwd)
