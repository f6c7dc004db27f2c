"""Probe Mosaic schedules for the centered token-Gram kernel.

The committed kernel (ops/pallas/token_gram.py) validated for parity but
ran ~170 ms at teacher shapes vs ~8.8 ms for the XLA lowering. Suspect:
the (1, D) -> (tb, N, D) broadcast subtract needs a sublane-replicated
vreg relayout per row. Variants probed here (timing only; `raw` is not
numerically acceptable):

  cur    — committed kernel: c block (1, 1, d), x - c_ref[0]
  cbig   — c pre-broadcast to (1, n, d): subtract without sublane
           replication (leading-dim broadcast only)
  raw    — no subtraction at all (upper speed bound)
  unfused— the XLA three-pass lowering

Run on the real TPU chip; chained-fetch timing per CLAUDE.md.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from basd_tpu.ops.pallas.token_gram import centered_token_gram

_F32 = jnp.float32

K, B, N, D = 12, 512, 196, 384
TILE_B = 16


def _kernel(x_ref, c_ref, g_ref, s_ref, *, mode: str):
    b = pl.program_id(1)
    x = x_ref[0].astype(_F32)  # (tile_b, N, D)
    tb, n, d = x.shape

    if mode == "cur":
        xf = x - c_ref[0]  # (1, D) broadcast: sublane replication
    elif mode == "cbig":
        xf = x - c_ref[0]  # (N, D): leading-dim broadcast only
    else:  # raw
        xf = x

    xs = xf.astype(x_ref.dtype)
    part = jax.lax.dot_general(
        xs, xs, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32,
    )
    g_blk = jnp.sum(part, axis=0)

    ones = jnp.ones((tb, 8, n), x_ref.dtype)
    sp = jax.lax.dot_general(
        ones, xs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32,
    )
    s_blk = jnp.sum(sp, axis=0)

    @pl.when(b == 0)
    def _():
        g_ref[...] = g_blk[None]
        s_ref[...] = s_blk[None]

    @pl.when(b > 0)
    def _():
        g_ref[...] += g_blk[None]
        s_ref[...] += s_blk[None]


def make_variant(mode: str):
    c_rows = N if mode == "cbig" else 1

    def run(toks):
        k, b, n, d = toks.shape
        c = jax.lax.stop_gradient(
            jnp.mean(toks[:, :64].astype(_F32), axis=(1, 2))
        )
        c_in = jnp.broadcast_to(c[:, None, :], (k, c_rows, d))
        g, s8 = pl.pallas_call(
            functools.partial(_kernel, mode=mode),
            grid=(k, b // TILE_B),
            in_specs=[
                pl.BlockSpec((1, TILE_B, n, d), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_rows, d), lambda i, j: (i, 0, 0),
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
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(toks, c_in)
        m = b * n
        s = s8[:, 0]
        return g - s[:, :, None] * s[:, None, :] / m, c + s / m

    return run


def unfused(toks):
    mu = jnp.mean(toks, axis=(1, 2), dtype=_F32)
    shifted = (toks - jax.lax.stop_gradient(mu)[:, None, None, :]).astype(
        toks.dtype
    )
    g = jnp.einsum("kbnd,kbne->kde", shifted, shifted,
                   preferred_element_type=_F32)
    return g, mu


def chained_ms(fn, x, iters=10):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
        acc = float(jnp.sum(out[1][0]))
    dt = (time.perf_counter() - t0) * 1000 / iters
    return dt, acc


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((K, B, N, D)), jnp.bfloat16)

    ref_g, _ = jax.block_until_ready(jax.jit(unfused)(x))
    scale = float(jnp.max(jnp.abs(ref_g)))

    results = {}
    for name in sys.argv[1:] or ["unfused", "cur", "cbig", "raw", "committed"]:
        if name == "unfused":
            fn = jax.jit(unfused)
        elif name == "committed":
            fn = jax.jit(lambda t: centered_token_gram(t, False, False))
        else:
            fn = jax.jit(make_variant(name))
        try:
            g, _ = jax.block_until_ready(fn(x))
            err = float(jnp.max(jnp.abs(g - ref_g))) / scale
            dt, _ = chained_ms(fn, x)
            results[name] = (dt, err)
            print(f"{name:<10} {dt:8.2f} ms  rel_err={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<10} FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print("done")


if __name__ == "__main__":
    main()
