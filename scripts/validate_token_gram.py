"""Hardware validation of the fused centered token-Gram kernel.

Runs on the real TPU: Mosaic-vs-unfused parity at bench teacher/student
shapes, then chained-fetch timing of both formulations (the tunnel's
block_until_ready does not wait; see CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from basd_tpu.ops.pallas.token_gram import centered_token_gram


def unfused(toks):
    mu = jnp.mean(toks, axis=(1, 2), dtype=jnp.float32)
    shift = jax.lax.stop_gradient(mu)
    shifted = (toks - shift[:, None, None, :]).astype(toks.dtype)
    g = jnp.einsum(
        "kbnd,kbne->kde", shifted, shifted,
        preferred_element_type=jnp.float32,
    )
    m = toks.shape[1] * toks.shape[2]
    d = mu - shift
    return g - m * d[:, :, None] * d[:, None, :], mu


def chained_ms(fn, x, iters=10):
    out = fn(x)
    jax.block_until_ready(out)
    # chain: derive a scalar, fold into the input so steps serialize
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        g, mu = fn(x)
        acc += float(jnp.sum(mu[0]))  # value fetch blocks through tunnel
    dt = (time.perf_counter() - t0) * 1000 / iters
    return dt, acc


def main():
    rng = np.random.default_rng(0)
    for name, (k, b, n, d) in {
        "teacher": (12, 512, 196, 384),
        "student": (4, 512, 196, 192),
    }.items():
        base = rng.standard_normal((k, b, n, d)).astype(np.float32)
        base[:, :, :, ::7] += 40.0  # outlier channel means
        x = jnp.asarray(base, jnp.bfloat16)

        f_k = jax.jit(lambda t: centered_token_gram(t, False, False))
        f_u = jax.jit(unfused)
        gk, muk = jax.block_until_ready(f_k(x))
        gu, muu = jax.block_until_ready(f_u(x))
        scale = float(jnp.max(jnp.abs(gu)))
        err_g = float(jnp.max(jnp.abs(gk - gu))) / scale
        err_mu = float(jnp.max(jnp.abs(muk - muu)))
        tk, _ = chained_ms(f_k, x)
        tu, _ = chained_ms(f_u, x)
        print(
            f"{name}: rel_gram_err={err_g:.2e} mu_err={err_mu:.2e} "
            f"kernel={tk:.2f}ms unfused={tu:.2f}ms",
            flush=True,
        )
        assert np.isfinite(np.asarray(gk)).all()
        if err_g > 5e-3:
            print("FAIL: gram parity", file=sys.stderr)
            sys.exit(1)
    print("ok")


if __name__ == "__main__":
    main()
