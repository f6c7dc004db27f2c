"""Probe trimmed Newton-Schulz hybrid schedules against an f64 SVD oracle.

The hybrid NS polar (5 quintic + 2 cubic, ``linalg._QUINTIC_SCHEDULE``)
costs 19 in-kernel matmuls; each cubic dropped saves 2, each quintic 3
(~11 ms -> proportionally less on the Procrustes batch). This script
measures what a trimmed tail costs in accuracy on matrices with
realistic BASD cross-covariance spectra (fast power-law decay + a
near-zero tail, the hard case for polar iterations):

- polar direction error  max ||P_ns - P_svd||_F / sqrt(r)  (the nuclear
  norm SUBGRADIENT error — this is the loss gradient);
- nuclear-norm value relative error (second-order insensitive).

Run on CPU (f64 oracle):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/ns_schedule_probe.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.ops import linalg


def make_batch(key, b=16, r=192, c=384, kind="powerlaw"):
    """Synthetic cross-covariances with BASD-like spectra."""
    k1, k2, k3 = jax.random.split(key, 3)
    u = jnp.linalg.qr(jax.random.normal(k1, (b, r, r), dtype=jnp.float64))[0]
    v = jnp.linalg.qr(jax.random.normal(k2, (b, c, r), dtype=jnp.float64))[0]
    i = jnp.arange(r, dtype=jnp.float64)
    if kind == "powerlaw":
        s = (1.0 + i) ** -1.5
    elif kind == "cliff":  # sharp rank-32 cliff with 1e-6 tail
        s = jnp.where(i < 32, 1.0 / (1.0 + i / 16), 1e-6)
    else:  # flat-ish
        s = 1.0 / (1.0 + 0.05 * i)
    s = s * jnp.exp(0.1 * jax.random.normal(k3, (b, r), dtype=jnp.float64))
    return jnp.einsum("bik,bk,bjk->bij", u, s, v)


def polar_svd(m):
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    return jnp.einsum("bik,bkj->bij", u, vt), jnp.sum(s, -1)


def ns_variant(m, n_quintic, n_cubic, inner=jnp.bfloat16):
    """newton_schulz_polar with a trimmed hybrid tail (XLA path)."""
    x = m.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=(-2, -1), keepdims=True) + 1e-30)
    x = (x / norm).astype(inner)
    prec = jax.lax.Precision.HIGHEST if inner == jnp.float32 else None

    def dot(a, b, tb=False):
        dims = (((2,), (2,) if tb else (1,)), ((0,), (0,)))
        out = jax.lax.dot_general(a, b, dims, precision=prec,
                                  preferred_element_type=jnp.float32)
        return out

    for a, bb, c in linalg._QUINTIC_SCHEDULE[:n_quintic]:
        g = dot(x, x, tb=True).astype(inner)
        g2 = dot(g, g).astype(inner)
        h = (jnp.float32(bb) * g.astype(jnp.float32)
             + jnp.float32(c) * g2.astype(jnp.float32)).astype(inner)
        x = (a * x.astype(jnp.float32) + dot(h, x)).astype(inner)
    for _ in range(n_cubic):
        g = dot(x, x, tb=True).astype(inner)
        x = (1.5 * x.astype(jnp.float32)
             - 0.5 * dot(g.astype(inner), x)).astype(inner)
    return x.astype(jnp.float32)


def main():
    key = jax.random.PRNGKey(0)
    for kind in ("powerlaw", "cliff", "flat"):
        m = make_batch(key, kind=kind)
        p_ref, nuc_ref = polar_svd(m)
        print(f"--- spectrum={kind} ---")
        for nq, nc in ((5, 2), (5, 1), (5, 0), (4, 2), (4, 1), (3, 2)):
            p = ns_variant(m, nq, nc).astype(jnp.float64)
            # subgradient error, weighted the way the loss weights it:
            # d(loss)/d(cross) = P, so measure relative Frobenius error
            gerr = jnp.max(
                jnp.linalg.norm(p - p_ref, axis=(1, 2))
                / jnp.linalg.norm(p_ref, axis=(1, 2))
            )
            nuc = jnp.einsum("bij,bij->b", p, m.astype(jnp.float64))
            verr = jnp.max(jnp.abs(nuc - nuc_ref) / nuc_ref)
            print(f"  q={nq} c={nc} ({3*nq+2*nc:>2} matmuls): "
                  f"grad relerr {float(gerr):.3e}  value relerr {float(verr):.3e}")


if __name__ == "__main__":
    main()
