"""Hardware validation of the identity-form relational loss.

Runs on the real TPU at bench shapes (P=4 extraction points, B=512,
N=196, Ds=192, Dt=384 mixed-teacher tokens): value/gradient parity of
``geometric_relational_loss_ident`` against the reference-shaped
composition (centered + sqrt(w) panels), then chained-fetch timing of
both, forward and value_and_grad (the tunnel's block_until_ready does
not wait; see CLAUDE.md).

History: a fully fused Pallas formulation of the same statistics was
hardware-validated in round 4 (parity ok) but LOST to XLA — 61.8 vs
46.5 ms fwd / 68.5 vs 58.7 ms grad for the full chain — and was
deleted; the identity form keeps the algebraic win (no teacher-side
centering materialization) in plain XLA.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from basd_tpu.ops.procrustes import (
    geometric_relational_loss,
    geometric_relational_loss_ident,
)

P, B, N, DS, DT = 4, 512, 196, 192, 384


def composed(s, t, w):
    geo = jax.vmap(
        lambda sp, tp, wp: geometric_relational_loss(
            sp, tp, wp, nuclear_backend="gram"
        )
    )(s, t, w)
    return jnp.mean(geo)


def ident(s, t, w):
    return jnp.mean(
        geometric_relational_loss_ident(s, t, w, nuclear_backend="gram")
    )


def chained_ms(fn, args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        acc = float(jnp.sum(leaf) if leaf.ndim else leaf)  # fetch blocks
    dt = (time.perf_counter() - t0) * 1000 / iters
    return dt, acc


def main():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((P, B, N, DS)), jnp.bfloat16)
    # mixed-teacher tokens with outlier channel means (ViT residual
    # stream realism — stresses the raw-moment tr_t cancellation)
    base = rng.standard_normal((P, B, N, DT)).astype(np.float32)
    base[:, :, :, ::13] += 8.0
    t = jnp.asarray(base, jnp.bfloat16)
    w = jnp.asarray(rng.uniform(0.05, 1.0, (P, B, N)), jnp.float32)

    gi = jax.jit(jax.value_and_grad(ident, argnums=(0, 2)))
    gc = jax.jit(jax.value_and_grad(composed, argnums=(0, 2)))
    (vi, (dsi, dwi)) = jax.block_until_ready(gi(s, t, w))
    (vc, (dsc, dwc)) = jax.block_until_ready(gc(s, t, w))
    e_v = abs(float(vi) - float(vc)) / abs(float(vc))
    gs = float(jnp.max(jnp.abs(dsc.astype(jnp.float32))))
    e_ds = float(
        jnp.max(jnp.abs(dsi.astype(jnp.float32) - dsc.astype(jnp.float32)))
    ) / gs
    e_dw = float(jnp.max(jnp.abs(dwi - dwc))) / float(jnp.max(jnp.abs(dwc)))
    print(
        f"loss: ident={float(vi):.6f} composed={float(vc):.6f} "
        f"rel={e_v:.2e} dgrad_s={e_ds:.2e} dgrad_w={e_dw:.2e}",
        flush=True,
    )
    assert np.isfinite(float(vi)) and np.isfinite(
        np.asarray(dsi, np.float32)
    ).all()

    tf_i, _ = chained_ms(jax.jit(ident), (s, t, w))
    tf_c, _ = chained_ms(jax.jit(composed), (s, t, w))
    tg_i, _ = chained_ms(gi, (s, t, w))
    tg_c, _ = chained_ms(gc, (s, t, w))
    print(f"fwd:  ident={tf_i:.2f}ms composed={tf_c:.2f}ms", flush=True)
    print(f"grad: ident={tg_i:.2f}ms composed={tg_c:.2f}ms", flush=True)

    ok = e_v < 2e-3 and e_ds < 5e-2 and e_dw < 5e-3
    print("ok" if ok else "FAIL: parity", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
