"""Real-hardware validation of the fused block-attention kernel.

Runs the DeiT-Small teacher extraction twice — attention_impl='auto'
(flash) vs 'fused_block' (one LN1+qkv+flash+proj+residual Pallas kernel,
ops/pallas/fused_block_attn) — on the SAME random weights and inputs,
and reports per-layer token / importance divergence. Interpret-mode
parity is already locked by tests/test_fused_block_mlp.py; this script
exists because Mosaic lowering (layouts, precision of in-kernel dots)
can differ from the interpreter, and the kernel must not be switched
into the default dispatch until the real-TPU numbers are seen.

Pass/fail: tokens within bf16 resolution of the flash path (the two
paths round at the same points; divergence beyond ~1e-2 relative
signals a lowering bug), importance within 1e-3 absolute.

Usage: python scripts/validate_fused_attn.py [batch]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.models import create_model, init_model
from basd_tpu.models.registry import teacher_extract


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    img = 224
    print(f"platform={jax.default_backend()} B={b}", file=sys.stderr)

    bundle = create_model(
        "deit_small_patch16_224", img_size=img, num_classes=0,
        importance_mode="cls", collect_alias=True, dtype=jnp.bfloat16,
    )
    variables = init_model(bundle, jax.random.PRNGKey(0), img)
    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (b, img, img, 3)),
        jnp.bfloat16,
    )

    fused_bundle = type(bundle)(
        bundle.name, bundle.module.clone(attention_impl="fused_block"),
        bundle.cfg, bundle.info, bundle.mean, bundle.std,
    )

    from basd_tpu.models.tokens import PackedTokens

    def _dense(t):
        return t.to_dense() if isinstance(t, PackedTokens) else t

    t_ref, imp_ref = jax.jit(
        lambda v, x: teacher_extract(bundle, v, x)
    )(variables, x)
    t_ref = np.asarray(_dense(t_ref), np.float32)
    imp_ref = np.asarray(imp_ref, np.float32)

    t_f, imp_f = jax.jit(
        lambda v, x: teacher_extract(fused_bundle, v, x)
    )(variables, x)
    t_f = np.asarray(_dense(t_f), np.float32)
    imp_f = np.asarray(imp_f, np.float32)

    scale = np.abs(t_ref).mean()
    for layer in range(t_ref.shape[0]):
        dt = np.abs(t_ref[layer] - t_f[layer])
        di = np.abs(imp_ref[layer] - imp_f[layer])
        print(
            f"layer {layer:2d}: tok max={dt.max():.3e} mean={dt.mean():.3e}"
            f" (scale {np.abs(t_ref[layer]).mean():.3e})"
            f"  imp max={di.max():.3e}"
        )
    # Gate at the documented threshold (docstring: ~1e-2 relative signals
    # a lowering bug). A systematic Mosaic precision bug (e.g. in-kernel
    # dots silently at single-pass bf16) shows up as percent-level MEAN
    # divergence; isolated bf16 round-point differences on outlier tokens
    # only move the max. Gate both, with the mean gate strict.
    dt_all = np.abs(t_ref - t_f)
    tok_mean_rel = dt_all.mean() / max(scale, 1e-9)
    tok_max_rel = dt_all.max() / max(scale, 1e-9)
    imp_max = np.abs(imp_ref - imp_f).max()
    ok = (
        tok_mean_rel < 2e-3
        and tok_max_rel < 3e-2
        and imp_max < 1e-3
        and np.isfinite(t_f).all()
    )
    print(
        f"tok_mean_rel={tok_mean_rel:.3e} tok_max_rel={tok_max_rel:.3e} "
        f"imp_max={imp_max:.3e} ok={ok}"
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
