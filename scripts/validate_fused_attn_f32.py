"""Classify the fused-block-attention bf16 divergence against f32 truth.

``validate_fused_attn.py`` gates the fused kernel on closeness to the
FLASH path. Both are bf16 programs that round at different points, so
divergence compounds across the 12 residual layers even when both are
correct. This script separates "benign round-point disagreement" from
"Mosaic lowering bug" by comparing each bf16 path against a float32
einsum-attention oracle (same weights upcast):

- benign: |fused - f32| within ~1.5x of |flash - f32| at every layer;
- lowering bug (e.g. in-kernel dots at single-pass bf16): fused lands
  several times farther from f32 truth than flash does.

Usage: python scripts/validate_fused_attn_f32.py [batch]
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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
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

    def variant(attention_impl, dtype, precision=None):
        mod = bundle.module.clone(attention_impl=attention_impl, dtype=dtype)
        bb = type(bundle)(bundle.name, mod, bundle.cfg, bundle.info,
                          bundle.mean, bundle.std)
        if precision is not None:
            # The oracle must not itself run at TPU default matmul
            # precision (single-pass bf16) or it carries the very error
            # class this script exists to detect.
            with jax.default_matmul_precision(precision):
                t, imp = jax.jit(lambda v, xx: teacher_extract(bb, v, xx))(
                    variables, x.astype(dtype)
                )
        else:
            t, imp = jax.jit(lambda v, xx: teacher_extract(bb, v, xx))(
                variables, x.astype(dtype)
            )
        from basd_tpu.models.tokens import PackedTokens

        if isinstance(t, PackedTokens):
            t = t.to_dense()
        return np.asarray(t, np.float32), np.asarray(imp, np.float32)

    t32, _ = variant("einsum", jnp.float32, precision="highest")  # f32 truth
    tfl, _ = variant("auto", jnp.bfloat16)      # flash bf16 (current default)
    tfu, _ = variant("fused_block", jnp.bfloat16)
    for name, arr in (("f32", t32), ("flash", tfl), ("fused", tfu)):
        if not np.isfinite(arr).all():
            print(f"NON-FINITE values in the {name} path — FAIL")
            sys.exit(1)

    worst_ratio = 0.0
    for layer in range(t32.shape[0]):
        e_fl = np.abs(tfl[layer] - t32[layer]).mean()
        e_fu = np.abs(tfu[layer] - t32[layer]).mean()
        ratio = e_fu / max(e_fl, 1e-12)
        worst_ratio = max(worst_ratio, ratio)
        print(
            f"layer {layer:2d}: |flash-f32|={e_fl:.3e} "
            f"|fused-f32|={e_fu:.3e} ratio={ratio:.2f}"
        )
    ok = worst_ratio < 1.5 and np.isfinite(tfu).all()
    print(f"worst layer ratio fused/flash vs f32 truth: "
          f"{worst_ratio:.2f} ok={ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
