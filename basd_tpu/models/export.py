"""Reverse weight port: flax ViT params -> timm-layout torch checkpoint.

The reference ecosystem consumes plain ``{epoch, model_state_dict}``
``.pth`` files with timm ``VisionTransformer`` key names (reference
``src/training/trainer.py:105-111`` writes them, ``src/eval.py:29-31``
loads them). This module inverts ``models.port.vit_params_from_torch``
exactly, so a student distilled here can be evaluated or fine-tuned by
the reference's own torch tooling — key names are validated against the
same vendored real-checkpoint manifests the import path is locked to,
and the roundtrip ``port(export(params)) == params`` is exact (tested).

CLI (console script ``basd-export``): rebuilds the student like
``basd-eval`` does, loads Orbax eval weights, writes the ``.pth``:

    basd-export experiment=... checkpoint.path=outputs/.../best_model_weights \
        +export.path=student.pth
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def _np(x) -> np.ndarray:
    """Leaf -> float32 numpy (bf16/f32 params embed exactly in f32)."""
    return np.asarray(x, dtype=np.float32)


def vit_state_dict_from_params(params: dict) -> dict:
    """Flax ViT params tree (scan-stacked blocks) -> timm state dict.

    Exact inverse of ``port.vit_params_from_torch``: stacked block leaves
    unstack along axis 0, Dense kernels transpose back to torch (out, in)
    convention, the patch-embed kernel refolds to (D, C, p, p) with the
    same (c, p1, p2) flatten order ``PatchEmbed`` uses, and LayerScale
    gammas emit the modern ``blocks.{i}.ls{1,2}.gamma`` naming.
    """
    blocks = params["blocks"]
    depth = int(np.asarray(blocks["norm1"]["scale"]).shape[0])
    sd: dict[str, np.ndarray] = {}

    sd["cls_token"] = _np(params["cls_token"])
    sd["pos_embed"] = _np(params["pos_embed"])

    pk = _np(params["patch_embed"]["proj"]["kernel"])  # (C*p*p, D)
    d_out = pk.shape[1]
    cpp = pk.shape[0]
    # refold (c, p1, p2): pick the in_chans whose patch side is a whole
    # square. Never ambiguous between 3 and 1 — cpp = 3*p² and cpp = q²
    # together force q² = 3p², impossible in integers — so divisibility
    # by 3 alone (which misfires on in_chans=1 with 3|p) is not trusted.
    for c in (3, 1):
        p = int(round((cpp / c) ** 0.5))
        if c * p * p == cpp:
            break
    else:
        raise ValueError(f"cannot refold patch kernel of {cpp} rows")
    sd["patch_embed.proj.weight"] = pk.T.reshape(d_out, c, p, p)
    sd["patch_embed.proj.bias"] = _np(params["patch_embed"]["proj"]["bias"])

    def unstack(tree_path: tuple, fmt: str, transform=lambda x: x):
        leaf = blocks
        for k in tree_path:
            leaf = leaf[k]
        arr = _np(leaf)
        for i in range(depth):
            sd[fmt.format(i=i)] = transform(arr[i])

    t = np.transpose
    unstack(("norm1", "scale"), "blocks.{i}.norm1.weight")
    unstack(("norm1", "bias"), "blocks.{i}.norm1.bias")
    unstack(("attn", "qkv", "kernel"), "blocks.{i}.attn.qkv.weight", t)
    unstack(("attn", "qkv", "bias"), "blocks.{i}.attn.qkv.bias")
    unstack(("attn", "proj", "kernel"), "blocks.{i}.attn.proj.weight", t)
    unstack(("attn", "proj", "bias"), "blocks.{i}.attn.proj.bias")
    unstack(("norm2", "scale"), "blocks.{i}.norm2.weight")
    unstack(("norm2", "bias"), "blocks.{i}.norm2.bias")
    unstack(("mlp", "fc1", "kernel"), "blocks.{i}.mlp.fc1.weight", t)
    unstack(("mlp", "fc1", "bias"), "blocks.{i}.mlp.fc1.bias")
    unstack(("mlp", "fc2", "kernel"), "blocks.{i}.mlp.fc2.weight", t)
    unstack(("mlp", "fc2", "bias"), "blocks.{i}.mlp.fc2.bias")
    if "ls1" in blocks:
        unstack(("ls1", "gamma"), "blocks.{i}.ls1.gamma")
        unstack(("ls2", "gamma"), "blocks.{i}.ls2.gamma")

    sd["norm.weight"] = _np(params["norm"]["scale"])
    sd["norm.bias"] = _np(params["norm"]["bias"])
    if "head" in params:
        sd["head.weight"] = _np(params["head"]["kernel"]).T
        sd["head.bias"] = _np(params["head"]["bias"])
    return sd


def save_torch_checkpoint(path, params: dict, epoch: int | None = None) -> int:
    """Write a reference-consumable ``{epoch, model_state_dict}`` .pth.

    Returns the number of tensors written."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in vit_state_dict_from_params(params).items()
    }
    payload = {"model_state_dict": sd}
    if epoch is not None:
        payload["epoch"] = int(epoch)
    torch.save(payload, str(path))
    return len(sd)


def main(argv: list[str] | None = None) -> None:
    import jax
    import jax.numpy as jnp

    from basd_tpu.config import compose, register_resolvers
    from basd_tpu.models import create_model, init_model
    from basd_tpu.utils.checkpoint import load_weights

    register_resolvers()
    config_dir = Path(__file__).parent.parent.parent / "configs"
    overrides = list(sys.argv[1:] if argv is None else argv)
    config = compose(config_dir, overrides=overrides)

    out_path = config.get("export", {}).get("path", "")
    if not out_path:
        raise SystemExit("pass +export.path=student.pth")
    if not config.checkpoint.path:
        raise SystemExit("checkpoint.path is required for basd-export")

    overrides_dict = (
        config.model.arch_overrides.to_dict()
        if hasattr(config.model.arch_overrides, "to_dict")
        else dict(config.model.arch_overrides or {})
    )
    bundle = create_model(
        config.model.student_preset,
        img_size=config.model.vit.img_size,
        num_classes=config.model.num_classes,
        arch_overrides=overrides_dict or None,
        dtype=jnp.bfloat16,
    )
    variables = init_model(bundle, jax.random.PRNGKey(config.run.seed),
                           config.model.vit.img_size)
    params, epoch = load_weights(config.checkpoint.path, variables["params"])
    n = save_torch_checkpoint(out_path, params, epoch)
    print(f"exported path={out_path} tensors={n} epoch={epoch}")


if __name__ == "__main__":
    main()
