"""Port torch state dicts (timm / dinov2 / torchvision layouts) into
basd_tpu flax parameter trees.

The reference pulls pretrained teachers from timm / torch.hub at runtime
(reference: ``src/models/teacher.py:113-120``); in air-gapped TPU
environments the same weights arrive as local ``.pth`` files and are
converted here. Scanned ViT blocks stack per-layer tensors on axis 0.
"""

from __future__ import annotations

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def _load_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items()}


def derive_arch_from_state_dict(sd: dict, declared: dict | None = None) -> dict:
    """Architecture facts from a torch state dict's tensor shapes.

    The reference's ``probe_model`` reflects over a *live* torch module
    (``src/models/teacher.py:42-110``: embed_dim attr, block container,
    heads, fc1 width, cls token). In a zero-egress environment the
    artifact that actually exists is the checkpoint, so the same facts
    are derived from its shapes instead — letting an UNLISTED teacher
    checkpoint load without hand-declared ``basd.teacher_arch``:

    - ViT (timm/dinov2 layout): embed_dim + patch_size from
      ``patch_embed.proj.weight`` (D, C, p, p); depth = #blocks;
      mlp_ratio = fc1_out / D; LayerScale from ``ls1.gamma``/``gamma_1``
      keys; cls token from key presence. ``num_heads`` is the one fact a
      fused qkv's shapes cannot encode — the ubiquitous head_dim=64
      convention is used when it divides D (every timm/deit/dinov2 ViT),
      otherwise declare ``basd.teacher_arch.num_heads``.
    - ConvNeXtV2: depths from per-stage block counts, dims from each
      stage's depthwise-conv channel count.
    - ResNet (bottleneck): stage_sizes from ``layer{i}.{b}`` counts,
      width from the stem conv's output channels.

    ``declared`` entries (the user's explicit ``basd.teacher_arch``)
    always win over derived values.
    """
    declared = dict(declared or {})

    def block_count(prefix: str) -> int:
        import re

        idx = [
            int(m.group(1))
            for k in sd
            if (m := re.match(rf"{prefix}\.(\d+)\.", k))
        ]
        return max(idx) + 1 if idx else 0

    if "patch_embed.proj.weight" in sd and "blocks.0.norm1.weight" in sd:
        d, _c, p, _ = sd["patch_embed.proj.weight"].shape
        d = int(d)
        arch: dict = {
            "kind": "vit",
            "embed_dim": d,
            "depth": block_count("blocks"),
            "patch_size": int(p),
            "mlp_ratio": float(sd["blocks.0.mlp.fc1.weight"].shape[0]) / d,
            "use_cls_token": "cls_token" in sd,
        }
        if "blocks.0.ls1.gamma" in sd or "blocks.0.gamma_1" in sd:
            # init value is irrelevant — the port overwrites the gammas;
            # non-None simply materializes the LayerScale params.
            arch["layerscale_init"] = 1e-5
        if "num_heads" not in declared:
            for head_dim in (64, 48, 32, 96, 128):
                if d % head_dim == 0:
                    arch["num_heads"] = d // head_dim
                    break
            else:
                raise ValueError(
                    f"cannot infer num_heads for embed_dim={d}; declare "
                    "basd.teacher_arch.num_heads"
                )
    elif "stem.0.weight" in sd and "stages.0.blocks.0.conv_dw.weight" in sd:
        n_stages = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("stages.")
        )
        depths = tuple(
            block_count(f"stages.{si}.blocks") for si in range(n_stages)
        )
        dims = tuple(
            int(sd[f"stages.{si}.blocks.0.conv_dw.weight"].shape[0])
            for si in range(n_stages)
        )
        arch = {"kind": "convnext", "depths": depths, "dims": dims}
    elif "conv1.weight" in sd and "layer1.0.conv1.weight" in sd:
        sizes = []
        si = 1
        while f"layer{si}.0.conv1.weight" in sd:
            sizes.append(block_count(f"layer{si}"))
            si += 1
        arch = {
            "kind": "resnet",
            "stage_sizes": tuple(sizes),
            "width": int(sd["conv1.weight"].shape[0]),
        }
    else:
        raise ValueError(
            "unrecognized state-dict layout: expected timm/dinov2 ViT "
            "(patch_embed.proj + blocks.*), ConvNeXtV2 (stem + stages.*), "
            "or ResNet (conv1 + layer*) keys"
        )
    arch.update(declared)
    return arch


def interpolate_pos_embed(
    pos: np.ndarray, target_tokens: int, has_cls: bool = True
) -> np.ndarray:
    """Bicubic-free bilinear resize of the patch position grid (CLS slot
    preserved when present), for porting checkpoints trained at a
    different image size (e.g. dinov2's 518px grid onto a 224px model)."""
    n_src = pos.shape[1] - (1 if has_cls else 0)
    if n_src == target_tokens:
        return pos
    import jax
    import jax.numpy as jnp

    side_src = int(round(n_src**0.5))
    side_dst = int(round(target_tokens**0.5))
    if has_cls:
        cls_slot, grid = pos[:, :1], pos[:, 1:]
    else:
        cls_slot, grid = pos[:, :0], pos
    grid = grid.reshape(1, side_src, side_src, -1)
    resized = jax.image.resize(
        jnp.asarray(grid), (1, side_dst, side_dst, grid.shape[-1]), "linear"
    )
    resized = np.asarray(resized).reshape(1, side_dst * side_dst, -1)
    return np.concatenate([cls_slot, resized], axis=1)


def vit_params_from_torch(
    sd: dict, depth: int, has_layerscale: bool, target_tokens: int | None = None
) -> dict:
    """timm/dinov2 VisionTransformer state dict -> flax params tree."""

    def stack(fmt: str, transform=lambda x: x):
        return np.stack([transform(_t(sd[fmt.format(i=i)])) for i in range(depth)])

    d_out = _t(sd["patch_embed.proj.weight"]).shape[0]
    blocks = {
        "norm1": {
            "scale": stack("blocks.{i}.norm1.weight"),
            "bias": stack("blocks.{i}.norm1.bias"),
        },
        "attn": {
            "qkv": {
                "kernel": stack("blocks.{i}.attn.qkv.weight", lambda w: w.T),
                "bias": stack("blocks.{i}.attn.qkv.bias"),
            },
            "proj": {
                "kernel": stack("blocks.{i}.attn.proj.weight", lambda w: w.T),
                "bias": stack("blocks.{i}.attn.proj.bias"),
            },
        },
        "norm2": {
            "scale": stack("blocks.{i}.norm2.weight"),
            "bias": stack("blocks.{i}.norm2.bias"),
        },
        "mlp": {
            "fc1": {
                "kernel": stack("blocks.{i}.mlp.fc1.weight", lambda w: w.T),
                "bias": stack("blocks.{i}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": stack("blocks.{i}.mlp.fc2.weight", lambda w: w.T),
                "bias": stack("blocks.{i}.mlp.fc2.bias"),
            },
        },
    }
    if has_layerscale:
        ls1_key = (
            "blocks.{i}.ls1.gamma"
            if "blocks.0.ls1.gamma" in sd
            else "blocks.{i}.gamma_1"  # older dinov2 naming
        )
        ls2_key = ls1_key.replace("ls1", "ls2").replace("gamma_1", "gamma_2")
        blocks["ls1"] = {"gamma": stack(ls1_key)}
        blocks["ls2"] = {"gamma": stack(ls2_key)}

    conv = _t(sd["patch_embed.proj.weight"])  # (D, C, p, p)
    has_cls = "cls_token" in sd
    pos = _t(sd["pos_embed"])
    if target_tokens is not None:
        pos = interpolate_pos_embed(pos, target_tokens, has_cls=has_cls)
    params = {
        "pos_embed": pos,
        "patch_embed": {
            "proj": {
                # flatten (c, p1, p2) to match PatchEmbed's rearrange order
                "kernel": conv.reshape(d_out, -1).T,
                "bias": _t(sd["patch_embed.proj.bias"]),
            }
        },
        "blocks": blocks,
        "norm": {"scale": _t(sd["norm.weight"]), "bias": _t(sd["norm.bias"])},
    }
    if has_cls:
        params["cls_token"] = _t(sd["cls_token"])
    if "head.weight" in sd:
        params["head"] = {
            "kernel": _t(sd["head.weight"]).T,
            "bias": _t(sd["head.bias"]),
        }
    return params


def _conv(w) -> np.ndarray:
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return _t(w).transpose(2, 3, 1, 0)


def convnext_params_from_torch(sd: dict, depths: tuple[int, ...]) -> tuple[dict, dict]:
    """timm ConvNeXtV2 state dict -> (params, {}) for ConvNeXtV2."""
    params: dict = {
        "stem_conv": {
            "kernel": _conv(sd["stem.0.weight"]),
            "bias": _t(sd["stem.0.bias"]),
        },
        "stem_norm": {"scale": _t(sd["stem.1.weight"]), "bias": _t(sd["stem.1.bias"])},
    }
    for si, depth in enumerate(depths):
        if si > 0:
            params[f"downsample_norm{si}"] = {
                "scale": _t(sd[f"stages.{si}.downsample.0.weight"]),
                "bias": _t(sd[f"stages.{si}.downsample.0.bias"]),
            }
            params[f"downsample_conv{si}"] = {
                "kernel": _conv(sd[f"stages.{si}.downsample.1.weight"]),
                "bias": _t(sd[f"stages.{si}.downsample.1.bias"]),
            }
        for bi in range(depth):
            pre = f"stages.{si}.blocks.{bi}"
            grn_w = (
                f"{pre}.mlp.grn.weight" if f"{pre}.mlp.grn.weight" in sd else f"{pre}.grn.weight"
            )
            grn_b = grn_w.replace("weight", "bias")
            fc1 = f"{pre}.mlp.fc1" if f"{pre}.mlp.fc1.weight" in sd else f"{pre}.pwconv1"
            fc2 = f"{pre}.mlp.fc2" if f"{pre}.mlp.fc2.weight" in sd else f"{pre}.pwconv2"
            params[f"stage{si}_block{bi}"] = {
                "dwconv": {
                    "kernel": _conv(sd[f"{pre}.conv_dw.weight"]),
                    "bias": _t(sd[f"{pre}.conv_dw.bias"]),
                },
                "norm": {
                    "scale": _t(sd[f"{pre}.norm.weight"]),
                    "bias": _t(sd[f"{pre}.norm.bias"]),
                },
                "pwconv1": {
                    "kernel": _t(sd[f"{fc1}.weight"]).T,
                    "bias": _t(sd[f"{fc1}.bias"]),
                },
                "grn": {
                    "gamma": _t(sd[grn_w]).reshape(-1),
                    "beta": _t(sd[grn_b]).reshape(-1),
                },
                "pwconv2": {
                    "kernel": _t(sd[f"{fc2}.weight"]).T,
                    "bias": _t(sd[f"{fc2}.bias"]),
                },
            }
    return params, {}


def resnet_params_from_torch(
    sd: dict, stage_sizes: tuple[int, ...]
) -> tuple[dict, dict]:
    """torchvision/timm ResNet state dict -> (params, batch_stats)."""
    params: dict = {
        "stem_conv": {"kernel": _conv(sd["conv1.weight"])},
        "stem_bn": {"scale": _t(sd["bn1.weight"]), "bias": _t(sd["bn1.bias"])},
    }
    stats: dict = {
        "stem_bn": {
            "mean": _t(sd["bn1.running_mean"]),
            "var": _t(sd["bn1.running_var"]),
        }
    }
    for si, num_blocks in enumerate(stage_sizes):
        for bi in range(num_blocks):
            pre = f"layer{si + 1}.{bi}"
            name = f"layer{si + 1}_block{bi}"
            p = {}
            s = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = {"kernel": _conv(sd[f"{pre}.conv{ci}.weight"])}
                p[f"bn{ci}"] = {
                    "scale": _t(sd[f"{pre}.bn{ci}.weight"]),
                    "bias": _t(sd[f"{pre}.bn{ci}.bias"]),
                }
                s[f"bn{ci}"] = {
                    "mean": _t(sd[f"{pre}.bn{ci}.running_mean"]),
                    "var": _t(sd[f"{pre}.bn{ci}.running_var"]),
                }
            if f"{pre}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{pre}.downsample.0.weight"])
                }
                p["downsample_bn"] = {
                    "scale": _t(sd[f"{pre}.downsample.1.weight"]),
                    "bias": _t(sd[f"{pre}.downsample.1.bias"]),
                }
                s["downsample_bn"] = {
                    "mean": _t(sd[f"{pre}.downsample.1.running_mean"]),
                    "var": _t(sd[f"{pre}.downsample.1.running_var"]),
                }
            params[name] = p
            stats[name] = s
    return params, stats


def port_torch_checkpoint(
    path: str, bundle, variables: dict, sd: dict | None = None
) -> dict:
    """Load a torch checkpoint into ``variables`` for the given bundle.
    ``sd`` short-circuits the file read when the caller already loaded the
    state dict (e.g. for arch derivation)."""
    import jax

    if sd is None:
        sd = _load_state_dict(path)
    kind = type(bundle.module).__name__
    if kind == "VisionTransformer":
        params = vit_params_from_torch(
            sd,
            bundle.cfg.depth,
            bundle.cfg.layerscale_init is not None,
            target_tokens=bundle.cfg.num_tokens,
        )
        # headless teachers (num_classes=0, the reference's
        # ``timm.create_model(num_classes=0)`` at ``teacher.py:118``) drop
        # the checkpoint's classification head.
        if "head" in params and "head" not in variables["params"]:
            del params["head"]
        new_vars = {**variables, "params": params}
    elif kind == "ConvNeXtV2":
        params, _ = convnext_params_from_torch(sd, bundle.cfg.depths)
        new_vars = {**variables, "params": params}
    else:
        params, stats = resnet_params_from_torch(sd, bundle.cfg.stage_sizes)
        new_vars = {**variables, "params": params, "batch_stats": stats}

    # structural check against the initialized tree
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
    new_shapes = jax.tree_util.tree_map(
        lambda x: tuple(x.shape), new_vars["params"]
    )
    if jax.tree_util.tree_structure(ref_shapes) != jax.tree_util.tree_structure(
        new_shapes
    ):
        raise ValueError(
            f"ported checkpoint structure does not match model {bundle.name}"
        )
    dtypes = jax.tree_util.tree_map(lambda x: x.dtype, variables["params"])
    new_vars = {
        **new_vars,
        "params": jax.tree_util.tree_map(
            lambda x, dt: jax.numpy.asarray(x, dt), new_vars["params"], dtypes
        ),
    }
    return new_vars
