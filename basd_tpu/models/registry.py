"""Model registry, metadata probing, and teacher/student factories.

Replaces the reference's timm/torch.hub auto-probing (reference:
``src/models/teacher.py:42-148``) with an explicit registry exposing the
same metadata surface (``embed_dim``, ``heads_per_layer``, ``depth``,
``mlp_ratio``, ``layer_paths``, ``attn_subpath``, ``has_cls_token``,
``feature_format``, ``num_tokens``, ``mean``, ``std``). Pretrained teacher
weights are ported from torch state dicts when a local checkpoint is
available (zero-egress environments cannot hit the timm/torch hubs);
otherwise teachers initialize randomly, which preserves every
computational property BASD exercises.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from basd_tpu.models.convnext import ConvNeXtConfig, ConvNeXtV2
from basd_tpu.models.resnet import ResNet, ResNetConfig
from basd_tpu.models.vit import ViTConfig, VisionTransformer

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)

# -- presets ---------------------------------------------------------------

_VIT_PRESETS: dict[str, dict] = {
    "deit_tiny_patch16_224": dict(embed_dim=192, depth=12, num_heads=3,
                                  mlp_ratio=4.0, patch_size=16),
    "deit_small_patch16_224": dict(embed_dim=384, depth=12, num_heads=6,
                                   mlp_ratio=4.0, patch_size=16),
    "deit_base_patch16_224": dict(embed_dim=768, depth=12, num_heads=12,
                                  mlp_ratio=4.0, patch_size=16),
    "vit_large_patch16_224": dict(embed_dim=1024, depth=24, num_heads=16,
                                  mlp_ratio=4.0, patch_size=16),
    "dinov2_vitb14": dict(embed_dim=768, depth=12, num_heads=12,
                          mlp_ratio=4.0, patch_size=14, layerscale_init=1e-5),
    "dinov2_vitl14": dict(embed_dim=1024, depth=24, num_heads=16,
                          mlp_ratio=4.0, patch_size=14, layerscale_init=1e-5),
    "dinov2_vits14": dict(embed_dim=384, depth=12, num_heads=6,
                          mlp_ratio=4.0, patch_size=14, layerscale_init=1e-5),
    # common timm ViT presets (same trunk family as DeiT; timm names)
    "vit_small_patch16_224": dict(embed_dim=384, depth=12, num_heads=6,
                                  mlp_ratio=4.0, patch_size=16),
    "vit_base_patch16_224": dict(embed_dim=768, depth=12, num_heads=12,
                                 mlp_ratio=4.0, patch_size=16),
    # DeiT-III family (Touvron et al. 2022): LayerScale init 1e-6
    "deit3_small_patch16_224": dict(embed_dim=384, depth=12, num_heads=6,
                                    mlp_ratio=4.0, patch_size=16,
                                    layerscale_init=1e-6),
    "deit3_base_patch16_224": dict(embed_dim=768, depth=12, num_heads=12,
                                   mlp_ratio=4.0, patch_size=16,
                                   layerscale_init=1e-6),
    "deit3_large_patch16_224": dict(embed_dim=1024, depth=24, num_heads=16,
                                    mlp_ratio=4.0, patch_size=16,
                                    layerscale_init=1e-6),
}

_CNN_PRESETS: dict[str, dict] = {
    "convnextv2_tiny.fcmae": dict(kind="convnext", depths=(3, 3, 9, 3),
                                  dims=(96, 192, 384, 768)),
    "convnextv2_tiny": dict(kind="convnext", depths=(3, 3, 9, 3),
                            dims=(96, 192, 384, 768)),
    "resnet50": dict(kind="resnet", stage_sizes=(3, 4, 6, 3), width=64),
}


def available_models() -> list[str]:
    return sorted([*_VIT_PRESETS, *_CNN_PRESETS])


@dataclass(frozen=True)
class ModelBundle:
    """A model definition + metadata (the reference's ``TeacherModel``
    NamedTuple analogue, ``src/models/teacher.py:9-20``)."""

    name: str
    module: Any
    cfg: Any
    info: dict
    mean: tuple[float, ...] = _IMAGENET_MEAN
    std: tuple[float, ...] = _IMAGENET_STD


def _vit_info(cfg: ViTConfig) -> dict:
    """Metadata matching reference ``probe_model`` (``teacher.py:42-110``)."""
    return {
        "embed_dim": cfg.embed_dim,
        "heads_per_layer": [cfg.num_heads] * cfg.depth,
        "depth": cfg.depth,
        "mlp_ratio": cfg.mlp_ratio,
        "layer_paths": [f"blocks.{i}" for i in range(cfg.depth)],
        "attn_subpath": "attn",
        "has_cls_token": cfg.use_cls_token,
        "feature_format": "token",
        "num_tokens": cfg.num_tokens,
    }


def _cnn_info(name: str, cfg, img_size: int) -> dict:
    if isinstance(cfg, ConvNeXtConfig):
        depth = len(cfg.depths)
        layer_paths = [f"stages.{i}" for i in range(depth)]
        mlp_ratio = 4.0
    else:
        depth = len(cfg.stage_sizes)
        layer_paths = [f"layer{i + 1}" for i in range(depth)]
        mlp_ratio = 0.0
    # stem /4, then /2 per subsequent stage (32 for the standard 4-stage
    # layouts; correct for custom stage counts too)
    reduction = 4 * 2 ** (depth - 1)
    n = (img_size // reduction) ** 2
    return {
        "embed_dim": cfg.embed_dim,
        "heads_per_layer": [1],  # synthetic single head (teacher.py:96-98)
        "depth": depth,
        "mlp_ratio": mlp_ratio,
        "layer_paths": layer_paths,
        "attn_subpath": None,
        "has_cls_token": False,
        "feature_format": "nhwc",
        "num_tokens": n,
    }


def create_model(
    name: str,
    *,
    img_size: int,
    num_classes: int = 0,
    drop_path_rate: float = 0.0,
    arch_overrides: dict | None = None,
    importance_mode: Optional[str] = None,
    remat: bool = False,
    remat_policy=None,
    collect_alias: bool = False,
    attention_impl: str = "auto",
    mlp_impl: str = "auto",
    dtype=jnp.float32,
) -> ModelBundle:
    """Build a model by preset name (the reference's
    ``timm.create_model`` + ``probe_model`` in one step).

    ``attention_impl`` / ``mlp_impl`` select the block kernel dispatch
    for ViT models (see ``models.layers.Block``); CNNs ignore them."""
    if name in _VIT_PRESETS:
        preset = dict(_VIT_PRESETS[name])
        patch = preset.pop("patch_size")
        ls = preset.pop("layerscale_init", None)
        cfg = ViTConfig(
            img_size=img_size,
            patch_size=patch,
            num_classes=num_classes,
            drop_path_rate=drop_path_rate,
            layerscale_init=ls,
            name=name,
            **preset,
        ).with_overrides(arch_overrides)
        module = VisionTransformer(
            cfg, importance_mode=importance_mode, remat=remat,
            remat_policy=remat_policy, collect_alias=collect_alias,
            attention_impl=attention_impl, mlp_impl=mlp_impl,
            dtype=dtype
        )
        return ModelBundle(name, module, cfg, _vit_info(cfg))
    if name in _CNN_PRESETS:
        preset = dict(_CNN_PRESETS[name])
        kind = preset.pop("kind")
        if kind == "convnext":
            ccfg = ConvNeXtConfig(name=name, **preset)
            module = ConvNeXtV2(ccfg, dtype=dtype)
        else:
            ccfg = ResNetConfig(name=name, **preset)
            module = ResNet(ccfg, dtype=dtype)
        return ModelBundle(name, module, ccfg, _cnn_info(name, ccfg, img_size))
    # Unlisted name: build a custom model from explicit arch kwargs. This
    # is the registry's replacement for the reference's universal
    # ``probe_model`` reflection (``src/models/teacher.py:42-110``) — any
    # ViT-shaped model can be declared by its architecture facts, and any
    # ConvNeXt/ResNet-shaped CNN by its stage layout (kind= selects),
    # instead of runtime-probing a torch module.
    ov = dict(arch_overrides or {})
    kind = ov.pop("kind", "vit")
    if kind == "convnext":
        required_cnn = ("depths", "dims")
        if not all(k in ov for k in required_cnn):
            raise KeyError(
                f"custom convnext {name!r} needs arch kwargs {required_cnn}"
            )
        ccfg = ConvNeXtConfig(
            name=name, depths=tuple(ov["depths"]), dims=tuple(ov["dims"])
        )
        module = ConvNeXtV2(ccfg, dtype=dtype)
        return ModelBundle(name, module, ccfg, _cnn_info(name, ccfg, img_size))
    if kind == "resnet":
        if "stage_sizes" not in ov:
            raise KeyError(
                f"custom resnet {name!r} needs arch kwarg 'stage_sizes'"
            )
        ccfg = ResNetConfig(
            name=name,
            stage_sizes=tuple(ov["stage_sizes"]),
            width=int(ov.get("width", 64)),
        )
        module = ResNet(ccfg, dtype=dtype)
        return ModelBundle(name, module, ccfg, _cnn_info(name, ccfg, img_size))
    required = ("embed_dim", "depth", "num_heads")
    if kind == "vit" and all(k in ov for k in required):
        cfg = ViTConfig(
            img_size=img_size,
            patch_size=int(ov.pop("patch_size", 16)),
            num_classes=num_classes,
            drop_path_rate=drop_path_rate,
            layerscale_init=ov.pop("layerscale_init", None),
            name=name,
            mlp_ratio=float(ov.pop("mlp_ratio", 4.0)),
            **{k: ov[k] for k in ov},
        )
        module = VisionTransformer(
            cfg, importance_mode=importance_mode, remat=remat,
            remat_policy=remat_policy, collect_alias=collect_alias,
            attention_impl=attention_impl, mlp_impl=mlp_impl,
            dtype=dtype
        )
        return ModelBundle(name, module, cfg, _vit_info(cfg))
    raise KeyError(
        f"unknown model preset {name!r} (and arch_overrides lacks "
        f"{required} for a custom ViT; use kind='convnext'/'resnet' with "
        f"stage kwargs for a custom CNN); available: {available_models()}"
    )


def probe(bundle: ModelBundle) -> dict:
    """API-parity alias for the reference's ``probe_model``."""
    return dict(bundle.info)


# -- init -----------------------------------------------------------------


def init_model(
    bundle: ModelBundle,
    key: jax.Array,
    img_size: int,
    *,
    fan_in_init: bool = False,
) -> dict:
    """Initialize parameters; optionally re-init with the reference's
    fan-in scheme (``src/train.py:19-32``)."""
    dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = bundle.module.init(
        {"params": key, "droppath": key}, dummy, deterministic=True
    )
    if fan_in_init:
        params = apply_fan_in_init(variables["params"], key)
        variables = {**variables, "params": params}
    return variables


def apply_fan_in_init(params, key: jax.Array):
    """Re-initialize Dense kernels with trunc-normal std sqrt(2/fan_in),
    biases/LN-bias to zero, LN scale to one; the patch-embed projection
    (a conv in the reference) uses conv fan-out std sqrt(2/(k*k*D))
    (reference: ``src/train.py:19-32``). cls_token/pos_embed keep their
    native init, as in the reference (it only touches
    Linear/LayerNorm/Conv2d modules)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    new_leaves = []
    for path, leaf in flat:
        names = [getattr(p, "key", str(p)) for p in path]
        pathstr = "/".join(str(n) for n in names)
        subkey = jax.random.fold_in(key, hash(pathstr) % (2**31))
        last = names[-1]
        if last == "kernel" and leaf.ndim >= 2:
            if "patch_embed" in pathstr:
                # conv fan_out = kernel_area * out_channels; kernel is
                # (p*p*C, D) with C=3
                fan_out = (leaf.shape[-2] // 3) * leaf.shape[-1]
                std = (2.0 / fan_out) ** 0.5
            else:
                std = (2.0 / leaf.shape[-2]) ** 0.5
            new_leaves.append(
                std * jax.random.normal(subkey, leaf.shape, leaf.dtype)
            )
        elif last == "bias":
            new_leaves.append(jnp.zeros_like(leaf))
        elif last == "scale":  # LayerNorm weight
            new_leaves.append(jnp.ones_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# -- teacher/student assembly ---------------------------------------------


def load_teacher(
    model_name: str,
    img_size: int,
    *,
    seed: int = 0,
    checkpoint_path: str | None = None,
    dtype=jnp.bfloat16,
    arch_overrides: dict | None = None,
    attention_impl: str = "auto",
) -> tuple[ModelBundle, dict]:
    """Build the frozen teacher (reference: ``load_teacher``,
    ``src/models/teacher.py:113-148``). Returns (bundle, variables).

    ``checkpoint_path`` may point to a torch state-dict file (``.pth``) to
    port pretrained weights; otherwise the teacher is randomly
    initialized (no hub access in zero-egress environments).
    ``arch_overrides`` declares an unlisted teacher by explicit arch
    kwargs (``basd.teacher_arch`` in config): ViT facts, or
    kind='convnext'/'resnet' stage kwargs for a custom CNN. When an
    unlisted teacher comes WITH a checkpoint, its architecture is derived
    from the state dict's shapes (``port.derive_arch_from_state_dict`` —
    the reference's ``probe_model`` reflection, ``teacher.py:42-110``,
    recast over the artifact a zero-egress environment actually has);
    explicit ``arch_overrides`` entries win over derived facts.
    """
    ov = dict(arch_overrides or {})
    sd = None
    unlisted = model_name not in _VIT_PRESETS and model_name not in _CNN_PRESETS
    if checkpoint_path and unlisted:
        from basd_tpu.models.port import (
            _load_state_dict,
            derive_arch_from_state_dict,
        )

        sd = _load_state_dict(checkpoint_path)
        ov = derive_arch_from_state_dict(sd, declared=ov)
        arch_overrides = ov
        print(
            f"teacher_arch_derived model={model_name} "
            + " ".join(f"{k}={v}" for k, v in sorted(ov.items()))
        )
    is_vit = model_name in _VIT_PRESETS or (
        model_name not in _CNN_PRESETS and ov.get("kind", "vit") == "vit"
    )
    bundle = create_model(
        model_name,
        img_size=img_size,
        num_classes=0,
        arch_overrides=arch_overrides,
        importance_mode="cls" if is_vit else None,
        # frozen-teacher fast path: per-layer tokens collected through an
        # aliased carried stack (no unrolled-scan concatenate); the
        # module falls back to scan-with-collect when remat'd
        collect_alias=is_vit,
        attention_impl=attention_impl,
        dtype=dtype,
    )
    variables = init_model(bundle, jax.random.PRNGKey(seed), img_size)
    if checkpoint_path:
        from basd_tpu.models.port import port_torch_checkpoint

        variables = port_torch_checkpoint(
            checkpoint_path, bundle, variables, sd=sd
        )
    print(
        f"teacher_loaded model={model_name} embed_dim={bundle.info['embed_dim']} "
        f"depth={bundle.info['depth']} heads_per_layer={bundle.info['heads_per_layer']} "
        f"mlp_ratio={bundle.info['mlp_ratio']:.1f} "
        f"feature_format={bundle.info['feature_format']} "
        f"has_cls={bundle.info['has_cls_token']} "
        f"attn_subpath={bundle.info['attn_subpath']} "
        f"mean={bundle.mean} std={bundle.std}"
    )
    return bundle, variables


def teacher_extract(bundle: ModelBundle, variables: dict, x: jnp.ndarray,
                    collection_init=None):
    """Per-layer tokens + reduced attention importance for the teacher —
    the reference's ``extract_intermediates`` (``teacher.py:180-216``).

    Returns (tokens, importance (L, B, N)). For ViT teachers built with
    ``collect_alias`` the tokens are a ``models.tokens.PackedTokens``
    (flat stack + CLS slab — the selector/loss consume it copy-free;
    ``to_dense()`` recovers the reference-shaped (L, B, N, D) strip);
    otherwise a dense (L, B, N, D) array. CNN teachers yield L=1 with
    uniform importance (``teacher.py:184-191``).

    ``collection_init``: optional (L*B*N, D) buffer seeding the aliased
    collection stack (fully overwritten; pass the previous step's
    ``tokens.flat`` donated to skip the zeros init — see Trainer).
    """
    if collection_init is not None:
        out = bundle.module.apply(
            variables, x, deterministic=True,
            collection_init=collection_init,
        )
    else:
        out = bundle.module.apply(variables, x, deterministic=True)
    if bundle.info["feature_format"] == "token":
        return out["tokens"], out["importance"]
    feats = out["features"]
    b, h, w, c = feats.shape
    tokens = feats.reshape(b, h * w, c)[None]  # (1, B, N, C)
    importance = jnp.full((1, b, h * w), 1.0 / (h * w), jnp.float32)
    return tokens, importance


def derive_student_arch(teacher_info: dict, intrinsic_dim: int) -> dict:
    """Student auto-sizing from teacher intrinsic dimensionality
    (reference: ``_derive_from_teacher``, ``src/train.py:57-66``)."""
    head_dim = teacher_info["embed_dim"] // teacher_info["heads_per_layer"][0]
    d_s = -(-intrinsic_dim // head_dim) * head_dim  # ceil to head_dim
    d_s = min(d_s, teacher_info["embed_dim"])
    return {
        "embed_dim": d_s,
        "depth": teacher_info["depth"],
        "num_heads": d_s // head_dim,
        "mlp_ratio": teacher_info["mlp_ratio"],
    }


def estimate_intrinsic_dim(
    bundle: ModelBundle, variables: dict, images: jnp.ndarray
) -> int:
    """MP rank of last-layer teacher tokens over calibration images
    (reference: ``estimate_intrinsic_dim``, ``teacher.py:161-177``)."""
    from basd_tpu.models.tokens import PackedTokens
    from basd_tpu.ops.mp_rank import marchenko_pastur_rank

    tokens, _ = teacher_extract(bundle, variables, images)
    if isinstance(tokens, PackedTokens):
        tokens = tokens.to_dense()  # one-shot calibration: off hot path
    flat = tokens[-1].reshape(-1, tokens.shape[-1]).astype(jnp.float32)
    return int(marchenko_pastur_rank(flat))
