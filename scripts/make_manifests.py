"""Emit key-name manifests of real torch checkpoint layouts.

These record the exact state-dict key names and shapes of the teacher
checkpoints the reference loads at runtime (``src/models/teacher.py:
113-120``): timm 1.0.24 `VisionTransformer`/`ConvNeXt` and the
facebookresearch/dinov2 hub models, plus torchvision ResNet-50. The
environment is air-gapped (no timm install, no hub), so the layouts are
transcribed from those libraries' module definitions; `tests/
test_port_and_data.py` builds synthetic state dicts from these manifests
and asserts `basd_tpu.models.port` consumes them without key drift.

Run: python scripts/make_manifests.py  (regenerates tests/fixtures/manifests)
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "manifests",
)


def vit_timm(embed_dim, depth, heads, img=224, patch=16, num_classes=1000,
             mlp_ratio=4.0):
    """timm VisionTransformer.state_dict() layout (timm 1.0.x)."""
    n = (img // patch) ** 2 + 1
    hidden = int(embed_dim * mlp_ratio)
    m = {
        "cls_token": [1, 1, embed_dim],
        "pos_embed": [1, n, embed_dim],
        "patch_embed.proj.weight": [embed_dim, 3, patch, patch],
        "patch_embed.proj.bias": [embed_dim],
    }
    for i in range(depth):
        p = f"blocks.{i}"
        m[f"{p}.norm1.weight"] = [embed_dim]
        m[f"{p}.norm1.bias"] = [embed_dim]
        m[f"{p}.attn.qkv.weight"] = [3 * embed_dim, embed_dim]
        m[f"{p}.attn.qkv.bias"] = [3 * embed_dim]
        m[f"{p}.attn.proj.weight"] = [embed_dim, embed_dim]
        m[f"{p}.attn.proj.bias"] = [embed_dim]
        m[f"{p}.norm2.weight"] = [embed_dim]
        m[f"{p}.norm2.bias"] = [embed_dim]
        m[f"{p}.mlp.fc1.weight"] = [hidden, embed_dim]
        m[f"{p}.mlp.fc1.bias"] = [hidden]
        m[f"{p}.mlp.fc2.weight"] = [embed_dim, hidden]
        m[f"{p}.mlp.fc2.bias"] = [embed_dim]
    m["norm.weight"] = [embed_dim]
    m["norm.bias"] = [embed_dim]
    if num_classes:
        m["head.weight"] = [num_classes, embed_dim]
        m["head.bias"] = [num_classes]
    return m


def vit_dinov2(embed_dim, depth, heads, img=518, patch=14):
    """facebookresearch/dinov2 hub DinoVisionTransformer.state_dict()."""
    n = (img // patch) ** 2 + 1  # 1370 for ViT-B/14 @ 518
    hidden = embed_dim * 4
    m = {
        "cls_token": [1, 1, embed_dim],
        "pos_embed": [1, n, embed_dim],
        "mask_token": [1, embed_dim],
        "patch_embed.proj.weight": [embed_dim, 3, patch, patch],
        "patch_embed.proj.bias": [embed_dim],
    }
    for i in range(depth):
        p = f"blocks.{i}"
        m[f"{p}.norm1.weight"] = [embed_dim]
        m[f"{p}.norm1.bias"] = [embed_dim]
        m[f"{p}.attn.qkv.weight"] = [3 * embed_dim, embed_dim]
        m[f"{p}.attn.qkv.bias"] = [3 * embed_dim]
        m[f"{p}.attn.proj.weight"] = [embed_dim, embed_dim]
        m[f"{p}.attn.proj.bias"] = [embed_dim]
        m[f"{p}.ls1.gamma"] = [embed_dim]
        m[f"{p}.norm2.weight"] = [embed_dim]
        m[f"{p}.norm2.bias"] = [embed_dim]
        m[f"{p}.mlp.fc1.weight"] = [hidden, embed_dim]
        m[f"{p}.mlp.fc1.bias"] = [hidden]
        m[f"{p}.mlp.fc2.weight"] = [embed_dim, hidden]
        m[f"{p}.mlp.fc2.bias"] = [embed_dim]
        m[f"{p}.ls2.gamma"] = [embed_dim]
    m["norm.weight"] = [embed_dim]
    m["norm.bias"] = [embed_dim]
    return m


def convnextv2_timm(depths, dims, num_classes=1000):
    """timm ConvNeXt(V2).state_dict() layout (use_grn=True, conv_mlp=False:
    GRN weight/bias are channels-last (1, 1, 1, 4C))."""
    m = {
        "stem.0.weight": [dims[0], 3, 4, 4],
        "stem.0.bias": [dims[0]],
        "stem.1.weight": [dims[0]],
        "stem.1.bias": [dims[0]],
    }
    for s, (depth, c) in enumerate(zip(depths, dims)):
        if s > 0:
            m[f"stages.{s}.downsample.0.weight"] = [dims[s - 1]]
            m[f"stages.{s}.downsample.0.bias"] = [dims[s - 1]]
            m[f"stages.{s}.downsample.1.weight"] = [c, dims[s - 1], 2, 2]
            m[f"stages.{s}.downsample.1.bias"] = [c]
        for b in range(depth):
            p = f"stages.{s}.blocks.{b}"
            m[f"{p}.conv_dw.weight"] = [c, 1, 7, 7]
            m[f"{p}.conv_dw.bias"] = [c]
            m[f"{p}.norm.weight"] = [c]
            m[f"{p}.norm.bias"] = [c]
            m[f"{p}.mlp.fc1.weight"] = [4 * c, c]
            m[f"{p}.mlp.fc1.bias"] = [4 * c]
            m[f"{p}.mlp.grn.weight"] = [1, 1, 1, 4 * c]
            m[f"{p}.mlp.grn.bias"] = [1, 1, 1, 4 * c]
            m[f"{p}.mlp.fc2.weight"] = [c, 4 * c]
            m[f"{p}.mlp.fc2.bias"] = [c]
    m["norm_pre.weight"] = [dims[-1]]  # Identity in v2; absent some cfgs
    m["norm_pre.bias"] = [dims[-1]]
    m["head.norm.weight"] = [dims[-1]]
    m["head.norm.bias"] = [dims[-1]]
    if num_classes:
        m["head.fc.weight"] = [num_classes, dims[-1]]
        m["head.fc.bias"] = [num_classes]
    return m


def resnet50_torchvision(num_classes=1000):
    """torchvision resnet50().state_dict() layout."""
    m = {
        "conv1.weight": [64, 3, 7, 7],
        "bn1.weight": [64], "bn1.bias": [64],
        "bn1.running_mean": [64], "bn1.running_var": [64],
        "bn1.num_batches_tracked": [],
    }
    stage_sizes = (3, 4, 6, 3)
    widths = (64, 128, 256, 512)
    in_c = 64
    for s, (blocks, w) in enumerate(zip(stage_sizes, widths)):
        out_c = w * 4
        for b in range(blocks):
            p = f"layer{s + 1}.{b}"
            stride_in = in_c if b == 0 else out_c
            m[f"{p}.conv1.weight"] = [w, stride_in, 1, 1]
            m[f"{p}.conv2.weight"] = [w, w, 3, 3]
            m[f"{p}.conv3.weight"] = [out_c, w, 1, 1]
            for ci, cc in ((1, w), (2, w), (3, out_c)):
                m[f"{p}.bn{ci}.weight"] = [cc]
                m[f"{p}.bn{ci}.bias"] = [cc]
                m[f"{p}.bn{ci}.running_mean"] = [cc]
                m[f"{p}.bn{ci}.running_var"] = [cc]
                m[f"{p}.bn{ci}.num_batches_tracked"] = []
            if b == 0:
                m[f"{p}.downsample.0.weight"] = [out_c, stride_in, 1, 1]
                m[f"{p}.downsample.1.weight"] = [out_c]
                m[f"{p}.downsample.1.bias"] = [out_c]
                m[f"{p}.downsample.1.running_mean"] = [out_c]
                m[f"{p}.downsample.1.running_var"] = [out_c]
                m[f"{p}.downsample.1.num_batches_tracked"] = []
        in_c = out_c
    m["fc.weight"] = [num_classes, 2048]
    m["fc.bias"] = [num_classes]
    return m


MANIFESTS = {
    "deit_tiny_patch16_224": vit_timm(192, 12, 3),
    "deit_small_patch16_224": vit_timm(384, 12, 6),
    "vit_large_patch16_224": vit_timm(1024, 24, 16),
    "dinov2_vitb14": vit_dinov2(768, 12, 12),
    "convnextv2_tiny": convnextv2_timm((3, 3, 9, 3), (96, 192, 384, 768)),
    "resnet50": resnet50_torchvision(),
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, manifest in MANIFESTS.items():
        path = os.path.join(OUT, f"{name}.json")
        with open(path, "w") as f:
            json.dump(manifest, f, indent=1)
        print(f"wrote {path} ({len(manifest)} keys)")


if __name__ == "__main__":
    main()
