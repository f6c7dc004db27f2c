"""Model layer tests: shapes, scan collection, and torch forward parity
through the weight-port path."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from basd_tpu.models import (
    available_models,
    create_model,
    derive_student_arch,
    init_model,
    probe,
    teacher_extract,
)
from basd_tpu.models.port import vit_params_from_torch

RNG = np.random.default_rng(11)


# ---------------------------------------------------------------- torch oracle


class _TorchBlock(nn.Module):
    """timm-semantics ViT block (pre-LN, fused qkv, exact GELU)."""

    def __init__(self, d, h, mlp_ratio):
        super().__init__()
        self.h = h
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.fc1 = nn.Linear(d, int(d * mlp_ratio))
        self.fc2 = nn.Linear(int(d * mlp_ratio), d)

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.h
        y = self.norm1(x)
        qkv = self.qkv(y).reshape(b, n, 3, self.h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd**-0.5
        probs = attn.softmax(dim=-1)
        y = (probs @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.proj(y)
        x = x + self.fc2(nn.functional.gelu(self.norm2(x) @ self.fc1.weight.T + self.fc1.bias))
        return x, probs


class _TorchViT(nn.Module):
    def __init__(self, img, patch, d, depth, h, mlp_ratio, num_classes):
        super().__init__()
        n = (img // patch) ** 2
        self.patch = patch
        self.proj = nn.Conv2d(3, d, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.blocks = nn.ModuleList(
            [_TorchBlock(d, h, mlp_ratio) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(d, eps=1e-6)
        self.head = nn.Linear(d, num_classes)

    def forward(self, x):
        b = x.shape[0]
        x = self.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        tokens, probs_all = [], []
        for blk in self.blocks:
            x, probs = blk(x)
            tokens.append(x[:, 1:, :])
            probs_all.append(probs)
        x = self.norm(x)
        return self.head(x[:, 0]), tokens, probs_all

    def timm_state_dict(self):
        sd = {
            "cls_token": self.cls_token.detach(),
            "pos_embed": self.pos_embed.detach(),
            "patch_embed.proj.weight": self.proj.weight.detach(),
            "patch_embed.proj.bias": self.proj.bias.detach(),
            "norm.weight": self.norm.weight.detach(),
            "norm.bias": self.norm.bias.detach(),
            "head.weight": self.head.weight.detach(),
            "head.bias": self.head.bias.detach(),
        }
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}"
            sd[f"{p}.norm1.weight"] = blk.norm1.weight.detach()
            sd[f"{p}.norm1.bias"] = blk.norm1.bias.detach()
            sd[f"{p}.attn.qkv.weight"] = blk.qkv.weight.detach()
            sd[f"{p}.attn.qkv.bias"] = blk.qkv.bias.detach()
            sd[f"{p}.attn.proj.weight"] = blk.proj.weight.detach()
            sd[f"{p}.attn.proj.bias"] = blk.proj.bias.detach()
            sd[f"{p}.norm2.weight"] = blk.norm2.weight.detach()
            sd[f"{p}.norm2.bias"] = blk.norm2.bias.detach()
            sd[f"{p}.mlp.fc1.weight"] = blk.fc1.weight.detach()
            sd[f"{p}.mlp.fc1.bias"] = blk.fc1.bias.detach()
            sd[f"{p}.mlp.fc2.weight"] = blk.fc2.weight.detach()
            sd[f"{p}.mlp.fc2.bias"] = blk.fc2.bias.detach()
        return sd


@pytest.fixture(scope="module")
def ported_pair():
    torch.manual_seed(0)
    img, patch, d, depth, h = 16, 4, 32, 3, 2
    tmodel = _TorchViT(img, patch, d, depth, h, 2.0, 5).eval()
    bundle = create_model(
        "deit_tiny_patch16_224",
        img_size=img,
        num_classes=5,
        arch_overrides=dict(embed_dim=d, depth=depth, num_heads=h, mlp_ratio=2.0),
        importance_mode="cls",
    )
    # patch_size override isn't an arch_override in the reference; emulate
    # a tiny model by replacing the config directly.
    from dataclasses import replace

    from basd_tpu.models.vit import VisionTransformer

    cfg = replace(bundle.cfg, patch_size=patch, img_size=img)
    module = VisionTransformer(cfg, importance_mode="cls")
    variables = module.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, img, img, 3)),
        deterministic=True,
    )
    params = vit_params_from_torch(
        {k: v.numpy() for k, v in tmodel.timm_state_dict().items()}, depth, False
    )
    chex_shapes_ref = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
    chex_shapes_new = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert chex_shapes_ref == chex_shapes_new
    return tmodel, module, {"params": params}, img


def test_vit_forward_matches_torch(ported_pair):
    tmodel, module, variables, img = ported_pair
    x = RNG.standard_normal((2, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        logits_t, tokens_t, probs_t = tmodel(torch.from_numpy(x))
    out = module.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), logits_t.numpy(), rtol=1e-4, atol=1e-4
    )
    for i, tk in enumerate(tokens_t):
        np.testing.assert_allclose(
            np.asarray(out["tokens"])[i], tk.numpy(), rtol=1e-4, atol=1e-4
        )
    # importance == CLS-row head-mean of the full probabilities
    for i, probs in enumerate(probs_t):
        ref_imp = probs[:, :, 0, 1:].mean(1).numpy()
        np.testing.assert_allclose(
            np.asarray(out["importance"])[i], ref_imp, rtol=1e-4, atol=1e-5
        )


def test_importance_mean_mode_matches_full_probs(ported_pair):
    tmodel, module, variables, img = ported_pair
    from dataclasses import replace

    from basd_tpu.models.vit import VisionTransformer

    mean_module = VisionTransformer(module.cfg, importance_mode="mean")
    x = RNG.standard_normal((2, img, img, 3)).astype(np.float32)
    out = mean_module.apply(variables, jnp.asarray(x), deterministic=True)
    with torch.no_grad():
        _, _, probs_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for i, probs in enumerate(probs_t):
        ref = probs.mean(dim=(1, 2)).numpy()
        np.testing.assert_allclose(
            np.asarray(out["importance"])[i], ref, rtol=1e-4, atol=1e-5
        )


# ----------------------------------------------------------------- factories


def test_registry_presets_probe():
    b = create_model("deit_tiny_patch16_224", img_size=224, num_classes=100)
    info = probe(b)
    assert info["embed_dim"] == 192
    assert info["depth"] == 12
    assert info["heads_per_layer"] == [3] * 12
    assert info["num_tokens"] == 196
    assert info["feature_format"] == "token"
    assert info["attn_subpath"] == "attn"

    b2 = create_model("dinov2_vitb14", img_size=224)
    assert b2.info["num_tokens"] == 256
    assert b2.cfg.layerscale_init == 1e-5

    b3 = create_model("convnextv2_tiny.fcmae", img_size=224)
    assert b3.info["embed_dim"] == 768
    assert b3.info["heads_per_layer"] == [1]
    assert b3.info["feature_format"] == "nhwc"
    assert b3.info["num_tokens"] == 49


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        create_model("not_a_model", img_size=224)


def test_custom_cnn_from_arch_kwargs():
    """Unlisted CNN teachers declared by explicit stage kwargs (VERDICT r2
    #8 — completes the probe_model replacement for CNNs,
    reference src/models/teacher.py:96-110)."""
    b = create_model(
        "my_convnext",
        img_size=64,
        arch_overrides=dict(kind="convnext", depths=(2, 2), dims=(32, 64)),
    )
    assert b.info["feature_format"] == "nhwc"
    assert b.info["embed_dim"] == 64
    assert b.info["depth"] == 2
    assert b.info["heads_per_layer"] == [1]
    # 2-stage reduction = 4 (stem) * 2 = 8 -> (64/8)^2 tokens, and the
    # module's real feature map must agree with the probed metadata
    assert b.info["num_tokens"] == 64
    vs = init_model(b, jax.random.PRNGKey(0), 64)
    feats = b.module.apply(
        vs, jnp.zeros((1, 64, 64, 3), jnp.float32), deterministic=True
    )["features"]
    assert feats.shape[1] * feats.shape[2] == b.info["num_tokens"]

    r = create_model(
        "my_resnet",
        img_size=64,
        arch_overrides=dict(kind="resnet", stage_sizes=(1, 1, 1, 1), width=16),
    )
    assert r.info["feature_format"] == "nhwc"
    assert r.info["depth"] == 4

    # teacher path: extraction yields L=1 tokens + uniform importance
    from basd_tpu.models.registry import load_teacher

    bundle, variables = load_teacher(
        "my_resnet",
        64,
        arch_overrides=dict(kind="resnet", stage_sizes=(1, 1, 1, 1), width=16),
        dtype=jnp.float32,
    )
    x = jnp.asarray(RNG.standard_normal((2, 64, 64, 3)), jnp.float32)
    tokens, imp = teacher_extract(bundle, variables, x)
    assert tokens.shape[0] == 1 and tokens.shape[1] == 2
    np.testing.assert_allclose(
        np.asarray(imp), 1.0 / tokens.shape[2], rtol=1e-6
    )

    # missing stage kwargs is an actionable error
    with pytest.raises(KeyError, match="depths"):
        create_model("bad_cnn", img_size=64, arch_overrides=dict(kind="convnext"))


def test_derive_student_arch_reference_semantics():
    info = dict(embed_dim=768, heads_per_layer=[12], depth=12, mlp_ratio=4.0)
    # head_dim 64; intrinsic 130 -> ceil(130/64)*64 = 192
    arch = derive_student_arch(info, 130)
    assert arch == dict(embed_dim=192, depth=12, num_heads=3, mlp_ratio=4.0)
    # clamp at teacher dim
    arch = derive_student_arch(info, 5000)
    assert arch["embed_dim"] == 768 and arch["num_heads"] == 12


def test_cnn_teacher_extract_uniform_importance():
    b = create_model("convnextv2_tiny.fcmae", img_size=32)
    variables = init_model(b, jax.random.PRNGKey(0), 32)
    x = jnp.asarray(RNG.standard_normal((2, 32, 32, 3)), jnp.float32)
    tokens, imp = teacher_extract(b, variables, x)
    assert tokens.shape == (1, 2, 1, 768)  # 32/32 = 1 -> 1x1 feature map
    np.testing.assert_allclose(np.asarray(imp), 1.0, rtol=1e-6)


def test_resnet_teacher_shapes():
    b = create_model("resnet50", img_size=64)
    variables = init_model(b, jax.random.PRNGKey(0), 64)
    x = jnp.asarray(RNG.standard_normal((2, 64, 64, 3)), jnp.float32)
    tokens, imp = teacher_extract(b, variables, x)
    assert tokens.shape == (1, 2, 4, 2048)
    np.testing.assert_allclose(np.asarray(imp), 0.25, rtol=1e-6)


def test_drop_path_stochastic_and_deterministic():
    b = create_model(
        "deit_tiny_patch16_224",
        img_size=16,
        num_classes=3,
        drop_path_rate=0.5,
        arch_overrides=dict(embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0),
    )
    from dataclasses import replace

    from basd_tpu.models.vit import VisionTransformer

    cfg = replace(b.cfg, patch_size=4)
    module = VisionTransformer(cfg)
    x = jnp.asarray(RNG.standard_normal((4, 16, 16, 3)), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    out_det = module.apply(variables, x, deterministic=True)
    out_det2 = module.apply(variables, x, deterministic=True)
    np.testing.assert_array_equal(
        np.asarray(out_det["logits"]), np.asarray(out_det2["logits"])
    )
    out_a = module.apply(
        variables, x, deterministic=False, rngs={"droppath": jax.random.PRNGKey(1)}
    )
    out_b = module.apply(
        variables, x, deterministic=False, rngs={"droppath": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(out_a["logits"]), np.asarray(out_b["logits"]))


def test_remat_forward_matches():
    from dataclasses import replace

    from basd_tpu.models.vit import VisionTransformer, ViTConfig

    cfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=2,
                    num_heads=2, mlp_ratio=2.0, num_classes=3)
    x = jnp.asarray(RNG.standard_normal((2, 16, 16, 3)), jnp.float32)
    m_plain = VisionTransformer(cfg, remat=False)
    m_remat = VisionTransformer(cfg, remat=True)
    v = m_plain.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    out1 = m_plain.apply(v, x, deterministic=True)
    out2 = m_remat.apply(v, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out1["logits"]), np.asarray(out2["logits"]), rtol=1e-5, atol=1e-5
    )


def test_available_models_lists_presets():
    models = available_models()
    for name in (
        "deit_tiny_patch16_224",
        "deit_small_patch16_224",
        "dinov2_vitb14",
        "dinov2_vitl14",
        "convnextv2_tiny.fcmae",
        "resnet50",
    ):
        assert name in models
