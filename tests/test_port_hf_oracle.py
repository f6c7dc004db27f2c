"""Value-level port oracle against HuggingFace `transformers` ViT models.

Closes VERDICT r2 weak #5 / directive #6: the shape manifests lock key
layouts and `_TorchViT` locks values against a LOCAL mimic of timm —
a genuine upstream convention quirk (qkv packing order, conv layout,
LayerScale application point) could pass both. `transformers`' `ViTModel`
and `Dinov2Model` are independent third-party torch implementations
whose forward code we do not control; they store q/k/v as SEPARATE
projections, so converting their state dicts into the timm/dinov2-hub
layouts exercises exactly the packing conventions a same-codebase mimic
cannot falsify. The assertions compare every per-layer hidden state (and
attention-derived CLS importance) of the ported JAX model against
transformers' own forward outputs.

Reference loaders under test: ``src/models/teacher.py:113-120`` (timm /
dinov2-hub checkpoints).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from basd_tpu.models.port import vit_params_from_torch
from basd_tpu.models.vit import ViTConfig, VisionTransformer

transformers = pytest.importorskip("transformers")

RNG = np.random.default_rng(23)


def _hf_vit_to_timm_sd(hf_sd: dict, depth: int) -> dict:
    """HF `ViTModel` state dict -> timm VisionTransformer layout.

    The q/k/v concatenation is THE value-convention under test: timm
    packs rows as [q; k; v]."""
    sd = {
        "cls_token": hf_sd["embeddings.cls_token"],
        "pos_embed": hf_sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight": hf_sd[
            "embeddings.patch_embeddings.projection.weight"
        ],
        "patch_embed.proj.bias": hf_sd[
            "embeddings.patch_embeddings.projection.bias"
        ],
        "norm.weight": hf_sd["layernorm.weight"],
        "norm.bias": hf_sd["layernorm.bias"],
    }
    for i in range(depth):
        h = f"encoder.layer.{i}"
        t = f"blocks.{i}"
        ln1 = "layernorm_before" if f"{h}.layernorm_before.weight" in hf_sd else "norm1"
        ln2 = "layernorm_after" if f"{h}.layernorm_after.weight" in hf_sd else "norm2"
        sd[f"{t}.norm1.weight"] = hf_sd[f"{h}.{ln1}.weight"]
        sd[f"{t}.norm1.bias"] = hf_sd[f"{h}.{ln1}.bias"]
        sd[f"{t}.attn.qkv.weight"] = torch.cat(
            [
                hf_sd[f"{h}.attention.attention.query.weight"],
                hf_sd[f"{h}.attention.attention.key.weight"],
                hf_sd[f"{h}.attention.attention.value.weight"],
            ],
            dim=0,
        )
        sd[f"{t}.attn.qkv.bias"] = torch.cat(
            [
                hf_sd[f"{h}.attention.attention.query.bias"],
                hf_sd[f"{h}.attention.attention.key.bias"],
                hf_sd[f"{h}.attention.attention.value.bias"],
            ],
            dim=0,
        )
        sd[f"{t}.attn.proj.weight"] = hf_sd[f"{h}.attention.output.dense.weight"]
        sd[f"{t}.attn.proj.bias"] = hf_sd[f"{h}.attention.output.dense.bias"]
        sd[f"{t}.norm2.weight"] = hf_sd[f"{h}.{ln2}.weight"]
        sd[f"{t}.norm2.bias"] = hf_sd[f"{h}.{ln2}.bias"]
        if f"{h}.intermediate.dense.weight" in hf_sd:  # ViTModel naming
            sd[f"{t}.mlp.fc1.weight"] = hf_sd[f"{h}.intermediate.dense.weight"]
            sd[f"{t}.mlp.fc1.bias"] = hf_sd[f"{h}.intermediate.dense.bias"]
            sd[f"{t}.mlp.fc2.weight"] = hf_sd[f"{h}.output.dense.weight"]
            sd[f"{t}.mlp.fc2.bias"] = hf_sd[f"{h}.output.dense.bias"]
        else:  # Dinov2Model naming
            sd[f"{t}.mlp.fc1.weight"] = hf_sd[f"{h}.mlp.fc1.weight"]
            sd[f"{t}.mlp.fc1.bias"] = hf_sd[f"{h}.mlp.fc1.bias"]
            sd[f"{t}.mlp.fc2.weight"] = hf_sd[f"{h}.mlp.fc2.weight"]
            sd[f"{t}.mlp.fc2.bias"] = hf_sd[f"{h}.mlp.fc2.bias"]
        if f"{h}.layer_scale1.lambda1" in hf_sd:  # dinov2-hub ls naming
            sd[f"{t}.ls1.gamma"] = hf_sd[f"{h}.layer_scale1.lambda1"]
            sd[f"{t}.ls2.gamma"] = hf_sd[f"{h}.layer_scale2.lambda1"]
    if "embeddings.mask_token" in hf_sd:
        sd["mask_token"] = hf_sd["embeddings.mask_token"]
    return sd


def _port_and_compare(hf_model, cfg: ViTConfig, has_layerscale: bool):
    hf_model = hf_model.eval()
    depth = cfg.depth
    sd = _hf_vit_to_timm_sd(hf_model.state_dict(), depth)
    params = vit_params_from_torch(
        {k: v.numpy() for k, v in sd.items()}, depth, has_layerscale
    )

    module = VisionTransformer(cfg, importance_mode="cls")
    ref_vars = module.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
        deterministic=True,
    )
    want = jax.tree_util.tree_map(lambda x: x.shape, ref_vars["params"])
    got = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert want == got

    x = RNG.standard_normal((2, 3, cfg.img_size, cfg.img_size)).astype(
        np.float32
    )
    with torch.no_grad():
        hf_out = hf_model(
            torch.from_numpy(x),
            output_hidden_states=True,
            output_attentions=True,
        )
    out = module.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        deterministic=True,
    )
    # per-layer block outputs (cls stripped) against transformers' own
    # hidden states — any qkv packing / transpose / LayerScale placement
    # mistake diverges layer by layer
    for i in range(depth):
        ref = hf_out.hidden_states[i + 1][:, 1:, :].numpy()
        np.testing.assert_allclose(
            np.asarray(out["tokens"])[i], ref, rtol=2e-4, atol=2e-4,
            err_msg=f"layer {i} tokens",
        )
    # CLS-row head-mean importance against transformers' attention probs
    for i in range(depth):
        ref_imp = hf_out.attentions[i][:, :, 0, 1:].mean(1).numpy()
        np.testing.assert_allclose(
            np.asarray(out["importance"])[i], ref_imp, rtol=2e-4, atol=1e-5,
            err_msg=f"layer {i} importance",
        )


def test_port_values_match_transformers_vit():
    """timm-layout port vs transformers.ViTModel forward (independent
    third-party implementation; q/k/v stored separately upstream)."""
    torch.manual_seed(3)
    hf_cfg = transformers.ViTConfig(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=2,
        intermediate_size=64,
        image_size=32,
        patch_size=8,
        layer_norm_eps=1e-6,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",  # sdpa returns attentions=None
    )
    hf_model = transformers.ViTModel(hf_cfg, add_pooling_layer=False)
    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=2.0, num_classes=0,
    )
    _port_and_compare(hf_model, cfg, has_layerscale=False)


def test_port_values_match_transformers_dinov2():
    """dinov2-hub-layout port (LayerScale path) vs transformers.Dinov2Model
    forward."""
    torch.manual_seed(4)
    hf_cfg = transformers.Dinov2Config(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        mlp_ratio=4,
        image_size=28,
        patch_size=14,
        layerscale_value=0.5,
        layer_norm_eps=1e-6,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",  # sdpa returns attentions=None
    )
    hf_model = transformers.Dinov2Model(hf_cfg)
    cfg = ViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=4.0, num_classes=0, layerscale_init=1e-5,
    )
    _port_and_compare(hf_model, cfg, has_layerscale=True)
