"""Vision Transformer with native per-layer token + importance collection.

TPU-first rebuild of the timm ViTs the reference drives via hooks
(reference: ``src/models/teacher.py``, ``src/train.py:35-54``): blocks run
under ``nn.scan`` with stacked parameters — one compiled block body
regardless of depth — collecting per-layer cls-stripped tokens and
attention importance as scan outputs. ``jax.checkpoint`` (remat) over the
block mirrors the reference's ``set_grad_checkpointing(True)``
(``src/train.py:53``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from basd_tpu.models.layers import Block, FusedLayerNorm, PatchEmbed
from basd_tpu.models.tokens import PackedTokens


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    use_cls_token: bool = True
    layerscale_init: Optional[float] = None
    norm_eps: float = 1e-6
    name: str = "vit"

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def num_tokens(self) -> int:
        """Patch tokens (cls excluded) — the reference's ``num_tokens``
        (``src/models/teacher.py:94``)."""
        return self.num_patches

    def with_overrides(self, overrides: dict | None) -> "ViTConfig":
        if not overrides:
            return self
        allowed = {"embed_dim", "depth", "num_heads", "mlp_ratio"}
        unknown = set(overrides) - allowed
        if unknown:
            raise ValueError(f"unsupported arch overrides: {sorted(unknown)}")
        return replace(self, **{k: overrides[k] for k in overrides})


class VisionTransformer(nn.Module):
    """Returns ``{'logits', 'tokens' (L,B,N,D), 'importance' (L,B,N)}``.

    ``importance_mode``: None (student — no attention maps needed),
    'cls' or 'mean' (teacher). Importance semantics follow
    ``basd_tpu.ops.procrustes.reduce_attention_importance``.
    """

    cfg: ViTConfig
    importance_mode: Optional[str] = None
    remat: bool = False
    # remat policy: None = full recompute (reference
    # set_grad_checkpointing semantics); 'dots' = save matmul/attention
    # outputs and recompute only elementwise ops in the backward
    # (jax.checkpoint_policies.checkpoint_dots + the flash-attention
    # output named 'attn_out') — near remat=False memory-FLOP tradeoff
    # without re-running flash attention in the backward.
    remat_policy: Optional[str] = None
    # unroll the block scan: better XLA layouts/fusion at small depth
    # (scan carries forced batch-minor relayouts, traced ~40ms/step);
    # compile time rises accordingly.
    unroll: int = 12
    ln_barrier: bool = False
    attention_impl: str = "auto"
    mlp_impl: str = "auto"
    # collect per-layer tokens through a carried (L, B, N, D) stack the
    # blocks write into directly (aliased Pallas output on the TPU bf16
    # path, dynamic_update_slice on the module path) instead of
    # scan-with-collect ys — kills the unrolled-scan concatenate
    # (8.2 ms/step at B=512 teacher shapes). FORWARD-ONLY (the TPU
    # kernel defines no VJP): use for the frozen teacher, never for the
    # student. The stack keeps the cls token; 'tokens' is returned as a
    # lazy slice that fuses into the selector's einsum reads.
    collect_alias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 collection_init=None):
        cfg = self.cfg
        b = x.shape[0]
        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=self.dtype,
                       name="patch_embed")(x)

        if cfg.use_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.normal(1e-6), (1, 1, cfg.embed_dim)
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)).astype(x.dtype), x],
                axis=1,
            )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, x.shape[1], cfg.embed_dim),
        )
        x = x + pos.astype(x.dtype)

        # linearly-spaced per-layer stochastic-depth rates (timm convention)
        rates = jnp.asarray(
            np.linspace(0.0, cfg.drop_path_rate, cfg.depth), jnp.float32
        )

        block_cls = Block
        if self.remat:
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_saveable,
                    jax.checkpoint_policies.save_only_these_names("attn_out"),
                )
            elif self.remat_policy in (None, "full"):
                policy = None
            else:
                raise ValueError(f"unknown remat_policy {self.remat_policy!r}")
            block_cls = nn.remat(Block, prevent_cse=False, policy=policy)
        collect_alias = self.collect_alias and not self.remat
        blocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "droppath": True},
            in_axes=(0,),
            out_axes=0,
            length=cfg.depth,
            unroll=min(self.unroll, cfg.depth),
        )(
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            importance_mode=self.importance_mode,
            layerscale_init=cfg.layerscale_init,
            drop_path_max=cfg.drop_path_rate,
            has_cls_token=cfg.use_cls_token,
            deterministic=deterministic,
            dtype=self.dtype,
            norm_eps=cfg.norm_eps,
            ln_barrier=self.ln_barrier,
            attention_impl=self.attention_impl,
            mlp_impl=self.mlp_impl,
            collect_alias=collect_alias,
            name="blocks",
        )
        if collect_alias:
            # the collection stack stays FLAT (L*B*N, D) end to end: the
            # 4-D (L, B, N, D) view is a real whole-stack copy on TPU
            # when N % 8 != 0 (sublane padding), and the CLS strip would
            # be another — consumers read the packed form instead (see
            # models.tokens.PackedTokens).
            b_, n_, d_ = x.shape
            if collection_init is not None:
                # donated carry buffer from the caller (see
                # training.trainer): every (b*n)-row slab is fully
                # overwritten by its layer's aliased kernel write before
                # any read, so arbitrary prior contents are fine — this
                # skips the dead ~1 ms/GB zeros broadcast per step.
                if (
                    collection_init.shape != (cfg.depth * b_ * n_, d_)
                    or collection_init.dtype != self.dtype
                ):
                    raise ValueError(
                        f"collection_init {collection_init.shape}/"
                        f"{collection_init.dtype} != "
                        f"({cfg.depth * b_ * n_}, {d_})/{self.dtype}"
                    )
                stack = collection_init
            else:
                stack = jnp.zeros((cfg.depth * b_ * n_, d_), self.dtype)
            (x, stack, _), (importance, cls_slab) = blocks(
                (x, stack, jnp.int32(0)), rates
            )
            tokens = PackedTokens(
                flat=stack.reshape(cfg.depth, b_ * n_, d_),
                cls=cls_slab if cfg.use_cls_token else None,
                batch=b_,
                num_tokens=n_,
                has_cls=cfg.use_cls_token,
            )
        else:
            x, (tokens, importance) = blocks(x, rates)

        x = FusedLayerNorm(
            epsilon=cfg.norm_eps, dtype=self.dtype, name="norm"
        )(x)
        pooled = x[:, 0] if cfg.use_cls_token else jnp.mean(x, axis=1)
        logits = (
            nn.Dense(cfg.num_classes, dtype=self.dtype, name="head")(pooled)
            if cfg.num_classes > 0
            else pooled
        )
        return {"logits": logits, "tokens": tokens, "importance": importance}
