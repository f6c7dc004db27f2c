"""ViT building blocks (flax.linen), designed for scan-over-depth.

Replaces the reference's hook-based extraction (reference:
``src/models/teacher.py:27-39,180-216``, ``src/training/trainer.py:16-37``)
with models that natively emit per-layer tokens and attention importance —
hooks do not exist in JAX, and a scan-with-collect is both cleaner and
jit-compilable (SURVEY.md §3.5).

TPU-first details:

- patch embedding is a rearrange + matmul (exactly equal to stride=kernel
  conv, but lands directly on the MXU);
- attention uses one fused qkv projection; when a CLS token exists, the
  distillation importance (CLS attention row, head-mean — reference
  ``src/losses/relational.py:24``) is computed from the q0 row alone, an
  O(B H N d) sliver, so the full (B, H, N, N) probability tensor is only
  materialized for the no-CLS query-mean case;
- stochastic depth / dropout rngs thread through ``nn.scan`` split rngs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

# f32 accumulation for attention logits on TPU
_HI = jax.lax.Precision.HIGHEST


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics: scale_by_keep)."""

    rate_max: float = 0.0  # static upper bound; actual rate passed per call
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, rate):
        if self.rate_max == 0.0 or self.deterministic:
            return x
        keep = 1.0 - rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention that optionally emits distillation
    importance.

    ``importance_mode``:
      - ``None``: plain attention (student path; XLA fuses the softmax).
      - ``'cls'``: also return head-mean of the CLS query's attention over
        patch keys, shape (B, N-1) — computed from the q0 row only.
      - ``'mean'``: head-and-query mean of the full attention matrix,
        shape (B, N) (no-CLS ViTs; requires materializing probabilities).
    """

    num_heads: int
    importance_mode: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # 'auto': fused Pallas flash attention on TPU, einsum elsewhere;
    # 'flash' / 'einsum' force a path. 'mean' importance always uses
    # einsum (it needs the full probability tensor).
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # keep activations in (B, N, H, E) — heads stay folded in the
        # feature (minor) axis; the score einsums batch over (b, h)
        # without a physical (B, H, N, E) relayout, which XLA otherwise
        # propagates into batch-minor activation layouts for the whole
        # block chain (traced as ~3ms transpose fusions per layer).
        q = q.reshape(b, n, h, hd)
        k = k.reshape(b, n, h, hd)
        v = v.reshape(b, n, h, hd)
        scale = hd**-0.5

        importance = None
        if self.importance_mode == "mean":
            logits = jnp.einsum(
                "bqhe,bkhe->bhqk", q, k, precision=_HI
            ).astype(jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1)
            importance = jnp.mean(probs, axis=(1, 2))  # (B, N)
            out = jnp.einsum(
                "bhqk,bkhe->bqhe", probs.astype(self.dtype), v
            )
        else:
            if self.importance_mode == "cls":
                # CLS query row only: (B, H, N) logits -> softmax -> strip
                # the CLS key and mean over heads (reference:
                # src/losses/relational.py:24).
                cls_logits = jnp.einsum(
                    "bhe,bkhe->bhk", q[:, 0], k, precision=_HI
                ).astype(jnp.float32) * scale
                cls_probs = jax.nn.softmax(cls_logits, axis=-1)
                importance = jnp.mean(cls_probs[..., 1:], axis=1)  # (B, N-1)
            impl = self.attention_impl
            if impl == "auto":
                impl = (
                    "flash" if jax.default_backend() == "tpu" else "einsum"
                )
            if impl == "flash":
                from basd_tpu.ops.pallas.flash_attention import flash_attention

                out = flash_attention(
                    q, k, v, float(scale),
                    jax.default_backend() != "tpu",
                )
            else:
                scores = jnp.einsum("bqhe,bkhe->bhqk", q, k) * scale
                probs = jax.nn.softmax(
                    scores.astype(jnp.float32), axis=-1
                ).astype(self.dtype)
                out = jnp.einsum("bhqk,bkhe->bqhe", probs, v)

        out = out.reshape(b, n, d)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        return out, importance


class LayerScale(nn.Module):
    init_value: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (x.shape[-1],)
        )
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    """Pre-LN transformer block emitting (tokens, importance) per layer."""

    num_heads: int
    mlp_ratio: float
    importance_mode: Optional[str] = None
    layerscale_init: Optional[float] = None
    drop_path_max: float = 0.0
    has_cls_token: bool = True
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-6
    attention_impl: str = "auto"
    # keep XLA from fusing the LayerNorm statistic reductions into the
    # producer matmul's epilogue (experiment flag; see scripts/bench_parts)
    ln_barrier: bool = False

    @nn.compact
    def __call__(self, x, drop_path_rate):
        d = x.shape[-1]

        def _ln(x, name):
            if self.ln_barrier:
                x = jax.lax.optimization_barrier(x)
            return nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                                name=name)(x)

        y, importance = Attention(
            self.num_heads,
            importance_mode=self.importance_mode,
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            name="attn",
        )(_ln(x, "norm1"))
        if self.layerscale_init is not None:
            y = LayerScale(self.layerscale_init, name="ls1")(y)
        x = x + DropPath(
            self.drop_path_max, self.deterministic, name="drop_path1"
        )(y, drop_path_rate)

        y = Mlp(
            int(d * self.mlp_ratio), d, dtype=self.dtype, name="mlp"
        )(_ln(x, "norm2"))
        if self.layerscale_init is not None:
            y = LayerScale(self.layerscale_init, name="ls2")(y)
        x = x + DropPath(
            self.drop_path_max, self.deterministic, name="drop_path2"
        )(y, drop_path_rate)

        # per-layer collected outputs: cls-stripped tokens (reference
        # strips cls in hooks: teacher.py:202, trainer.py:29)
        tokens = x[:, 1:, :] if self.has_cls_token else x
        if importance is None:
            importance = jnp.zeros(tokens.shape[:2], jnp.float32)
        return x, (tokens, importance)


class PatchEmbed(nn.Module):
    """Patchify + linear projection (== stride-p conv, MXU-friendly)."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        # NHWC input; flatten each patch in (c, dy, dx) order so ported
        # torch conv weights (D, C, p, p) reshape directly.
        patches = rearrange(
            x, "b (h p1) (w p2) c -> b (h w) (c p1 p2)", p1=p, p2=p
        )
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(patches)
