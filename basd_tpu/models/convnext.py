"""ConvNeXtV2 (FCMAE) feature extractor — the reference's cross-arch
teacher (reference: ``configs/experiment/basd_imagenet_cross_arch.yaml:6``
loads ``convnextv2_tiny.fcmae`` via timm).

NHWC throughout (TPU-native layout); the final stage's feature map is the
single "layer" the BASD CNN-to-ViT path consumes
(reference: ``src/models/teacher.py:184-191``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple[int, ...] = (3, 3, 9, 3)
    dims: tuple[int, ...] = (96, 192, 384, 768)
    name: str = "convnextv2_tiny"

    @property
    def embed_dim(self) -> int:
        return self.dims[-1]


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXtV2)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(
            jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True)
            + 1e-12
        )
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta + x).astype(x.dtype)


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        # tanh-approx GELU at bf16: sub-rounding-floor error, no VPU erf
        # (same contract as models.layers.Mlp)
        x = nn.gelu(x, approximate=(self.dtype == jnp.bfloat16))
        x = GRN(4 * self.dim, name="grn")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        return shortcut + x


class ConvNeXtV2(nn.Module):
    """Returns the final-stage NHWC feature map (forward_features)."""

    cfg: ConvNeXtConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        x = nn.Conv(
            cfg.dims[0], (4, 4), strides=4, dtype=self.dtype, name="stem_conv"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for si, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
            if si > 0:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"downsample_norm{si}"
                )(x)
                x = nn.Conv(
                    dim, (2, 2), strides=2, dtype=self.dtype,
                    name=f"downsample_conv{si}",
                )(x)
            for bi in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype, name=f"stage{si}_block{bi}")(x)
        return {"features": x}
