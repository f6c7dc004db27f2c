"""ResNet-50 feature extractor (frozen CNN teacher for CNN-to-ViT BASD;
BASELINE.json config 3). BatchNorm always uses running statistics — the
teacher is frozen/eval-only in BASD (reference freezes all teacher params,
``src/models/teacher.py:122-124``)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    name: str = "resnet50"

    @property
    def embed_dim(self) -> int:
        return self.width * 8 * 4  # 2048 for resnet50


class _FrozenBN(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        inv = (var.value + 1e-5) ** -0.5
        y = (x - mean.value.astype(x.dtype)) * (inv * scale).astype(x.dtype)
        return y + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = _FrozenBN(dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _FrozenBN(dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(4 * self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _FrozenBN(dtype=self.dtype, name="bn3")(y)
        if self.project:
            shortcut = nn.Conv(
                4 * self.filters, (1, 1), strides=self.strides, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            shortcut = _FrozenBN(dtype=self.dtype, name="downsample_bn")(shortcut)
        return nn.relu(shortcut + y)


class ResNet(nn.Module):
    """Returns the final NHWC feature map (forward_features)."""

    cfg: ResNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        x = nn.Conv(cfg.width, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = _FrozenBN(dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for si, num_blocks in enumerate(cfg.stage_sizes):
            filters = cfg.width * (2**si)
            for bi in range(num_blocks):
                strides = 2 if si > 0 and bi == 0 else 1
                x = Bottleneck(
                    filters,
                    strides=strides,
                    project=(bi == 0),
                    dtype=self.dtype,
                    name=f"layer{si + 1}_block{bi}",
                )(x)
        return {"features": x}
