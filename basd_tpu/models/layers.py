"""ViT building blocks (flax.linen), designed for scan-over-depth.

Replaces the reference's hook-based extraction (reference:
``src/models/teacher.py:27-39,180-216``, ``src/training/trainer.py:16-37``)
with models that natively emit per-layer tokens and attention importance —
hooks do not exist in JAX, and a scan-with-collect is both cleaner and
jit-compilable (SURVEY.md §3.5).

TPU-first details:

- patch embedding is a real stride-p convolution (a layout firewall:
  see ``PatchEmbed``);
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
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

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


class _DenseParams(nn.Module):
    """Declares ``{kernel, bias}`` exactly as ``nn.Dense`` would (same
    names, shapes, initializers -> identical param tree and init draws)
    without running the matmul — used by the fused-MLP path."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LNParams(nn.Module):
    """Declares ``{scale, bias}`` exactly as ``FusedLayerNorm`` /
    ``nn.LayerNorm`` would (same names, shapes, initializers) without
    running the normalization — used by the fused LN+MLP block path."""

    @nn.compact
    def __call__(self, d: int):
        s = self.param("scale", nn.initializers.ones, (d,))
        b = self.param("bias", nn.initializers.zeros, (d,))
        return s, b


class _MlpParams(nn.Module):
    """Declares the ``Mlp`` param tree (fc1/fc2 kernel+bias, identical
    names/shapes/inits) without running it — fused LN+MLP block path."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, in_dim: int):
        w1, b1 = _DenseParams(self.hidden_dim, name="fc1")(in_dim)
        w2, b2 = _DenseParams(self.out_dim, name="fc2")(self.hidden_dim)
        return w1, b1, w2, b2


class _LSParams(nn.Module):
    """Declares ``gamma`` exactly as ``LayerScale`` would (same name,
    shape, init) without applying it — the fused LN+MLP block path folds
    it into the fc2 weights instead."""

    init_value: float

    @nn.compact
    def __call__(self, d: int):
        return self.param(
            "gamma", nn.initializers.constant(self.init_value), (d,)
        )


class _AttnParams(nn.Module):
    """Declares the ``Attention`` param tree (qkv/proj kernel+bias,
    identical names/shapes/inits) without running it — used by the fused
    attention-half block kernel."""

    @nn.compact
    def __call__(self, d: int):
        wq, bq = _DenseParams(3 * d, name="qkv")(d)
        wp, bp = _DenseParams(d, name="proj")(d)
        return wq, bq, wp, bp


class _DropPathMask(nn.Module):
    """Draws the per-sample stochastic-depth MULTIPLIER (0 or 1/keep)
    instead of applying it — the fused LN+MLP kernel applies it in-VMEM.
    Named identically to the ``DropPath`` it replaces so the flax rng
    stream (path-keyed) and therefore the drawn mask are bit-identical
    to the unfused branch."""

    rate_max: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, b: int, rate):
        if self.rate_max == 0.0 or self.deterministic:
            return jnp.ones((b,), jnp.float32)
        keep = 1.0 - rate
        rng = self.make_rng("droppath")
        # (b, 1, 1) draw shape matches DropPath's bernoulli call exactly
        m = jax.random.bernoulli(rng, keep, (b, 1, 1)).reshape(b)
        return jnp.where(m, 1.0 / keep, 0.0).astype(jnp.float32)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    # 'auto': fused Pallas kernel on the bf16 TPU path, Dense elsewhere;
    # 'fused' / 'dense' force a path.
    mlp_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        impl = self.mlp_impl
        if impl == "auto":
            impl = (
                "fused"
                if (
                    jax.default_backend() == "tpu"
                    and self.dtype == jnp.bfloat16
                    and x.ndim == 3
                )
                else "dense"
            )
        if impl == "fused":
            # one VMEM-resident kernel for fc1 -> tanh-GELU -> fc2: the
            # (B, N, F) hidden state never touches HBM (see
            # ops/pallas/fused_mlp.py). bf16-only: its tanh-GELU matches
            # the Dense branch's bf16 choice below.
            from basd_tpu.ops.pallas.fused_mlp import fused_mlp

            w1, b1 = _DenseParams(self.hidden_dim, name="fc1")(x.shape[-1])
            w2, b2 = _DenseParams(self.out_dim, name="fc2")(self.hidden_dim)
            return fused_mlp(
                x,
                w1.astype(self.dtype),
                b1,
                w2.astype(self.dtype),
                b2,
                jax.default_backend() != "tpu",
            )
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        # exact-erf GELU is the parity default (torch nn.GELU,
        # reference src/models/*). On the bf16 path the tanh
        # approximation's max abs error on fc1 activations (~1.7e-2)
        # sits AT the bf16 output rounding floor (~1.6e-2, measured at
        # B=512 teacher shapes), while erf costs ~1.4 ms/layer of VPU
        # transcendentals — so bf16 uses tanh, f32 stays exact.
        x = nn.gelu(x, approximate=(self.dtype == jnp.bfloat16))
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

        # keep activations in (B, N, H, E) — heads stay folded in the
        # feature (minor) axis; the score einsums batch over (b, h)
        # without a physical (B, H, N, E) relayout, which XLA otherwise
        # propagates into batch-minor activation layouts for the whole
        # block chain (traced as ~3ms transpose fusions per layer). The
        # flash path skips even the q/k/v split: the Pallas kernel
        # consumes the fused (B, N, 3D) slab directly (the split traced
        # at ~0.74 ms/layer of HBM copies at B=512).
        def split_qkv():
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return (
                q.reshape(b, n, h, hd),
                k.reshape(b, n, h, hd),
                v.reshape(b, n, h, hd),
            )

        scale = hd**-0.5

        importance = None
        if self.importance_mode == "mean":
            q, k, v = split_qkv()
            logits = jnp.einsum(
                "bqhe,bkhe->bhqk", q, k, precision=_HI
            ).astype(jnp.float32) * scale
            probs = jax.nn.softmax(logits, axis=-1)
            importance = jnp.mean(probs, axis=(1, 2))  # (B, N)
            out = jnp.einsum(
                "bhqk,bkhe->bqhe", probs.astype(self.dtype), v
            )
        else:
            impl = self.attention_impl
            if impl == "auto":
                impl = (
                    "flash" if jax.default_backend() == "tpu" else "einsum"
                )
            if impl == "flash":
                from basd_tpu.ops.pallas.flash_attention import (
                    flash_attention_qkv,
                    flash_attention_qkv_with_importance,
                )

                interp = jax.default_backend() != "tpu"
                if self.importance_mode == "cls":
                    # frozen-teacher path (forward-only): importance is
                    # the head-mean CLS softmax row from the same kernel
                    out, imp_full = flash_attention_qkv_with_importance(
                        qkv, h, float(scale), interp
                    )
                    importance = imp_full[:, 1:]  # strip the CLS key
                else:
                    out = flash_attention_qkv(qkv, h, float(scale), interp)
            else:
                q, k, v = split_qkv()
                if self.importance_mode == "cls":
                    # CLS query row only: (B, H, N) logits -> softmax ->
                    # strip the CLS key and mean over heads (reference:
                    # src/losses/relational.py:24).
                    cls_logits = jnp.einsum(
                        "bhe,bkhe->bhk", q[:, 0], k, precision=_HI
                    ).astype(jnp.float32) * scale
                    cls_probs = jax.nn.softmax(cls_logits, axis=-1)
                    importance = jnp.mean(cls_probs[..., 1:], axis=1)
                scores = jnp.einsum("bqhe,bkhe->bhqk", q, k) * scale
                probs = jax.nn.softmax(
                    scores.astype(jnp.float32), axis=-1
                ).astype(self.dtype)
                out = jnp.einsum("bhqk,bkhe->bqhe", probs, v)

        # named for the 'dots' remat policy: lets the backward keep the
        # attention output instead of re-running the flash kernel
        out = checkpoint_name(out, "attn_out")
        out = out.reshape(b, n, d)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        return out, importance


class FusedLayerNorm(nn.Module):
    """LayerNorm whose TPU path is the fused Pallas kernel.

    Parameter pytree matches ``nn.LayerNorm`` ({scale, bias} at this
    module's level); the off-TPU path reproduces flax's math exactly
    (f32 fast-variance stats, f32 affine, cast to dtype). On TPU the
    kernel is a layout firewall: the (B, N) statistic tensors a plain LN
    materializes pull the whole residual stream into batch-in-lanes
    layouts (see ``basd_tpu.ops.pallas.layernorm``).
    """

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        impl = self.impl
        if impl == "auto":
            impl = "fused" if jax.default_backend() == "tpu" else "flax"
        if impl == "fused" and x.ndim == 3:
            from basd_tpu.ops.pallas.layernorm import fused_layernorm

            return fused_layernorm(
                x.astype(self.dtype),
                scale.astype(jnp.float32),
                bias.astype(jnp.float32),
                float(self.epsilon),
                jax.default_backend() != "tpu",
            ).astype(self.dtype)
        # flax.linen.LayerNorm-exact fallback (normalization.py:137-144,
        # 203-227): f32 fast variance, f32 affine, cast to dtype
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        mu2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        var = jnp.maximum(0.0, mu2 - jnp.square(mu))
        mul = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        y = (xf - mu) * mul + bias.astype(jnp.float32)
        return y.astype(self.dtype)


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
    mlp_impl: str = "auto"
    # keep XLA from fusing the LayerNorm statistic reductions into the
    # producer matmul's epilogue (experiment flag; see scripts/bench_parts)
    ln_barrier: bool = False
    # collect per-layer outputs by writing into a carried (L, B, N, D)
    # stack instead of scan-with-collect ys: the fused MLP kernel's
    # second (aliased) output on the TPU path, a dynamic_update_slice on
    # the module path. Avoids the unrolled-scan concatenate (8.2 ms/step
    # at teacher shapes). The carry becomes (x, stack, layer_index) and
    # the stack keeps the cls token (stripped lazily by the consumer).
    collect_alias: bool = False

    @nn.compact
    def __call__(self, x, drop_path_rate):
        buf = idx = None
        if self.collect_alias:
            x, buf, idx = x
        d = x.shape[-1]

        def _ln(x, name):
            if self.ln_barrier:
                x = jax.lax.optimization_barrier(x)
            return FusedLayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                                  name=name)(x)

        # attention half: the forward-only teacher path (importance_mode
        # 'cls', deterministic / no stochastic depth, bf16 TPU) fuses
        # LN1 + qkv + flash attention + proj + residual into ONE kernel
        # (ops/pallas/fused_block_attn) — same param tree, math identical
        # to the module chain at bf16 rounding. LayerScale folds gamma
        # into the proj weights outside the kernel.
        attn_impl = self.attention_impl
        fusable = (
            self.importance_mode == "cls"
            and self.dtype == jnp.bfloat16
            and not self.ln_barrier
            and (self.deterministic or self.drop_path_max == 0.0)
            and x.ndim == 3
        )
        # auto-dispatch: hardware-validated round 4 (v5e) — numerics as
        # close to f32 truth as the flash path at every layer (ratio
        # <=1.02, scripts/validate_fused_attn_f32.py) and faster
        # (teacher fwd 45.4 vs 50.3 ms at B=512, scripts/bench_parts.py)
        if attn_impl == "auto" and fusable and (
            jax.default_backend() == "tpu"
        ):
            attn_impl = "fused_block"
        if attn_impl == "fused_block" and not fusable:
            attn_impl = "auto"

        # student sibling: same fusion with a full custom VJP and a
        # stochastic-depth multiplier, no importance output
        # (ops/pallas/fused_block_attn.fused_block_attn_train).
        # Hardware-validated round 4 (v5e, D=192): Mosaic-vs-interpret
        # grad parity at bf16 noise (loss relerr 8e-7) and faster —
        # student fwd+bwd step 63.8 vs 70.3 ms at B=512
        # (scripts/bench_parts.py student_step student_step_fused).
        fusable_train = (
            self.importance_mode is None
            and self.dtype == jnp.bfloat16
            and not self.ln_barrier
            and x.ndim == 3
        )
        if attn_impl == "auto" and fusable_train and (
            jax.default_backend() == "tpu"
        ):
            attn_impl = "fused_block_train"
        if attn_impl == "fused_block_train" and not fusable_train:
            attn_impl = "auto"

        if attn_impl == "fused_block_train":
            from basd_tpu.ops.pallas.fused_block_attn import (
                fused_block_attn_train,
            )

            ln1_s, ln1_b = _LNParams(name="norm1")(d)
            wq, bq, wp, bp = _AttnParams(name="attn")(d)
            if self.layerscale_init is not None:
                # fold gamma into the proj weights OUTSIDE the kernel
                # with plain differentiable ops — gradients reach both
                # wp and gamma exactly (same scheme as the fused MLP)
                g1 = _LSParams(self.layerscale_init, name="ls1")(d)
                g1f = g1.astype(jnp.float32)
                wp = wp * g1f[None, :]
                bp = bp * g1f
            mask = _DropPathMask(
                self.drop_path_max, self.deterministic, name="drop_path1"
            )(x.shape[0], drop_path_rate)
            x = fused_block_attn_train(
                x, mask, ln1_s.astype(jnp.float32),
                ln1_b.astype(jnp.float32), wq.astype(self.dtype), bq,
                wp.astype(self.dtype), bp, self.num_heads,
                float(self.norm_eps), jax.default_backend() != "tpu",
            )
            importance = None
        elif attn_impl == "fused_block":
            from basd_tpu.ops.pallas.fused_block_attn import fused_block_attn

            ln1_s, ln1_b = _LNParams(name="norm1")(d)
            wq, bq, wp, bp = _AttnParams(name="attn")(d)
            if self.layerscale_init is not None:
                g1 = _LSParams(self.layerscale_init, name="ls1")(d)
                g1f = g1.astype(jnp.float32)
                wp = wp * g1f[None, :]
                bp = bp * g1f
            x, imp_full = fused_block_attn(
                x, ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32),
                wq.astype(self.dtype), bq, wp.astype(self.dtype), bp,
                self.num_heads, float(self.norm_eps),
                jax.default_backend() != "tpu",
            )
            importance = imp_full[:, 1:]  # strip the CLS key
        else:
            y, importance = Attention(
                self.num_heads,
                importance_mode=self.importance_mode,
                dtype=self.dtype,
                # explicit 'module' means NO Pallas anywhere (A/B
                # bisect): force einsum, not 'auto' (which re-selects
                # flash on TPU)
                attention_impl=(
                    "einsum" if attn_impl == "module" else attn_impl
                ),
                name="attn",
            )(_ln(x, "norm1"))
            if self.layerscale_init is not None:
                y = LayerScale(self.layerscale_init, name="ls1")(y)
            x = x + DropPath(
                self.drop_path_max, self.deterministic, name="drop_path1"
            )(y, drop_path_rate)

        # MLP half: the bf16 TPU path folds LN2 + MLP + DropPath +
        # residual into ONE Pallas kernel (fused_block_mlp) — same param
        # tree, same rng stream, math identical to the unfused chain up
        # to one bf16 rounding in the mask/residual arithmetic.
        # LayerScale (dinov2) folds gamma into the fc2 weights OUTSIDE
        # the kernel — plain differentiable jnp ops, so gradients reach
        # both w2 and gamma exactly. ln_barrier experiments keep the
        # module chain.
        # 'auto_module' = auto dispatch fell back to the module chain
        # (CPU / f32 / ln_barrier): the inner Mlp keeps ITS auto fused
        # kernel. An explicit 'module' forces the plain Dense chain.
        mlp_impl = self.mlp_impl
        if mlp_impl == "auto":
            mlp_impl = (
                "fused_ln"
                if (
                    jax.default_backend() == "tpu"
                    and self.dtype == jnp.bfloat16
                    and not self.ln_barrier
                    and x.ndim == 3
                )
                else "auto_module"
            )
        elif mlp_impl == "fused_ln" and self.ln_barrier:
            mlp_impl = "auto_module"

        if mlp_impl == "fused_ln":
            from basd_tpu.ops.pallas.fused_block_mlp import (
                fused_ln_mlp,
                fused_ln_mlp_collect,
            )

            ln_s, ln_b = _LNParams(name="norm2")(d)
            w1, b1, w2, b2 = _MlpParams(
                int(d * self.mlp_ratio), d, name="mlp"
            )(d)
            if self.layerscale_init is not None:
                gamma = _LSParams(self.layerscale_init, name="ls2")(d)
                gf = gamma.astype(jnp.float32)
                w2 = w2 * gf[None, :]
                b2 = b2 * gf
            mask = _DropPathMask(
                self.drop_path_max, self.deterministic, name="drop_path2"
            )(x.shape[0], drop_path_rate)
            args = (
                x, mask,
                ln_s.astype(jnp.float32), ln_b.astype(jnp.float32),
                w1.astype(self.dtype), b1, w2.astype(self.dtype), b2,
            )
            interp = jax.default_backend() != "tpu"
            if self.collect_alias:
                x, buf = fused_ln_mlp_collect(
                    *args, buf, idx, float(self.norm_eps), interp
                )
            else:
                x = fused_ln_mlp(*args, float(self.norm_eps), interp)
        else:
            y = Mlp(
                int(d * self.mlp_ratio), d, dtype=self.dtype,
                # explicit 'module' means NO Pallas anywhere (A/B bisect);
                # 'auto_module' lets the inner Mlp keep its fused kernel
                mlp_impl={"module": "dense", "auto_module": "auto"}.get(
                    mlp_impl, mlp_impl
                ),
                name="mlp",
            )(_ln(x, "norm2"))
            if self.layerscale_init is not None:
                y = LayerScale(self.layerscale_init, name="ls2")(y)
            x = x + DropPath(
                self.drop_path_max, self.deterministic, name="drop_path2"
            )(y, drop_path_rate)

        if importance is None:
            n_tok = x.shape[1] - 1 if self.has_cls_token else x.shape[1]
            importance = jnp.zeros((x.shape[0], n_tok), jnp.float32)
        if self.collect_alias:
            m = x.shape[0] * x.shape[1]
            if (
                buf.dtype != x.dtype
                or buf.ndim != 2
                or buf.shape[-1] != x.shape[-1]
                or buf.shape[0] % m != 0
            ):
                raise ValueError(
                    f"flat collect stack {buf.shape}/{buf.dtype} does not "
                    f"match block output {x.shape}/{x.dtype}"
                )
            if mlp_impl != "fused_ln":
                # module-path fallback (CPU / f32): same stack semantics
                # via an in-place dynamic_update_slice on the flat buffer
                buf = jax.lax.dynamic_update_slice(
                    buf, x.reshape(m, x.shape[-1]), (idx * m, 0)
                )
            # CLS rows are collected as a separate tiny (B, D) scan
            # output so packed consumers never gather them from the
            # flat stack (models.tokens.PackedTokens).
            cls_row = x[:, 0, :] if self.has_cls_token else None
            return (x, buf, idx + 1), (importance, cls_row)
        # per-layer collected outputs: cls-stripped tokens (reference
        # strips cls in hooks: teacher.py:202, trainer.py:29)
        tokens = x[:, 1:, :] if self.has_cls_token else x
        return x, (tokens, importance)


class PatchEmbed(nn.Module):
    """Patchify + linear projection as a stride-p convolution.

    The parameter stays Dense-shaped (C*p*p, D) with rows in (c, dy, dx)
    order, so ported torch conv weights (D, C, p, p) reshape directly and
    checkpoints are layout-stable; it is reshaped to HWIO per call (a
    0.3MB transpose XLA folds into the conv).

    TPU note: this MUST be a real convolution, not rearrange+matmul. The
    (B, S, S, 3) image input gets a batch-minor device layout (lanes of 3
    would pad 42x), and XLA layout assignment propagates batch-minor
    through a reshape/transpose patchify into the ENTIRE residual stream:
    every Dense in every block then lowers to a windowed batch-in-lanes
    VPU emitter (~3 ms vs ~0.6 ms on the MXU at B=512; traced 91 ms
    teacher forward). A convolution is a layout firewall — its output
    comes out feature-minor and the whole network stays on the MXU.
    """

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = _PatchConv(
            self.patch_size, self.embed_dim, dtype=self.dtype, name="proj"
        )(x)
        b, gh, gw, d = y.shape
        return y.reshape(b, gh * gw, d)


class _PatchConv(nn.Module):
    """Stride-p conv whose parameter pytree matches the Dense it replaced
    (``kernel`` (C*p*p, D) in (c, dy, dx) row order + ``bias`` (D,))."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (c * p * p, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        # (c p1 p2, D) -> HWIO (p1, p2, c, D)
        hwio = kernel.reshape(c, p, p, self.embed_dim).transpose(1, 2, 0, 3)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            hwio.astype(self.dtype),
            window_strides=(p, p),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)
