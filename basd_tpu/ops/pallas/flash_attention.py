"""Fused multi-head attention (Pallas, TPU).

The einsum attention path materializes the (B, H, N, N) float32
probability tensor in HBM twice per layer (logits + probs) — traced at
~2.5 ms/layer at B=512, N=197 on v5e, ~44 ms/step across the teacher and
student stacks. This kernel keeps scores/probabilities in VMEM: one
program handles ``block_b`` images (all heads, looped), computing

    S = scale * Q_h K_h^T   (f32 accumulate, bf16 MXU inputs)
    P = softmax_k(S)        (f32, key-padding masked)
    O_h = P V_h             (f32 accumulate)

entirely on-chip. Backward is the standard flash recompute: P is rebuilt
from the saved row logsumexp, then dV = P^T dO, dP = dO V^T,
dS = P (dP - rowsum(dO * O)), dQ = scale dS K, dK = scale dS^T Q.

Layout: q, k, v, o are (B, N, H, E) — the model's native token layout
(heads folded in the feature (minor) axis; see ``basd_tpu.models.layers``)
— viewed as (B, N, H*E) slabs, so blocks are (block_b, N, H*E): Mosaic
requires the last two block dims to be (8, 128)-divisible OR ARRAY-EQUAL,
and declaring the token axis at its true N (197 for 224px ViT) instead of
pad128(N)=256 hands padding to Mosaic's 8-sublane granularity — ~22%
less matmul/softmax work than the round-2 version, and no explicit
padding masks (Mosaic masks its own internal padding). Heads are static
lane slices of the slab; E must keep H*E 128-aligned (E=64 with even H —
in practice ViT heads are 64-wide).

Semantics match the einsum path: softmax in f32, probabilities cast to
the input dtype for the PV matmul (reference AMP behavior:
``src/models/teacher.py`` drives timm's f32-softmax attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *imp_ref,
                n: int, h: int, e: int, scale: float):
    imp_acc = None
    for i in range(h):
        sl = slice(i * e, (i + 1) * e)
        # blocks are array-equal in (N, H*E): no explicit padding masks —
        # Mosaic owns (and masks) its internal sublane/lane padding.
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (G, N, N)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # deferred normalization: scale O by 1/l after the PV matmul
        # ((G, NP, E) elementwise) instead of normalizing the full
        # (G, NP, NP) probability block — 4x fewer VPU divides at E=64
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[:, :, sl] = o.astype(o_ref.dtype)
        lse_ref[:, i, :] = m[..., 0] + jnp.log(l[..., 0])
        if imp_ref:
            # head-mean of the CLS (row 0) attention distribution —
            # the reference's distillation importance
            # (src/losses/relational.py:22-24), CLS key stripped by the
            # caller.
            row0 = p[:, 0, :] / l[:, 0]  # (G, NP)
            imp_acc = row0 if imp_acc is None else imp_acc + row0
    if imp_ref:
        imp_ref[0][...] = imp_acc / h


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
    dq_ref, dk_ref, dv_ref, *, n: int, h: int, e: int, scale: float,
):
    for i in range(h):
        sl = slice(i * e, (i + 1) * e)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        o = o_ref[:, :, sl].astype(jnp.float32)
        do = do_ref[:, :, sl].astype(jnp.float32)
        lse = lse_ref[:, i, :]

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (G, N, N)
        p = jnp.exp(s - lse[:, :, None])

        dob = do.astype(q.dtype)
        dv = jax.lax.dot_general(
            p.astype(q.dtype), dob, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, NP_k, E)
        dp = jax.lax.dot_general(
            dob, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, NP_q, NP_k)
        delta = jnp.sum(do * o, axis=-1)  # (G, NP)
        ds = (p * (dp - delta[:, :, None]) * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _pick_block_b(b: int, cap: int = 8) -> int:
    """Images per program. G=8 traced fastest for the forward at B=512
    (1.78 ms/layer vs 2.01 at G=32 — bigger blocks lose more to VMEM
    pressure on the (G, Np, Np) f32 score block than they gain in grid
    amortization); the backward's extra intermediates pipeline best at
    16."""
    for g in (cap, 8, 4, 2):
        if g <= cap and b % g == 0:
            return g
    return 1


def _specs(b, n, h, e, g):
    # array-equal trailing dims: (N, H*E) for the slabs, (H, N) for lse —
    # Mosaic accepts non-(8,128)-divisible block dims when they equal the
    # array dims, and handles its own internal padding
    qkv = pl.BlockSpec((g, n, h * e), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((g, h, n), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return qkv, lse


def _fwd(q, k, v, scale, interpret, with_importance=False):
    b, n, h, e = q.shape
    g = _pick_block_b(b)
    qkv_spec, lse_spec = _specs(b, n, h, e, g)
    kernel = functools.partial(_fwd_kernel, n=n, h=h, e=e, scale=scale)
    imp_spec = pl.BlockSpec((g, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = (qkv_spec, lse_spec) + ((imp_spec,) if with_importance else ())
    out_shape = (
        jax.ShapeDtypeStruct((b, n, h * e), q.dtype),
        jax.ShapeDtypeStruct((b, h, n), jnp.float32),
    ) + ((jax.ShapeDtypeStruct((b, n), jnp.float32),) if with_importance else ())
    outs = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[qkv_spec] * 3,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # independent batch-tile programs: lets Mosaic double-buffer
            # the slab DMA of program i+1 under program i's compute
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q.reshape(b, n, h * e), k.reshape(b, n, h * e), v.reshape(b, n, h * e))
    o, lse = outs[0], outs[1]
    o = o.reshape(b, n, h, e)
    if with_importance:
        return o, lse, outs[2]
    return o, lse


def _bwd(q, k, v, o, do, lse, scale, interpret):
    b, n, h, e = q.shape
    g = _pick_block_b(b, cap=16)
    qkv_spec, lse_spec = _specs(b, n, h, e, g)
    kernel = functools.partial(_bwd_kernel, n=n, h=h, e=e, scale=scale)
    flat = lambda x: x.reshape(b, n, h * e)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[qkv_spec] * 5 + [lse_spec],
        out_specs=(qkv_spec,) * 3,
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, n, h * e), q.dtype) for _ in range(3)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # independent batch-tile programs: lets Mosaic double-buffer
            # the slab DMA of program i+1 under program i's compute
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(flat(q), flat(k), flat(v), flat(o), flat(do), lse)
    shape = (b, n, h, e)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: float, interpret: bool = False,
) -> jnp.ndarray:
    """Fused softmax(scale Q K^T) V over (B, N, H, E) inputs."""
    o, _ = _fwd(q, k, v, scale, interpret)
    return o


def _flash_fwd(q, k, v, scale, interpret):
    o, lse = _fwd(q, k, v, scale, interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, interpret, res, g):
    q, k, v, o, lse = res
    dq, dk, dv = _bwd(q, k, v, o, g.astype(q.dtype), lse, scale, interpret)
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_with_importance(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: float, interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Attention output + head-mean CLS-row attention (B, N).

    The importance vector includes the CLS key at index 0 (the caller
    strips it, matching ``reduce_attention_importance``). FORWARD-ONLY:
    used by frozen-teacher extraction (``models/layers.py`` importance_mode
    'cls'); differentiating through it raises with guidance instead of a
    cryptic Pallas transpose error (use attention_impl='einsum' for a
    trainable cls-importance model)."""
    o, _, imp = _fwd(q, k, v, scale, interpret, with_importance=True)
    return o, imp


def _flash_imp_fwd(q, k, v, scale, interpret):
    return flash_attention_with_importance(q, k, v, scale, interpret), None


def _flash_imp_bwd(scale, interpret, res, g):
    raise NotImplementedError(
        "flash_attention_with_importance is forward-only (frozen-teacher "
        "extraction). For gradients through a cls-importance attention use "
        "attention_impl='einsum'."
    )


flash_attention_with_importance.defvjp(_flash_imp_fwd, _flash_imp_bwd)
