"""Fused multi-head attention (Pallas, TPU).

The einsum attention path materializes the (B, H, N, N) float32
probability tensor in HBM twice per layer (logits + probs) — traced at
~2.5 ms/layer at B=512, N=197 on v5e, ~44 ms/step across the teacher and
student stacks. This kernel keeps scores/probabilities in VMEM: one
program handles ``block_b`` images (all heads, looped), computing

    S = scale * Q_h K_h^T   (f32 accumulate, bf16 MXU inputs)
    P = softmax_k(S)        (f32)
    O_h = P V_h             (f32 accumulate)

entirely on-chip. Backward is the standard flash recompute: P is rebuilt
from the saved row logsumexp, then dV = P^T dO, dP = dO V^T,
dS = P (dP - rowsum(dO * O)), dQ = scale dS K, dK = scale dS^T Q.

Layout (round 3): the kernel consumes the FUSED qkv projection slab
(B, N, 3*H*E) exactly as the Dense layer produces it — q/k/v and heads
are static lane slices (head i: q at [i*E], k at [D + i*E], v at
[2*D + i*E], D = H*E). The previous 3-operand API forced XLA to
materialize a q/k/v split before the pallas_call (traced ~0.74 ms/layer
of pure HBM copies at B=512) and a dq/dk/dv concat after the backward;
the slab API eliminates both, and the backward writes one dqkv slab that
flows straight into the Dense VJP.

Blocks are declared at the TRUE token count (block dims array-equal in
the last two axes — Mosaic's alternative to (8,128)-divisibility), so
N=197 pads only to Mosaic's 8-sublane granularity instead of 256 lanes:
~22% less matmul/softmax work, no explicit padding masks.

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


def _fwd_kernel(qkv_ref, o_ref, lse_ref, *imp_ref,
                n: int, h: int, e: int, scale: float):
    d = h * e
    imp_acc = None
    for i in range(h):
        q = qkv_ref[:, :, i * e:(i + 1) * e]
        k = qkv_ref[:, :, d + i * e:d + (i + 1) * e]
        v = qkv_ref[:, :, 2 * d + i * e:2 * d + (i + 1) * e]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (G, N, N)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # deferred normalization: scale O by 1/l after the PV matmul
        # ((G, N, E) elementwise) instead of normalizing the full
        # (G, N, N) probability block — 4x fewer VPU divides at E=64
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[:, :, i * e:(i + 1) * e] = o.astype(o_ref.dtype)
        lse_ref[:, i, :] = m[..., 0] + jnp.log(l[..., 0])
        if imp_ref:
            # head-mean of the CLS (row 0) attention distribution —
            # the reference's distillation importance
            # (src/losses/relational.py:22-24), CLS key stripped by the
            # caller.
            row0 = p[:, 0, :] / l[:, 0]  # (G, N)
            imp_acc = row0 if imp_acc is None else imp_acc + row0
    if imp_ref:
        imp_ref[0][...] = imp_acc / h


def _bwd_kernel(
    qkv_ref, o_ref, do_ref, lse_ref, dqkv_ref,
    *, n: int, h: int, e: int, scale: float,
):
    d = h * e
    for i in range(h):
        q = qkv_ref[:, :, i * e:(i + 1) * e]
        k = qkv_ref[:, :, d + i * e:d + (i + 1) * e]
        v = qkv_ref[:, :, 2 * d + i * e:2 * d + (i + 1) * e]
        sl = slice(i * e, (i + 1) * e)
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
        )  # (G, N_k, E)
        dp = jax.lax.dot_general(
            dob, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, N_q, N_k)
        delta = jnp.sum(do * o, axis=-1)  # (G, N)
        ds = (p * (dp - delta[:, :, None]) * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, i * e:(i + 1) * e] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, d + i * e:d + (i + 1) * e] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * d + i * e:2 * d + (i + 1) * e] = dv.astype(
            dqkv_ref.dtype
        )


def _fwd_kernel_hp(q_ref, k_ref, v_ref, o_ref, imp_ref,
                   *, n: int, h: int, e: int, scale: float):
    """Head-pair grid forward (importance path): one program = one
    (batch-tile, head-pair) cell.

    The qkv slab is passed THREE times with different lane index maps, so
    each program DMAs only its pair's (G, N, 2E) q/k/v slices (2E = 128
    lanes, the minimum Mosaic lane block). The (G, N, N) f32 score
    working set is h/2-fold smaller than the head-loop kernel's, letting
    the batch tile grow and Mosaic pipeline pair j+1's DMA under pair
    j's compute. No lse output: this lowering serves the forward-only
    frozen-teacher extraction (even head count; odd h falls back to the
    head-loop kernel)."""
    acc = None
    for i in range(2):
        q = q_ref[:, :, i * e:(i + 1) * e]
        k = k_ref[:, :, i * e:(i + 1) * e]
        v = v_ref[:, :, i * e:(i + 1) * e]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (G, N, N)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[:, :, i * e:(i + 1) * e] = o.astype(o_ref.dtype)
        row0 = p[:, 0, :] / (l[:, 0] * h)  # (G, N), pre-divided head mean
        acc = row0 if acc is None else acc + row0
    # head-mean CLS-row importance accumulated across the (sequential)
    # head-pair grid dimension into the revisited block
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        imp_ref[...] = acc

    @pl.when(j > 0)
    def _acc():
        imp_ref[...] += acc


def _fwd_hp(qkv, n, h, e, scale, interpret):
    """Head-pair-grid (o, importance) forward; requires h % 2 == 0."""
    b = qkv.shape[0]
    d = h * e
    hp = h // 2
    g = _pick_block_b(b, cap=_HP_BLOCK_B)
    head_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (g, n, 2 * e), lambda i, j, off=off: (i, 0, off + j),
        memory_space=pltpu.VMEM,
    )
    o_spec = pl.BlockSpec((g, n, 2 * e), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    imp_spec = pl.BlockSpec((g, n), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel_hp, n=n, h=h, e=e, scale=scale)
    o, imp = pl.pallas_call(
        kernel,
        grid=(b // g, hp),
        in_specs=[head_spec(0), head_spec(hp), head_spec(2 * hp)],
        out_specs=(o_spec, imp_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # the head-pair dim revisits the importance block -> sequential
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return o, imp


_HP_BLOCK_B = 16


def _pick_block_b(b: int, cap: int = 8) -> int:
    """Images per program. G=8 traced fastest for the forward at B=512
    (1.78 ms/layer vs 2.01 at G=32 — bigger blocks lose more to VMEM
    pressure on the (G, N, N) f32 score block than they gain in grid
    amortization); the backward's extra intermediates pipeline best at
    16."""
    for g in (cap, 8, 4, 2):
        if g <= cap and b % g == 0:
            return g
    return 1


def _fwd(qkv, n, h, e, scale, interpret, with_importance=False):
    b = qkv.shape[0]
    d = h * e
    g = _pick_block_b(b)
    qkv_spec = pl.BlockSpec((g, n, 3 * d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((g, h, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    imp_spec = pl.BlockSpec((g, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, n=n, h=h, e=e, scale=scale)
    out_specs = (o_spec, lse_spec) + ((imp_spec,) if with_importance else ())
    out_shape = (
        jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        jax.ShapeDtypeStruct((b, h, n), jnp.float32),
    ) + ((jax.ShapeDtypeStruct((b, n), jnp.float32),) if with_importance else ())
    outs = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[qkv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # independent batch-tile programs: lets Mosaic double-buffer
            # the slab DMA of program i+1 under program i's compute
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(qkv)
    if with_importance:
        return outs[0], outs[1], outs[2]
    return outs[0], outs[1]


def _bwd(qkv, o, do, lse, n, h, e, scale, interpret):
    b = qkv.shape[0]
    d = h * e
    g = _pick_block_b(b, cap=16)
    qkv_spec = pl.BlockSpec((g, n, 3 * d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((g, h, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, n=n, h=h, e=e, scale=scale)
    dqkv = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[qkv_spec, o_spec, o_spec, lse_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, 3 * d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(qkv, o, do, lse)
    return dqkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def flash_attention_qkv(
    qkv: jnp.ndarray, num_heads: int, scale: float, interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention over the packed (B, N, 3*H*E) qkv slab.

    Returns the (B, N, H*E) attention output (pre-projection)."""
    b, n, d3 = qkv.shape
    d = d3 // 3
    e = d // num_heads
    o, _ = _fwd(qkv, n, num_heads, e, scale, interpret)
    return o


def _flash_qkv_fwd(qkv, num_heads, scale, interpret):
    b, n, d3 = qkv.shape
    e = d3 // 3 // num_heads
    o, lse = _fwd(qkv, n, num_heads, e, scale, interpret)
    return o, (qkv, o, lse)


def _flash_qkv_bwd(num_heads, scale, interpret, res, g):
    qkv, o, lse = res
    b, n, d3 = qkv.shape
    e = d3 // 3 // num_heads
    dqkv = _bwd(qkv, o, g.astype(qkv.dtype), lse, n, num_heads, e, scale,
                interpret)
    return (dqkv,)


flash_attention_qkv.defvjp(_flash_qkv_fwd, _flash_qkv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def flash_attention_qkv_with_importance(
    qkv: jnp.ndarray, num_heads: int, scale: float, interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Attention output + head-mean CLS-row attention (B, N).

    The importance vector includes the CLS key at index 0 (the caller
    strips it, matching ``reduce_attention_importance``). FORWARD-ONLY:
    used by frozen-teacher extraction (``models/layers.py`` importance_mode
    'cls'); differentiating through it raises with guidance instead of a
    cryptic Pallas transpose error (use attention_impl='einsum' for a
    trainable cls-importance model)."""
    b, n, d3 = qkv.shape
    e = d3 // 3 // num_heads
    if num_heads % 2 == 0:
        return _fwd_hp(qkv, n, num_heads, e, scale, interpret)
    o, _, imp = _fwd(qkv, n, num_heads, e, scale, interpret,
                     with_importance=True)
    return o, imp


def _flash_imp_fwd(qkv, num_heads, scale, interpret):
    return (
        flash_attention_qkv_with_importance(qkv, num_heads, scale, interpret),
        None,
    )


def _flash_imp_bwd(num_heads, scale, interpret, res, g):
    raise NotImplementedError(
        "flash_attention_qkv_with_importance is forward-only "
        "(frozen-teacher extraction). For gradients through a "
        "cls-importance attention use attention_impl='einsum'."
    )


flash_attention_qkv_with_importance.defvjp(_flash_imp_fwd, _flash_imp_bwd)


# -- (B, N, H, E) convenience wrappers (tests / external callers) ----------


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: float, interpret: bool = False,
) -> jnp.ndarray:
    """Fused softmax(scale Q K^T) V over separate (B, N, H, E) inputs.

    Thin wrapper over ``flash_attention_qkv`` (packs the slab; the model
    path calls the slab API directly and never pays this concat)."""
    b, n, h, e = q.shape
    qkv = jnp.concatenate(
        [q.reshape(b, n, h * e), k.reshape(b, n, h * e),
         v.reshape(b, n, h * e)], axis=-1,
    )
    return flash_attention_qkv(qkv, h, scale, interpret).reshape(b, n, h, e)


def flash_attention_with_importance(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: float, interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Wrapper over ``flash_attention_qkv_with_importance`` for separate
    q/k/v inputs. Forward-only (see the slab variant)."""
    b, n, h, e = q.shape
    qkv = jnp.concatenate(
        [q.reshape(b, n, h * e), k.reshape(b, n, h * e),
         v.reshape(b, n, h * e)], axis=-1,
    )
    o, imp = flash_attention_qkv_with_importance(qkv, h, scale, interpret)
    return o.reshape(b, n, h, e), imp
