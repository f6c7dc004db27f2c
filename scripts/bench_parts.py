"""Chained component timings of the BASD train step on the real TPU.

Each part compiles as ONE jitted lax.scan whose carry feeds the next
iteration, timed to a scalar value fetch (the only honest timing through
the axon remote-dispatch tunnel — see CLAUDE.md).

Usage: python scripts/bench_parts.py [part ...]
  parts: teacher teacher_barrier teacher_fused student_fwd student_step
         student_step_fused loss_step views
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 20
B = 512
IMG = 224
LOSS_DTYPE = "bfloat16"


def chained_time(fn, *args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(args):
        def body(carry, _):
            acc, a = carry
            out = fn(*a)
            s = sum(
                jnp.sum(o).astype(jnp.float32)
                for o in jax.tree_util.tree_leaves(out)
            )
            acc = acc + s
            eps = acc * jnp.float32(1e-38)
            a = tuple(
                x + eps.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating)
                else x
                for x in a
            )
            return (acc, a), None

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0.0), args), None,
                                   length=iters)
        return acc

    t0 = time.perf_counter()
    float(loop(args))  # compile + run once
    print(f"    (compile+first: {time.perf_counter() - t0:.1f}s)",
          file=sys.stderr)
    t0 = time.perf_counter()
    float(loop(args))
    return (time.perf_counter() - t0) / iters * 1000.0


def _teacher(barrier: bool, attention_impl: str = "auto"):
    import jax
    import jax.numpy as jnp

    from basd_tpu.models import create_model, init_model
    from basd_tpu.models.registry import teacher_extract

    bundle = create_model(
        "deit_small_patch16_224", img_size=IMG, num_classes=0,
        importance_mode="cls", dtype=jnp.bfloat16,
    )
    if barrier or attention_impl != "auto":
        bundle = type(bundle)(
            bundle.name,
            bundle.module.clone(
                ln_barrier=barrier, attention_impl=attention_impl
            ),
            bundle.cfg, bundle.info, bundle.mean, bundle.std,
        )
    variables = init_model(bundle, jax.random.PRNGKey(0), IMG)
    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (B, IMG, IMG, 3)),
        jnp.bfloat16,
    )

    def fwd(x):
        t, imp = teacher_extract(bundle, variables, x)
        return t.astype(jnp.float32).mean(), imp.mean()

    ms = chained_time(fwd, x)
    tag = "teacher_barrier" if barrier else (
        "teacher_fused" if attention_impl == "fused_block" else "teacher"
    )
    print(f"{tag:16s}: {ms:8.2f} ms/fwd (B={B})")


def bench_teacher():
    _teacher(False)


def bench_teacher_barrier():
    _teacher(True)


def bench_teacher_fused():
    """Teacher forward with the fused LN1+qkv+flash+proj+residual block
    attention kernel (ops/pallas/fused_block_attn), opt-in pending
    hardware validation — compare against the `teacher` part."""
    _teacher(False, attention_impl="fused_block")


def bench_student_fwd():
    import jax
    import jax.numpy as jnp

    from basd_tpu.models import create_model, init_model

    bundle = create_model(
        "deit_tiny_patch16_224", img_size=IMG, num_classes=1000,
        drop_path_rate=0.1, remat=True, dtype=jnp.bfloat16,
    )
    variables = init_model(bundle, jax.random.PRNGKey(0), IMG)
    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (B, IMG, IMG, 3)),
        jnp.bfloat16,
    )

    def fwd(x):
        out = bundle.module.apply(variables, x, deterministic=True)
        return (out["logits"].astype(jnp.float32).mean(),
                out["tokens"].astype(jnp.float32).mean())

    ms = chained_time(fwd, x)
    print(f"student_fwd     : {ms:8.2f} ms/fwd (B={B})")


def _student_step(attention_impl: str):
    """Student forward+backward (sum-of-squares loss over logits+tokens)
    — the gradient path the train step pays; compares the flash module
    chain vs the fused_block_train kernel."""
    import jax
    import jax.numpy as jnp

    from basd_tpu.models import create_model, init_model

    bundle = create_model(
        "deit_tiny_patch16_224", img_size=IMG, num_classes=1000,
        drop_path_rate=0.1, remat=_REMAT, dtype=jnp.bfloat16,
    )
    module = bundle.module
    if attention_impl != "auto":
        module = module.clone(attention_impl=attention_impl)
    variables = init_model(bundle, jax.random.PRNGKey(0), IMG)
    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (B, IMG, IMG, 3)),
        jnp.bfloat16,
    )
    drop = jax.random.PRNGKey(2)

    def loss_fn(params, x):
        out = module.apply(
            {"params": params}, x, deterministic=False,
            rngs={"droppath": drop},
        )
        return (
            out["logits"].astype(jnp.float32).mean()
            + out["tokens"].astype(jnp.float32).mean()
        )

    grad_fn = jax.grad(loss_fn)

    def step(x):
        g = grad_fn(variables["params"], x)
        return jax.tree_util.tree_map(lambda a: a.astype(jnp.float32).mean(), g)

    ms = chained_time(step, x)
    tag = f"student_step[{attention_impl},remat={_REMAT}]"
    print(f"{tag:40s}: {ms:8.2f} ms (B={B})")


_REMAT = True


def bench_student_step():
    _student_step("auto")


def bench_student_step_fused():
    _student_step("fused_block_train")


def bench_loss_step():
    """Full BASD loss (selector eigh/Jacobi + NS-polar Procrustes +
    UW-SO) value_and_grad at production shapes — the ~36 ms loss slice
    of the train step (stacked 192^2 eigh ~17, NS ~11, principal-angle
    Jacobi ~8), isolated from the model passes."""
    import jax
    import jax.numpy as jnp

    from basd_tpu.losses import BASDLossConfig, basd_loss, init_basd_loss

    l_t, n_t, d_t = 12, 196, 384
    p, n_s, d_s, c = 4, 196, 192, 1000
    cfg = BASDLossConfig(
        student_dim=d_s, teacher_dim=d_t, student_depth=12,
        num_student_tokens=n_s, num_extraction_points=p,
        label_smoothing=0.1, teacher_has_cls_token=True,
    )
    params, buffers = init_basd_loss(jax.random.PRNGKey(0), cfg)
    # LOSS_DTYPE knob: XLA-CPU's dot thunk can't run bf16 x bf16 = f32,
    # so CPU smoke tests override this to float32.
    tok_dt = jnp.dtype(LOSS_DTYPE)
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    t_tok = jax.random.normal(ks[0], (l_t, B, n_t, d_t), tok_dt)
    t_imp = jax.nn.softmax(
        jax.random.normal(ks[1], (l_t, B, n_t), jnp.float32)
    )
    s_tok = jax.random.normal(ks[2], (p, B, n_s, d_s), tok_dt)
    logits = jax.random.normal(ks[3], (B, c), jnp.float32)
    labels = jax.random.randint(ks[4], (B,), 0, c, jnp.int32)

    def loss_fn(params, s_tok, logits):
        loss, _ = basd_loss(
            params, buffers, logits, labels, s_tok, t_tok, t_imp, cfg
        )
        return loss

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))

    def step(s_tok, logits):
        loss, (gp, gs, gl) = grad_fn(params, s_tok, logits)
        return (
            loss,
            gs.astype(jnp.float32).mean(),
            gl.mean(),
            sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(gp)),
        )

    ms = chained_time(step, s_tok, logits)
    print(f"loss_step       : {ms:8.2f} ms (B={B}, L={l_t}, P={p})")


def bench_views():
    import jax
    import jax.numpy as jnp

    from basd_tpu.data import augment as aug

    r = round(IMG / 0.875)
    imgs = jax.random.randint(
        jax.random.PRNGKey(0), (B, r, r, 3), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    stats = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))

    def views(key_f):
        key = jax.random.PRNGKey(0)
        key = jax.random.fold_in(key, (key_f * 1e9).astype(jnp.int32))
        # out_dtype matches the production train step (bf16 on TPU —
        # trainer.py views_dtype); timing f32 views would charge two
        # extra full (B,S,S,3) HBM slabs the real step no longer pays.
        clean, augd = aug.make_train_views(
            key, imgs, IMG, stats, stats, out_dtype=jnp.bfloat16
        )
        return clean.astype(jnp.float32).mean(), augd.astype(jnp.float32).mean()

    ms = chained_time(views, jax.numpy.float32(1.0))
    print(f"views           : {ms:8.2f} ms (B={B})")


PARTS = {
    "teacher": bench_teacher,
    "teacher_barrier": bench_teacher_barrier,
    "teacher_fused": bench_teacher_fused,
    "student_fwd": bench_student_fwd,
    "student_step": bench_student_step,
    "student_step_fused": bench_student_step_fused,
    "loss_step": bench_loss_step,
    "views": bench_views,
}


def main():
    import jax

    print(f"platform={jax.default_backend()}", file=sys.stderr)
    names = sys.argv[1:] or list(PARTS)
    for n in names:
        PARTS[n]()


if __name__ == "__main__":
    main()
