"""Chained micro-benchmarks of spectral-kernel candidates on the real TPU.

Each candidate runs as ONE jitted lax.scan whose carry perturbs the next
input with a data-dependent (numerically ~zero) feedback term, so
iterations are strictly sequenced on device and wall-clock/ITERS is an
honest per-call time through the remote-dispatch tunnel.

Usage: python scripts/microbench.py [group ...]   groups: eigh ns ln
"""

from __future__ import annotations

import sys
import time

ITERS = 30


def chained_time(fn, *args):
    """Time ITERS chained evaluations of fn(*args) -> ms per call."""
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
            eps = (acc * jnp.float32(1e-38))
            a = tuple(x + eps.astype(x.dtype) for x in a)
            return (acc, a), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.float32(0.0), args), None, length=ITERS
        )
        return acc

    # IMPORTANT: through the axon remote-dispatch tunnel,
    # block_until_ready does NOT wait for device execution — only a value
    # fetch does. Time to the scalar fetch; the tunnel RTT amortizes over
    # ITERS chained iterations inside the single scan.
    float(loop(args))  # compile + run once
    t0 = time.perf_counter()
    float(loop(args))
    return (time.perf_counter() - t0) / ITERS * 1000.0


def bench_eigh():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)

    def sym(b, n):
        a = rng.standard_normal((b, n, n)).astype(np.float32)
        return jnp.asarray(a + np.swapaxes(a, -1, -2))

    shapes = [
        (1, 96), (48, 96), (512, 96),
        (1, 192), (28, 192), (256, 192),
        (12, 384), (6, 768),
    ]
    for b, n in shapes:
        a = sym(b, n)
        ms = chained_time(lambda x: jnp.linalg.eigh(x), a)
        print(f"eigh     ({b:>3}, {n:>4}): {ms:8.2f} ms  "
              f"({ms / b * 1000:7.1f} us/matrix)")

    # values-only vs full decomposition
    for b, n in ((28, 192), (48, 96), (12, 192)):
        a = sym(b, n)
        ms = chained_time(lambda x: jnp.linalg.eigvalsh(x), a)
        print(f"eigvalsh ({b:>3}, {n:>4}): {ms:8.2f} ms")

    # pure-JAX QDWH spectral divide-and-conquer (jax's TPU path for large
    # n) with a smaller serial-Jacobi base case
    try:
        from jax._src.tpu.linalg import eigh as tpu_eigh

        for ts in (64, 96):
            def qdwh_eigh(x, ts=ts):
                return jax.vmap(
                    lambda m: tpu_eigh.eigh(m, termination_size=ts)
                )(x)

            for b, n in ((28, 192), (48, 96)):
                a = sym(b, n)
                try:
                    ms = chained_time(qdwh_eigh, a)
                    print(f"qdwh-eigh ts={ts} ({b:>3}, {n:>4}): {ms:8.2f} ms")
                except Exception as e:
                    print(f"qdwh-eigh ts={ts} ({b}, {n}) failed: {type(e).__name__}")
    except Exception as e:  # pragma: no cover
        print(f"qdwh-eigh unavailable: {e}")


def bench_ns():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from basd_tpu.ops.linalg import newton_schulz_polar

    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.standard_normal((2048, 192, 384)).astype(np.float32))

    for steps in (18, 12, 8):
        ms = chained_time(
            lambda x, s=steps: newton_schulz_polar(x, steps=s), m
        )
        print(f"NS polar f32io/bf16 {steps:>2} steps: {ms:8.2f} ms")

    def ns_bf16(x, steps):
        x = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x), (-2, -1), keepdims=True) + 1e-30)
        x = (x / norm).astype(jnp.bfloat16)
        for _ in range(steps):
            xxt = jnp.einsum("...ij,...kj->...ik", x, x)
            x = 1.5 * x - 0.5 * jnp.einsum("...ik,...kj->...ij", xxt, x)
        return x

    for steps in (18, 12):
        ms = chained_time(lambda x, s=steps: ns_bf16(x, s), m)
        print(f"NS polar pure-bf16  {steps:>2} steps: {ms:8.2f} ms")

    # quintic 'polar express'-style iteration: 3 matmuls/step, ~5 steps
    def ns_quintic(x, steps):
        coeffs = [
            (4.0848, -6.8946, 2.9270),
            (3.9505, -6.3029, 2.6377),
            (3.7418, -5.5913, 2.3037),
            (2.8769, -3.1427, 1.2046),
            (2.8366, -3.0525, 1.2012),
            (2.0, -1.0, 0.0),
        ][:steps]
        x = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x), (-2, -1), keepdims=True) + 1e-30)
        x = (x / norm).astype(jnp.bfloat16)
        for a, b, c in coeffs:
            g = jnp.einsum("...ij,...kj->...ik", x, x)
            g2 = jnp.einsum("...ij,...kj->...ik", g, g)
            x = a * x + jnp.einsum(
                "...ik,...kj->...ij", (b * g + c * g2), x
            )
        return x

    for steps in (5, 6):
        ms = chained_time(lambda x, s=steps: ns_quintic(x, s), m)
        print(f"NS quintic bf16     {steps:>2} steps: {ms:8.2f} ms")

    # accuracy sanity vs true polar (via SVD on a small slice, on host)
    import numpy.linalg as la

    small = np.asarray(m[:4], np.float64)
    u, s, vt = la.svd(small, full_matrices=False)
    polar_true = u @ vt
    for name, fn in (
        ("f32io 18", lambda x: newton_schulz_polar(x, steps=18)),
        ("bf16 18", lambda x: ns_bf16(x, 18)),
        ("bf16 12", lambda x: ns_bf16(x, 12)),
        ("quintic 5", lambda x: ns_quintic(x, 5)),
        ("quintic 6", lambda x: ns_quintic(x, 6)),
    ):
        p = np.asarray(fn(m[:4]), np.float64)
        err = np.abs(p - polar_true).max()
        nuc_true = s.sum(-1)
        nuc_est = np.einsum("bij,bij->b", p, small)
        rel = np.abs(nuc_est - nuc_true) / nuc_true
        print(f"  {name:>10}: polar maxerr {err:.3e}  nuc relerr {rel.max():.3e}")


def bench_ln():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((512, 257, 384)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)

    def ln(t):
        mu = jnp.mean(t.astype(jnp.float32), -1, keepdims=True)
        var = jnp.mean(jnp.square(t.astype(jnp.float32)), -1, keepdims=True) - mu**2
        return ((t.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-6)).astype(t.dtype)

    print(f"LN f32 (512,257,384): {chained_time(ln, x):8.2f} ms")
    print(f"LN bf16 (512,257,384): {chained_time(ln, xb):8.2f} ms")


def bench_views():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from basd_tpu.data import augment as aug

    rng = np.random.default_rng(0)
    B, R, S = 512, 293, 224
    u8 = jnp.asarray(rng.integers(0, 256, (B, R, R, 3), np.uint8))
    f32 = u8.astype(jnp.float32)[:, :S, :S, :]
    key = jax.random.PRNGKey(0)
    stats = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))

    def full(img_u8):
        return aug.make_train_views(key, img_u8, S, stats, stats)

    print(f"make_train_views full : {chained_time(full, u8):8.2f} ms")

    def clean_only(img_u8):
        imgs = img_u8.astype(jnp.float32)
        c = aug.center_crop(imgs, S) / 255.0
        return aug.normalize(c, *stats)

    print(f"  clean view          : {chained_time(clean_only, u8):8.2f} ms")

    def rrc_only(imgs):
        keys = jax.random.split(key, (B, 2))

        def one(img, ks):
            crop = aug.random_resized_crop(ks[0], img, S)
            flip = jax.random.bernoulli(ks[1], 0.5)
            return jnp.where(flip, crop[:, ::-1, :], crop)

        return jax.vmap(one)(imgs, keys)

    rrc_in = u8.astype(jnp.float32)
    print(f"  RRC+flip (293->224) : {chained_time(rrc_only, rrc_in):8.2f} ms")

    def taw_only(imgs):
        return aug.trivial_augment_wide_stratified(key, imgs)

    print(f"  TAW stratified      : {chained_time(taw_only, f32):8.2f} ms")

    g = 5 * B // 14
    geo = f32[:g]
    op = jnp.asarray(rng.integers(1, 6, (g,)), jnp.int32)
    mag = jnp.asarray(rng.uniform(-0.9, 0.9, (g,)), jnp.float32)

    def geom_only(x):
        return aug._geom_three_pass(x, op, mag)

    print(f"  geometric 3-pass    : {chained_time(geom_only, geo):8.2f} ms")

    eq_in = f32[: B // 14]
    print(f"  equalize block      : {chained_time(aug._batch_equalize, eq_in):8.2f} ms")

    lab = jnp.asarray(rng.integers(0, 100, (B,)), jnp.int32)

    def mix(x):
        return aug.mixup_cutmix(key, x, lab, 100)[0]

    print(f"  mixup/cutmix        : {chained_time(mix, f32):8.2f} ms")


def bench_teacher():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from basd_tpu.models import create_model, init_model
    from basd_tpu.models.registry import teacher_extract

    B, IMG = 512, 224
    teacher = create_model(
        "deit_small_patch16_224", img_size=IMG, num_classes=0,
        importance_mode="cls", dtype=jnp.bfloat16,
    )
    t_vars = init_model(teacher, jax.random.PRNGKey(1), IMG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def fwd(xx):
        toks, imp = teacher_extract(teacher, t_vars, xx)
        return toks.astype(jnp.float32).sum() + imp.sum()

    print(f"teacher fwd+extract (B={B}): {chained_time(fwd, x):8.2f} ms")

    def fwd_logits_only(xx):
        out = teacher.module.apply(t_vars, xx, deterministic=True)
        return out["logits"].astype(jnp.float32).sum()

    print(f"teacher fwd logits-only    : {chained_time(fwd_logits_only, x):8.2f} ms")


if __name__ == "__main__":
    groups = sys.argv[1:] or ["eigh", "ns"]
    import jax

    print(f"platform={jax.default_backend()}", file=sys.stderr)
    if "eigh" in groups:
        bench_eigh()
    if "ns" in groups:
        bench_ns()
    if "ln" in groups:
        bench_ln()
    if "views" in groups:
        bench_views()
    if "teacher" in groups:
        bench_teacher()
