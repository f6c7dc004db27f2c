"""Profile the bench train step on the real TPU and aggregate XLA op time.

Usage: python scripts/profile_step.py [batch_size]

Captures a jax.profiler perfetto trace of 3 chained train steps and prints
the top XLA ops by total duration, plus coarse buckets (matmul/conv, eigh,
view/augment, layernorm, other).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512

    import jax
    import numpy as np

    import bench

    bench.BATCH_SIZE = batch
    # monkeypatch: reuse bench's setup but stop before timing
    trainer, sharded = _setup(batch)

    key = jax.random.PRNGKey(0)
    # warm up / compile
    for _ in range(3):
        key, sub = jax.random.split(key)
        trainer.opt_state, metrics = trainer._train_step(
            trainer.opt_state, trainer.teacher_vars, trainer.sel_buffers,
            sharded["image"], sharded["label"], sub,
        )
    jax.block_until_ready(metrics["loss_sum"])
    print("compiled; tracing 3 steps", file=sys.stderr)

    tmpdir = tempfile.mkdtemp(prefix="basd_trace_")
    with jax.profiler.trace(tmpdir, create_perfetto_trace=True):
        for _ in range(3):
            key, sub = jax.random.split(key)
            trainer.opt_state, metrics = trainer._train_step(
                trainer.opt_state, trainer.teacher_vars, trainer.sel_buffers,
                sharded["image"], sharded["label"], sub,
            )
        jax.block_until_ready(metrics["loss_sum"])

    path = glob.glob(f"{tmpdir}/**/perfetto_trace.json.gz", recursive=True)[0]
    with gzip.open(path) as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # find the "XLA Ops" track
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    xla_tracks = {k for k, v in tid_names.items() if "XLA Ops" in v}

    per_op = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in xla_tracks:
            per_op[e["name"]] += e.get("dur", 0)

    # join with HLO metadata: instruction name -> source op_name
    meta = _hlo_metadata(trainer, sharded)

    total = sum(per_op.values()) / 3.0  # per step, us
    print(f"\ntotal XLA op time/step: {total / 1000:.1f} ms  (batch={batch})")
    print(f"{'us/step':>10}  {'%':>5}  op  ::  source")
    for name, dur in per_op.most_common(60):
        d = dur / 3.0
        src = meta.get(name, "?")[-150:]
        print(f"{d:>10.0f}  {100 * d / total:>5.1f}  {name[:40]}  ::  {src}")

    # bucket by source path
    buckets = collections.Counter()
    bucket_ops = collections.defaultdict(collections.Counter)
    for name, dur in per_op.items():
        src = meta.get(name, "")
        n = (name + " " + src).lower()
        if re.search(r"eigh|qdwh|svd|jacobi", n):
            b = "eigh/svd"
        elif re.search(r"make_train_views|mixup|augment|equalize|barrel|shift|_rrc|scale_and_translate|taw", n):
            b = "views/augment"
        elif re.search(r"transpose\(images\)|convert_element_type\(images\)", n):
            b = "views/augment"
        elif re.search(r"transpose\(jvp\(visiontransformer", n):
            b = "student bwd"
        elif re.search(r"backward|transpose\(jvp|grad", n):
            # transpose(jvp(...)) scopes that are NOT the student model:
            # selector / Procrustes / CE backward
            b = "loss bwd"
        elif re.search(r"jvp\(visiontransformer\)", n):
            b = "student fwd"
        elif re.search(r"teacher|visiontransformer", n):
            # the frozen teacher runs OUTSIDE value_and_grad: its ops are
            # the plain (non-jvp) VisionTransformer scope
            b = "teacher fwd"
        elif re.search(r"jvp\(|student|vision|loss_fn", n):
            # jvp(...) forward scopes outside the student model: the loss
            # math under value_and_grad (Grams, NS polar, Jacobi, CE)
            b = "loss fwd"
        else:
            b = "other"
        buckets[b] += dur
        bucket_ops[b][f"{name}  ::  {src[-110:]}"] += dur
    print("\nbuckets (ms/step):")
    for b, dur in buckets.most_common():
        print(f"  {b:<22} {dur / 3000:>8.1f}")

    # detailed per-op breakdown inside requested buckets
    for want in sys.argv[2:]:
        print(f"\n--- {want} ops (us/step) ---")
        for line, dur in bucket_ops[want].most_common(40):
            print(f"{dur / 3.0:>10.0f}  {line}")


def _hlo_metadata(trainer, sharded) -> dict:
    """Map compiled HLO instruction names -> source op_name metadata."""
    import jax

    key = jax.random.PRNGKey(0)
    compiled = trainer._train_step.jitted.lower(
        trainer.opt_state, trainer.teacher_vars, trainer.sel_buffers,
        trainer._train_step.prepare(sharded["image"]),
        sharded["image"], sharded["label"], key,
    ).compile()
    txt = compiled.as_text()
    meta = {}
    # lines like:  %fusion.65 = ... metadata={op_name="jit(step)/..." ...}
    pat = re.compile(r"%?([\w.\-]+) = .*?metadata=\{[^}]*op_name=\"([^\"]+)\"")
    for line in txt.splitlines():
        m = pat.search(line)
        if m:
            meta[m.group(1)] = m.group(2)
    return meta


def _setup(batch):
    import jax
    import jax.numpy as jnp

    from basd_tpu.config import ConfigNode
    from basd_tpu.models import create_model, init_model
    from basd_tpu.parallel.mesh import make_mesh, shard_batch
    from basd_tpu.training.trainer import Trainer
    import bench as B
    import numpy as np

    mesh = make_mesh(data=-1, model=1)
    IMG = B.IMG
    cfg = ConfigNode(
        {
            "run": {"name": "prof", "output_dir": "/tmp/basd_prof", "seed": 0},
            "data": {
                "dataset": "synthetic/imagenet100",
                "eval_datasets": [],
                "batch_size": batch,
                "eval_crop_ratio": 224 / 256,
                "source": "synthetic",
            },
            "model": {
                "student_preset": "deit_tiny_patch16_224",
                "drop_path_rate": 0.1,
                "num_classes": 100,
                "arch_overrides": {},
                "vit": {"img_size": IMG, "patch_size": 16},
            },
            "checkpoint": {"resume_from": None, "path": None},
            "training": {
                "num_epochs": 1,
                "learning_rate": 1e-3,
                "weight_decay": 0.05,
                "label_smoothing": 0.01,
            },
            "basd": {
                "teacher_model_name": "deit_small_patch16_224",
                "num_extraction_points": 4,
                "spectral_backend": "jacobi",
                "max_rank": 96,
            },
            "tpu": {"mesh": {"data": -1, "model": 1}, "remat": True},
        }
    )
    teacher = create_model(
        "deit_small_patch16_224", img_size=IMG, num_classes=0,
        importance_mode="cls", dtype=jnp.bfloat16, collect_alias=True,
    )
    t_vars = init_model(teacher, jax.random.PRNGKey(1), IMG)
    student = create_model(
        "deit_tiny_patch16_224", img_size=IMG, num_classes=100,
        drop_path_rate=0.1, remat=True, dtype=jnp.bfloat16,
    )
    s_vars = init_model(student, jax.random.PRNGKey(2), IMG, fan_in_init=True)
    stats = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    trainer = Trainer(
        cfg, student_bundle=student, student_params=s_vars["params"],
        teacher_bundle=teacher, teacher_vars=t_vars, mesh=mesh,
        dataset_stats=stats, teacher_stats=stats,
    )
    rng = np.random.default_rng(0)
    r = round(IMG / cfg.data.eval_crop_ratio)
    b = {
        "image": rng.integers(0, 256, (batch, r, r, 3), np.uint8),
        "label": rng.integers(0, 100, (batch,)).astype(np.int32),
    }
    return trainer, shard_batch(mesh, b)


if __name__ == "__main__":
    main()
