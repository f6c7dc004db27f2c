"""End-to-end training tests: tiny trainer steps, checkpoint resume,
sharded execution on the fake-device mesh, and the full CLI."""

import json
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from basd_tpu.config import ConfigNode
from basd_tpu.data.sources import SyntheticSource
from basd_tpu.models import create_model, init_model
from basd_tpu.parallel.mesh import make_mesh
from basd_tpu.training.trainer import Trainer


def tiny_config(tmp_path, **overrides) -> ConfigNode:
    cfg = ConfigNode(
        {
            "run": {"name": "tiny", "output_dir": str(tmp_path), "seed": 0},
            "data": {
                "dataset": "synthetic/tiny",
                "eval_datasets": [],
                "batch_size": 8,
                "eval_crop_ratio": 0.8,
                "source": "synthetic",
                "limit_train_batches": 4,
                "limit_eval_batches": 2,
            },
            "model": {
                "student_preset": "deit_tiny_patch16_224",
                "drop_path_rate": 0.1,
                "num_classes": 10,
                "arch_overrides": {},
                "vit": {"img_size": 32, "patch_size": 16},
            },
            "checkpoint": {"resume_from": None, "path": None},
            "training": {
                "num_epochs": 1,
                "learning_rate": 1e-3,
                "weight_decay": 0.05,
                "label_smoothing": 0.1,
            },
            "basd": {
                "teacher_model_name": "deit_small_patch16_224",
                "num_extraction_points": 2,
                "spectral_backend": "gram",
            },
            "tpu": {
                "mesh": {"data": 1, "model": 1},
                "remat": False,
            },
        }
    )
    for k, v in overrides.items():
        cfg.update_path(k, v)
    return cfg


def build_tiny_trainer(tmp_path, mesh, **cfg_overrides):
    cfg = tiny_config(tmp_path, **cfg_overrides)
    teacher = create_model(
        "deit_small_patch16_224",
        img_size=32,
        num_classes=0,
        arch_overrides=dict(embed_dim=64, depth=3, num_heads=2, mlp_ratio=2.0),
        importance_mode="cls",
        dtype=jnp.bfloat16,
    )
    t_vars = init_model(teacher, jax.random.PRNGKey(1), 32)
    student = create_model(
        "deit_tiny_patch16_224",
        img_size=32,
        num_classes=10,
        drop_path_rate=0.1,
        arch_overrides=dict(embed_dim=48, depth=3, num_heads=2, mlp_ratio=2.0),
        dtype=jnp.bfloat16,
    )
    s_vars = init_model(student, jax.random.PRNGKey(2), 32, fan_in_init=True)
    stats = ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    trainer = Trainer(
        cfg,
        student_bundle=student,
        student_params=s_vars["params"],
        teacher_bundle=teacher,
        teacher_vars=t_vars,
        mesh=mesh,
        dataset_stats=stats,
        teacher_stats=stats,
    )
    return trainer, cfg


def test_train_epoch_and_eval(tmp_path):
    mesh = make_mesh(data=1)
    trainer, _ = build_tiny_trainer(tmp_path, mesh)
    source = SyntheticSource("synthetic/tiny")
    metrics = trainer.train_epoch(source, epoch=0)
    assert np.isfinite(metrics["train_loss"])
    assert 0.0 <= metrics["train_acc"] <= 100.0
    val = trainer.evaluate(source)
    assert np.isfinite(val["loss"])
    assert 0.0 <= val["val_acc"] <= 100.0
    assert 0.0 <= val["val_acc_top5"] <= 100.0
    assert val["val_acc_top5"] >= val["val_acc"]


def test_loss_decreases_over_epochs(tmp_path):
    mesh = make_mesh(data=1)
    trainer, _ = build_tiny_trainer(
        tmp_path, mesh, **{"data.limit_train_batches": 8}
    )
    source = SyntheticSource("synthetic/tiny")
    # epoch must advance so each epoch sees a DIFFERENT shuffle order —
    # feeding epoch=0 repeatedly would only test refitting one batch order
    losses = [
        trainer.train_epoch(source, epoch=e)["train_loss"] for e in range(4)
    ]
    assert losses[-1] < losses[0], losses


def test_checkpoint_save_and_resume(tmp_path):
    mesh = make_mesh(data=1)
    trainer, cfg = build_tiny_trainer(tmp_path, mesh)
    source = SyntheticSource("synthetic/tiny")
    trainer.train_epoch(source, epoch=0)
    trainer.best_val_acc = 42.0
    trainer.metrics_history["train_loss"].append(1.23)
    trainer.save_checkpoint("latest", epoch=0)

    trainer2, _ = build_tiny_trainer(tmp_path, mesh)
    start = trainer2.load_checkpoint(str(tmp_path / "tiny/checkpoints/latest"))
    assert start == 1
    assert trainer2.best_val_acc == 42.0
    assert trainer2.metrics_history["train_loss"] == [1.23]
    a = jax.tree_util.tree_leaves(trainer.opt_state.x)
    b = jax.tree_util.tree_leaves(trainer2.opt_state.x)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sharded_train_step_runs(tmp_path, devices8):
    mesh = make_mesh(data=2, model=1)
    trainer, _ = build_tiny_trainer(tmp_path, mesh, **{"tpu.mesh.data": 2})
    source = SyntheticSource("synthetic/tiny")
    metrics = trainer.train_epoch(source, epoch=0)
    assert np.isfinite(metrics["train_loss"])


def test_tensor_sharded_params(tmp_path, devices8):
    mesh = make_mesh(data=2, model=2)
    trainer, _ = build_tiny_trainer(tmp_path, mesh)
    # qkv kernels sharded over model axis
    qkv = trainer.opt_state.x["student"]["blocks"]["attn"]["qkv"]["kernel"]
    specs = qkv.sharding.spec
    assert "model" in str(specs)
    source = SyntheticSource("synthetic/tiny")
    metrics = trainer.train_epoch(source, epoch=0)
    assert np.isfinite(metrics["train_loss"])


@pytest.mark.slow
def test_full_cli(tmp_path):
    from basd_tpu import train as train_cli

    train_cli.main(
        [
            "experiment=smoke_synthetic",
            f"run.output_dir={tmp_path}",
            "training.num_epochs=1",
            "+data.limit_train_batches=2",
            "+data.limit_eval_batches=2",
            "+eval.efficiency_batches=2",
        ]
    )
    out = tmp_path / "smoke_synthetic"
    metrics = json.loads((out / "metrics.json").read_text())
    assert "primary" in metrics and "efficiency" in metrics
    assert metrics["efficiency"]["param_count"] > 0
    assert (out / "config.yaml").exists()
    assert (out / "checkpoints/latest/custom_state.json").exists()


def test_cnn_to_vit_distillation(tmp_path):
    """Cross-architecture path (reference Table 2 / BASELINE config 3):
    CNN teacher -> single-layer tokens with uniform importance, no
    intrinsic-dim student derivation."""
    mesh = make_mesh(data=1)
    cfg = tiny_config(tmp_path)
    cfg.basd.teacher_model_name = "convnextv2_tiny.fcmae"

    teacher = create_model(
        "convnextv2_tiny.fcmae", img_size=32, dtype=jnp.bfloat16
    )
    t_vars = init_model(teacher, jax.random.PRNGKey(1), 32)
    assert teacher.info["feature_format"] == "nhwc"
    assert teacher.info["has_cls_token"] is False

    student = create_model(
        "deit_tiny_patch16_224",
        img_size=32,
        num_classes=10,
        drop_path_rate=0.1,
        arch_overrides=dict(embed_dim=48, depth=3, num_heads=2, mlp_ratio=2.0),
        dtype=jnp.bfloat16,
    )
    s_vars = init_model(student, jax.random.PRNGKey(2), 32, fan_in_init=True)
    stats = ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    trainer = Trainer(
        cfg,
        student_bundle=student,
        student_params=s_vars["params"],
        teacher_bundle=teacher,
        teacher_vars=t_vars,
        mesh=mesh,
        dataset_stats=stats,
        teacher_stats=stats,
    )
    # CNN teacher: teacher_dim = 768, single layer
    assert trainer.loss_cfg.teacher_dim == 768
    assert trainer.loss_cfg.teacher_has_cls_token is False
    source = SyntheticSource("synthetic/tiny")
    metrics = trainer.train_epoch(source, epoch=0)
    assert np.isfinite(metrics["train_loss"])


def test_eval_suite_with_robustness_subset(tmp_path):
    """run_eval_suite over primary + a class-remapped robustness subset
    (the reference's ImageNet-A pattern: metrics.py:116-137)."""
    from basd_tpu.evaluation.metrics import run_eval_suite, save_metrics

    mesh = make_mesh(data=1)
    cfg = tiny_config(tmp_path)
    cfg.data.eval_datasets = ["synthetic/tiny_subset"]

    student = create_model(
        "deit_tiny_patch16_224",
        img_size=32,
        num_classes=10,
        arch_overrides=dict(embed_dim=48, depth=2, num_heads=2, mlp_ratio=2.0),
        dtype=jnp.bfloat16,
    )
    s_vars = init_model(student, jax.random.PRNGKey(0), 32)
    apply_fn = lambda p, x: student.module.apply(
        {"params": p}, x, deterministic=True
    )["logits"]
    results = run_eval_suite(
        apply_fn,
        s_vars["params"],
        cfg,
        mesh=mesh,
        config_path="cfg.yaml",
        efficiency_batches=2,
    )
    assert results["primary"]["dataset"] == "synthetic/tiny"
    rob = results["robustness"]["synthetic/tiny_subset"]
    assert 0.0 <= rob["val_acc"] <= 100.0
    assert np.isfinite(rob["loss"])
    path = save_metrics(results, tmp_path)
    assert path.exists()


def test_eval_cli_roundtrip(tmp_path):
    """basd-eval consumes weights exported by the trainer."""
    from basd_tpu import eval as eval_cli

    mesh = make_mesh(data=1)
    trainer, cfg = build_tiny_trainer(tmp_path, mesh)
    source = SyntheticSource("synthetic/tiny")
    trainer.train_epoch(source, epoch=0)
    trainer.save_weights("best_model_weights", epoch=0)

    weights = tmp_path / "tiny/checkpoints/best_model_weights"
    eval_cli.main(
        [
            "experiment=smoke_synthetic",
            f"run.output_dir={tmp_path}",
            "run.name=eval_out",
            "data.dataset=synthetic/tiny",
            "model.num_classes=10",
            "training.label_smoothing=0.1",
            "+model.arch_overrides.embed_dim=48",
            "+model.arch_overrides.depth=3",
            "+model.arch_overrides.num_heads=2",
            "+model.arch_overrides.mlp_ratio=2.0",
            f"checkpoint.path={weights}",
            "+data.limit_eval_batches=2",
            "+eval.efficiency_batches=2",
            "tpu.mesh.data=1",
        ]
    )
    metrics = json.loads((tmp_path / "eval_out/metrics.json").read_text())
    assert "primary" in metrics and "efficiency" in metrics
