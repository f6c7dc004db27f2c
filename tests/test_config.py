"""Config system tests: compose, experiment overlays, overrides, resolvers."""

from pathlib import Path

import pytest

from basd_tpu.config import ConfigNode, compose, register_resolvers, save_config

CONFIG_DIR = Path(__file__).parent.parent / "configs"

register_resolvers()


def test_base_config_composes():
    cfg = compose(CONFIG_DIR, overrides=["data.source=synthetic",
                                         "data.dataset=synthetic/cifar100"])
    assert cfg.run.name == "basd_imagenet"
    assert cfg.data.batch_size == 256
    assert cfg.model.student_preset == "deit_tiny_patch16_224"
    assert cfg.basd.teacher_model_name == "dinov2_vitb14"
    assert cfg.basd.num_extraction_points == 4
    assert cfg.training.num_epochs == 300
    assert cfg.training.learning_rate == 1.0e-3
    assert cfg.training.weight_decay == 0.05


def test_eval_crop_ratio_resolver():
    cfg = compose(CONFIG_DIR, overrides=["data.source=synthetic",
                                         "data.dataset=synthetic/cifar100"])
    # DeiT convention: img / (img + 2 * patch) = 224 / 256
    assert cfg.data.eval_crop_ratio == pytest.approx(224 / 256)


def test_dataset_reactive_resolvers():
    cfg = compose(
        CONFIG_DIR,
        overrides=["data.source=synthetic", "data.dataset=synthetic/cifar100"],
    )
    assert cfg.model.num_classes == 100
    assert cfg.training.label_smoothing == pytest.approx(1 / 100)


def test_experiment_overlay():
    cfg = compose(
        CONFIG_DIR,
        overrides=["experiment=basd_cifar100", "data.source=synthetic",
                   "data.dataset=synthetic/cifar100"],
    )
    assert cfg.run.name == "basd_cifar100"
    assert cfg.data.batch_size == 128
    assert cfg.model.vit.img_size == 32
    assert cfg.model.vit.patch_size == 4
    assert cfg.model.drop_path_rate == 0.05
    assert cfg.training.num_epochs == 200
    assert cfg.training.learning_rate == 5e-4
    # resolver reacts to the overlay: 32 / (32 + 8)
    assert cfg.data.eval_crop_ratio == pytest.approx(0.8)


def test_cli_overrides_and_additive_keys():
    cfg = compose(
        CONFIG_DIR,
        overrides=[
            "experiment=smoke_synthetic",
            "training.num_epochs=7",
            "+extra.flag=true",
            "run.seed=123",
        ],
    )
    assert cfg.training.num_epochs == 7
    assert cfg.extra.flag is True
    assert cfg.run.seed == 123
    assert cfg.basd.teacher_model_name == "deit_small_patch16_224"


def test_save_and_reload_roundtrip(tmp_path):
    cfg = compose(CONFIG_DIR, overrides=["experiment=smoke_synthetic"])
    save_config(cfg, tmp_path / "config.yaml")
    from basd_tpu.config import load_config

    cfg2 = load_config(tmp_path / "config.yaml")
    assert cfg2.to_dict() == cfg.to_dict()


def test_string_interpolation_nodes():
    node = ConfigNode({"a": {"b": 3}, "c": "${a.b}", "d": "x${a.b}y"})
    from basd_tpu.config import resolve

    resolve(node)
    assert node.c == 3
    assert node.d == "x3y"
