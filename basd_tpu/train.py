"""basd-train entry point (reference: ``src/train.py:72-160``).

Usage (hydra-style overrides):

    basd-train experiment=basd_cifar100 training.num_epochs=5
    python -m basd_tpu.train experiment=smoke_synthetic
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.config import compose, register_resolvers, save_config
from basd_tpu.data.sources import source_from_config, stats_from_config
from basd_tpu.evaluation.metrics import run_eval_suite, save_metrics
from basd_tpu.models import (
    create_model,
    derive_student_arch,
    estimate_intrinsic_dim,
    init_model,
    load_teacher,
    probe,
)
from basd_tpu.parallel.mesh import make_mesh
from basd_tpu.training.trainer import Trainer

register_resolvers()

_CONFIG_DIR = Path(__file__).parent.parent / "configs"


def main(argv: list[str] | None = None) -> None:
    overrides = list(sys.argv[1:] if argv is None else argv)
    config = compose(_CONFIG_DIR, overrides=overrides)

    np.random.seed(config.run.seed)

    output_dir = Path(config.run.output_dir) / config.run.name
    output_dir.mkdir(parents=True, exist_ok=True)

    img_size = config.model.vit.img_size
    compute_dtype = jnp.bfloat16

    mesh = make_mesh(
        data=config.tpu.mesh.get("data", -1), model=config.tpu.mesh.get("model", 1)
    )
    print(
        f"mesh devices={len(jax.devices())} data={mesh.shape['data']} "
        f"model={mesh.shape['model']} platform={jax.default_backend()}"
    )

    teacher_arch = config.basd.get("teacher_arch")
    teacher_bundle, teacher_vars = load_teacher(
        config.basd.teacher_model_name,
        img_size,
        seed=config.run.seed,
        checkpoint_path=config.basd.get("teacher_checkpoint"),
        dtype=compute_dtype,
        arch_overrides=(
            teacher_arch.to_dict()
            if hasattr(teacher_arch, "to_dict")
            else dict(teacher_arch) if teacher_arch else None
        ),
        attention_impl=config.tpu.get("teacher_attention_impl", "auto"),
    )

    # calibration: intrinsic-dim student auto-sizing for token teachers
    # (reference: src/train.py:88-114)
    arch_overrides = None
    if teacher_bundle.info["feature_format"] == "token":
        source = source_from_config(config)
        tokens_per_image = (img_size // config.model.vit.patch_size) ** 2
        num_calib = -(-10 * teacher_bundle.info["embed_dim"] // tokens_per_image)
        r = round(img_size / config.data.eval_crop_ratio)
        calib = next(
            source.load_batches(
                "train", num_calib, r, shuffle=False, seed=0, drop_last=False
            )
        )
        from basd_tpu.data.augment import make_eval_view

        calib_images = make_eval_view(
            jnp.asarray(calib["image"]), img_size,
            (tuple(teacher_bundle.mean), tuple(teacher_bundle.std)),
        )
        intrinsic_dim = estimate_intrinsic_dim(
            teacher_bundle, teacher_vars, calib_images.astype(compute_dtype)
        )
        arch_overrides = derive_student_arch(teacher_bundle.info, intrinsic_dim)
        print(
            f"student_arch_derived intrinsic_dim={intrinsic_dim} "
            f"embed_dim={arch_overrides['embed_dim']} "
            f"depth={arch_overrides['depth']} "
            f"num_heads={arch_overrides['num_heads']} "
            f"mlp_ratio={arch_overrides['mlp_ratio']:.1f}"
        )
        config.model.arch_overrides = dict(arch_overrides)

    student_bundle = create_model(
        config.model.student_preset,
        img_size=img_size,
        num_classes=config.model.num_classes,
        drop_path_rate=config.model.drop_path_rate,
        arch_overrides=arch_overrides,
        importance_mode=None,
        remat=bool(config.tpu.get("remat", True)),
        remat_policy=config.tpu.get("remat_policy"),
        attention_impl=config.tpu.get("student_attention_impl", "auto"),
        mlp_impl=config.tpu.get("student_mlp_impl", "auto"),
        dtype=compute_dtype,
    )
    student_vars = init_model(
        student_bundle, jax.random.PRNGKey(config.run.seed), img_size,
        fan_in_init=True,
    )
    s_info = probe(student_bundle)
    print(
        f"student_probed embed_dim={s_info['embed_dim']} depth={s_info['depth']} "
        f"num_tokens={s_info['num_tokens']} "
        f"heads_per_layer={s_info['heads_per_layer']} "
        f"has_cls={s_info['has_cls_token']} attn_subpath={s_info['attn_subpath']}"
    )

    dataset_stats = stats_from_config(config)
    source = source_from_config(config)

    trainer = Trainer(
        config,
        student_bundle=student_bundle,
        student_params=student_vars["params"],
        teacher_bundle=teacher_bundle,
        teacher_vars=teacher_vars,
        mesh=mesh,
        dataset_stats=dataset_stats,
        teacher_stats=(teacher_bundle.mean, teacher_bundle.std),
    )

    save_config(config, output_dir / "config.yaml")

    start_epoch = 0
    if config.checkpoint.resume_from:
        start_epoch = trainer.load_checkpoint(config.checkpoint.resume_from)

    trainer.train(source, start_epoch=start_epoch)

    eval_params = trainer.eval_student_params
    apply_fn = lambda p, x: trainer.student.module.apply(
        {"params": p}, x, deterministic=True
    )["logits"]
    results = run_eval_suite(
        apply_fn,
        eval_params,
        config,
        mesh=mesh,
        config_path=str(output_dir / "config.yaml"),
        efficiency_batches=int(config.get("eval", {}).get("efficiency_batches", 200)),
    )
    save_metrics(results, output_dir)


if __name__ == "__main__":
    main()
