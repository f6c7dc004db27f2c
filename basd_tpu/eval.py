"""basd-eval entry point (reference: ``src/eval.py:14-41``): rebuild the
student from persisted ``model.arch_overrides``, load eval weights, run
the eval suite."""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from basd_tpu.config import compose, register_resolvers, save_config
from basd_tpu.evaluation.metrics import run_eval_suite, save_metrics
from basd_tpu.models import create_model, init_model
from basd_tpu.parallel.mesh import make_mesh
from basd_tpu.utils.checkpoint import load_weights

register_resolvers()

_CONFIG_DIR = Path(__file__).parent.parent / "configs"


def main(argv: list[str] | None = None) -> None:
    overrides = list(sys.argv[1:] if argv is None else argv)
    config = compose(_CONFIG_DIR, overrides=overrides)

    np.random.seed(config.run.seed)
    img_size = config.model.vit.img_size

    mesh = make_mesh(
        data=config.tpu.mesh.get("data", -1), model=config.tpu.mesh.get("model", 1)
    )

    overrides_dict = (
        config.model.arch_overrides.to_dict()
        if hasattr(config.model.arch_overrides, "to_dict")
        else dict(config.model.arch_overrides or {})
    )
    bundle = create_model(
        config.model.student_preset,
        img_size=img_size,
        num_classes=config.model.num_classes,
        arch_overrides=overrides_dict or None,
        dtype=jnp.bfloat16,
    )
    variables = init_model(bundle, jax.random.PRNGKey(config.run.seed), img_size)

    if not config.checkpoint.path:
        raise SystemExit("checkpoint.path is required for basd-eval")
    params, epoch = load_weights(config.checkpoint.path, variables["params"])
    print(f"checkpoint_loaded path={config.checkpoint.path} epoch={epoch}")

    output_dir = Path(config.run.output_dir) / config.run.name
    output_dir.mkdir(parents=True, exist_ok=True)
    save_config(config, output_dir / "config.yaml")

    apply_fn = lambda p, x: bundle.module.apply(
        {"params": p}, x, deterministic=True
    )["logits"]
    results = run_eval_suite(
        apply_fn,
        params,
        config,
        mesh=mesh,
        config_path=str(output_dir / "config.yaml"),
        efficiency_batches=int(config.get("eval", {}).get("efficiency_batches", 200)),
    )
    save_metrics(results, output_dir)


if __name__ == "__main__":
    main()
