from basd_tpu.evaluation.metrics import (
    evaluate_model,
    measure_efficiency,
    run_eval_suite,
    save_metrics,
)

__all__ = [
    "evaluate_model",
    "measure_efficiency",
    "run_eval_suite",
    "save_metrics",
]
