from basd_tpu.models.registry import (
    ModelBundle,
    apply_fan_in_init,
    available_models,
    create_model,
    derive_student_arch,
    estimate_intrinsic_dim,
    init_model,
    load_teacher,
    probe,
    teacher_extract,
)
from basd_tpu.models.vit import ViTConfig, VisionTransformer

__all__ = [
    "ModelBundle",
    "ViTConfig",
    "VisionTransformer",
    "apply_fan_in_init",
    "available_models",
    "create_model",
    "derive_student_arch",
    "estimate_intrinsic_dim",
    "init_model",
    "load_teacher",
    "probe",
    "teacher_extract",
]
