from basd_tpu.ops.grassmann import (
    grassmann_subspace,
    rank_mask,
    spectral_grassmann_distance_sq,
)
from basd_tpu.ops.interp import align_token_count, linear_interp1d
from basd_tpu.ops.linalg import (
    newton_schulz_polar,
    nuclear_norm,
    nuclear_norm_ref,
    orthogonal_matrix,
    right_singular_vectors,
    singular_values,
    sym_eigh_desc,
)
from basd_tpu.ops.losses import cross_entropy, uwso_combine, uwso_weights
from basd_tpu.ops.mp_rank import marchenko_pastur_rank
from basd_tpu.ops.procrustes import (
    geometric_relational_loss,
    reduce_attention_importance,
)

__all__ = [
    "align_token_count",
    "cross_entropy",
    "geometric_relational_loss",
    "grassmann_subspace",
    "linear_interp1d",
    "marchenko_pastur_rank",
    "newton_schulz_polar",
    "nuclear_norm",
    "nuclear_norm_ref",
    "orthogonal_matrix",
    "rank_mask",
    "reduce_attention_importance",
    "right_singular_vectors",
    "singular_values",
    "spectral_grassmann_distance_sq",
    "sym_eigh_desc",
    "uwso_combine",
    "uwso_weights",
]
