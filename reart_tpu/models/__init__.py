"""Models: relaxation (base) and projection (kinematic) stages + the frozen
PointNet++ correspondence backbone."""

from reart_tpu.models.base_model import (
    init_base_params,
    base_forward,
    base_seg_logits,
    gumbel_softmax,
)
from reart_tpu.models.kinematic import (
    KinematicState,
    kinematic_forward,
    init_kinematic_params,
)
