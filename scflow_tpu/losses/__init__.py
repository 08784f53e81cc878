from scflow_tpu.losses.basic import raft_loss, l1_loss, sequence_loss, endpoint_error
from scflow_tpu.losses.point_matching import (
    point_matching_loss,
    disentangle_point_matching_loss,
    rot_point_matching_loss,
    sym_mask_from_types,
)

__all__ = [
    "raft_loss",
    "l1_loss",
    "sequence_loss",
    "endpoint_error",
    "point_matching_loss",
    "disentangle_point_matching_loss",
    "rot_point_matching_loss",
    "sym_mask_from_types",
]
