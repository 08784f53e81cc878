from scflow_tpu.geometry.rotation import (
    rotmat_from_ortho6d,
    rotmat_from_quat,
    quat_from_rotmat,
    rotmat_from_euler,
    rotmat_from_axis_angle,
    axis_angle_from_rotmat,
)
from scflow_tpu.geometry.camera import (
    coords_grid,
    project_points,
    lift_depth_to_object_points,
)
from scflow_tpu.geometry.se3 import apply_delta_pose
from scflow_tpu.geometry.flow import (
    flow_from_object_points,
    flow_from_pose_and_depth,
    filter_flow_by_mask,
    filter_flow_by_depth,
    cal_epe,
    flow_to_coords,
)

__all__ = [
    "rotmat_from_ortho6d",
    "rotmat_from_quat",
    "quat_from_rotmat",
    "rotmat_from_euler",
    "rotmat_from_axis_angle",
    "axis_angle_from_rotmat",
    "coords_grid",
    "project_points",
    "lift_depth_to_object_points",
    "apply_delta_pose",
    "flow_from_object_points",
    "flow_from_pose_and_depth",
    "filter_flow_by_mask",
    "filter_flow_by_depth",
    "cal_epe",
    "flow_to_coords",
]
