from .convert import (
    axisangle2mat,
    mat2axisangle,
    euler2mat,
    mat2euler,
    point2mat,
    mat2point,
)
from .rigid import (
    RigidTransform,
    mat_first2last,
    mat_last2first,
    ax_first2last,
    ax_last2first,
    mat_update_resolution,
    ax_update_resolution,
    mat_transform_points,
    ax_transform_points,
    transform_points,
)

__all__ = [
    "axisangle2mat",
    "mat2axisangle",
    "euler2mat",
    "mat2euler",
    "point2mat",
    "mat2point",
    "RigidTransform",
    "mat_first2last",
    "mat_last2first",
    "ax_first2last",
    "ax_last2first",
    "mat_update_resolution",
    "ax_update_resolution",
    "mat_transform_points",
    "ax_transform_points",
    "transform_points",
]
