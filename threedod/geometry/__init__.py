"""Geometry core: cuboids, rotations, projections, IoU (2D/3D), planes."""
from .boxes2d import (
    Box2BoxTransform,
    box_area,
    box_centers,
    clip_boxes,
    giou_loss,
    matched_giou,
    matched_pairwise_iou,
    pairwise_intersection,
    pairwise_ioa,
    pairwise_iou,
)
from .cuboids import (
    EDGES,
    QUAD_FACES,
    TRI_FACES,
    UNIT_CUBE,
    backproject,
    convert_3d_box_to_2d,
    cuboid_verts,
    cuboid_verts_faces,
    cuboid_verts_project,
    cuboids_to_boxes2d,
    estimate_truncation,
    project_points,
)
from .hull import convex_hull_mask, convex_hull_order, fill_polygon_soft
from .iou3d import (
    aabb_iou3d_upper_bound,
    box3d_overlap,
    box3d_overlap_jit,
    box_volume,
    iou3d_boxes,
    iou3d_pairs,
    iou3d_pairs_jit,
)
from .misc import (
    chamfer_corner_loss,
    compute_virtual_scale_from_focal_spaces,
    scaled_sigmoid,
    smooth_l1,
)
from .plane import (
    fit_plane_ransac,
    fit_plane_ransac_jit,
    orient_ground_normal,
    point_cloud_from_depth,
)
from .rotations import (
    R_from_allocentric,
    R_to_allocentric,
    acos_linear_extrapolation,
    axis_angle_to_matrix,
    euler_to_matrix,
    euler_xyz_to_matrix,
    matrix_to_euler,
    matrix_to_rotation_6d,
    normalize_quaternion,
    orthobasis_from_normal,
    quaternion_to_matrix,
    rotate_vector_axis_angle,
    rotation_6d_to_matrix,
    so3_relative_angle,
    so3_relative_angle_pairwise,
    so3_rotation_angle,
)
