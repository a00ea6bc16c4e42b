from .logperf import print_ap_analysis_table, print_ap_category_table, print_omni_summary
from .render import cuboid_mesh_scene, rasterize, render_cuboids
from .vis import (
    draw_3d_box_from_verts,
    draw_bev,
    draw_box_3d,
    draw_boxes_2d,
    draw_scene_view,
    euler2mat,
    get_color,
    render_scene_views,
    so3_relative_angle,
    visualize_from_instances,
)
