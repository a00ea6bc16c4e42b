from .logperf import print_ap_analysis_table, print_ap_category_table, print_omni_summary
from .vis import draw_bev, draw_box_3d, draw_boxes_2d, draw_scene_view, get_color
