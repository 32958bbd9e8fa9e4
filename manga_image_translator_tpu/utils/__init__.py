from .generic import (
    Context,
    color_difference,
    dump_image,
    hex2rgb,
    is_valuable_text,
    load_image,
    natural_sort,
    rgb2hex,
)
from .geometry import (
    BBox,
    Quadrilateral,
    can_merge_region_coarse,
    can_merge_textline,
    convex_area,
    convex_polygon_distance,
    sort_points,
)
from .log import add_file_logger, get_logger, init_logging, remove_file_logger
from .textblock import LANGUAGE_ORIENTATION_PRESETS, TextBlock, rotate_polygons
