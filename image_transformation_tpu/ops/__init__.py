from .background import (
    masked_median_rgb,
    edge_strip_medians,
    axis_variance,
    solid_canvas,
    gradient_canvas,
)
from .resize import (
    build_coeffs_host,
    resample_coeff_matrix,
    resize_exact_u8,
    resize_u8,
)
from .compose import (
    alpha_over_u8,
    composite_batch,
    composite_canvas,
    composite_canvas_tables,
    composite_exact,
    paste_object,
)
