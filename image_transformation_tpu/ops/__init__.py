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
from .compose_pallas import (  # Pallas alternative paths (see module STATUS)
    composite_batch_hybrid,
    composite_batch_pallas,
    composite_batch_pallas_host_tables,
)
from .contact_sheet import (
    build_contact_sheet_from_results,
    build_labeled_contact_sheet,
    thumbnail_exact_u8,
    thumbnail_size,
)
from .compose_pallas import composite_batch_aligned  # noqa: E402
