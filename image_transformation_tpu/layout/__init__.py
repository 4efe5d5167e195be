from .canvas import (
    parse_ratio,
    compute_canvas_size,
    grid_cells,
    ratio_family,
    GRID_CELLS,
)
from .flex import FlexError  # noqa: F401
