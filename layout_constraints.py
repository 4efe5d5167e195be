"""Public shim preserving the reference layout_constraints API.

Re-exports the TPU build's canvas math and legacy grid/flow helpers under
the reference's module name and symbols
(/root/reference/layout_constraints.py). All symbols keep their reference
signatures; implementations live in image_transformation_tpu.layout.
"""

from image_transformation_tpu.layout.canvas import (  # noqa: F401
    GRID_CELLS,
    CellName,
    compute_canvas_size,
    grid_cells,
    parse_ratio,
)
from image_transformation_tpu.layout.canvas import cell_row_col as _cell_row_col  # noqa: F401
from image_transformation_tpu.layout.legacy import (  # noqa: F401
    ObjectMeta,
    Placement,
    baseline_cell_assignments,
    finalize_layout,
    layout_final_json,
    pack_flow,
)
from image_transformation_tpu.layout.legacy import load_object_meta as _load_object_meta  # noqa: F401
