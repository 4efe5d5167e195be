"""Shim: reference ``utils.labels`` import path.

Implementation: image_transformation_tpu/core/labels.py.
"""

from image_transformation_tpu.core.labels import (  # noqa: F401
    ALLOWED_LABELS,
    compute_per_label_numbers,
    is_allowed_label,
    normalize_label,
)
