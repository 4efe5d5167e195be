"""Public shim preserving the reference compositor API (PIL in / PIL out).

Same call surface as the reference (/root/reference/compositor.py:6-35) but
the pixel work runs through the TPU-native array kernel
(image_transformation_tpu.ops.compose): MXU-matmul Lanczos resize + exact
Pillow-fixed-point alpha-over, one jitted program per canvas geometry.

Parity: bit-exact vs PIL (host-built float64 coefficient tables + Pillow's
fixed-point integer arithmetic replicated on device); pinned by
tests/test_golden_bundles.py and tests/test_compositor.py.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
from PIL import Image

import jax.numpy as jnp

from image_transformation_tpu.core.bundle import load_object_images  # noqa: F401
from image_transformation_tpu.ops.compose import composite_exact


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def composite(
    background_img: Image.Image,
    object_images: Dict[int, Image.Image],
    placements: List[Dict],
) -> Image.Image:
    """Composite objects onto the background according to placements.

    placements: list of {object_id, box: [x1,y1,x2,y2]}; list order is
    z-order. Unknown object ids are skipped, box sides floor at 1px.
    """
    live = [
        p for p in placements
        if int(p["object_id"]) in object_images
    ]
    canvas = np.asarray(background_img.convert("RGBA"))
    if not live:
        return Image.fromarray(canvas.copy(), "RGBA")

    # Pad object slots to a shared bucketed shape so repeat calls with
    # similar bundles reuse the same compiled program.
    n = len(live)
    max_h = max(object_images[int(p["object_id"])].size[1] for p in live)
    max_w = max(object_images[int(p["object_id"])].size[0] for p in live)
    pad_h, pad_w = _round_up(max_h, 64), _round_up(max_w, 64)

    objs = np.zeros((n, pad_h, pad_w, 4), np.uint8)
    hw = np.zeros((n, 2), np.int32)
    boxes = np.zeros((n, 4), np.int32)
    for k, p in enumerate(live):
        arr = np.asarray(object_images[int(p["object_id"])].convert("RGBA"))
        objs[k, : arr.shape[0], : arr.shape[1]] = arr
        hw[k] = arr.shape[:2]
        boxes[k] = [int(v) for v in p["box"]]

    out = composite_exact(canvas, objs, hw, boxes)
    return Image.fromarray(np.asarray(out), "RGBA")
