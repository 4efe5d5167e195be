"""Public shim preserving the reference background_resizing API.

Same surface as /root/reference/background_resizing.py:25-98, with the
median/gradient math running as on-device reductions
(image_transformation_tpu.ops.background): exact histogram medians instead
of sort-based np.median, and a linspace outer-product instead of the
reference's per-column Python loop.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image

import jax.numpy as jnp

from image_transformation_tpu.ops.background import (
    axis_variance as _axis_variance_impl,
    edge_strip_medians,
    gradient_canvas,
    masked_median_rgb,
    solid_canvas,
)


def _load_background_rgba(background_path: str) -> Image.Image:
    return Image.open(background_path).convert("RGBA")


def _median_color_nontransparent(img_rgba: Image.Image) -> Tuple[int, int, int]:
    """Median RGB over alpha>0 pixels (all pixels if fully transparent)."""
    arr = jnp.asarray(np.asarray(img_rgba.convert("RGBA")))
    med = np.asarray(masked_median_rgb(arr))
    return tuple(int(x) for x in med)


def fill_solid(background_path: str, canvas_size: Tuple[int, int]) -> Image.Image:
    """Solid canvas in the background's median non-transparent color."""
    color = _median_color_nontransparent(_load_background_rgba(background_path))
    w, h = canvas_size
    out = solid_canvas(jnp.asarray(np.array(color, np.uint8)), h, w)
    return Image.fromarray(np.asarray(out), "RGBA")


def _edge_strip_median_colors(img: Image.Image, strip_px: int = 8):
    arr = jnp.asarray(np.asarray(img.convert("RGBA")))
    strips = edge_strip_medians(arr, strip_px)
    return tuple(tuple(int(x) for x in np.asarray(s)) for s in strips)


def _axis_variance(c1: Tuple[int, int, int], c2: Tuple[int, int, int]) -> float:
    return _axis_variance_impl(c1, c2)


def fill_gradient(background_path: str, canvas_size: Tuple[int, int]) -> Image.Image:
    """Linear gradient canvas between edge-strip medians; the axis with the
    lower endpoint color variance wins (ties go horizontal)."""
    bg = _load_background_rgba(background_path)
    left, right, top, bottom = _edge_strip_median_colors(bg)
    horizontal = _axis_variance(left, right) <= _axis_variance(top, bottom)
    c1, c2 = (left, right) if horizontal else (top, bottom)
    w, h = canvas_size
    out = gradient_canvas(
        jnp.asarray(np.array(c1, np.uint8)),
        jnp.asarray(np.array(c2, np.uint8)),
        h, w, horizontal,
    )
    return Image.fromarray(np.asarray(out), "RGBA")
