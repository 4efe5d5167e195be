"""Background synthesis as on-device reductions.

TPU-native equivalents of the reference background_resizing.py
(/root/reference/background_resizing.py:11-98):

- the reference's ``np.median`` over alpha-masked pixels becomes an exact
  256-bin histogram median (scatter-add + cumulative-sum + searchsorted) —
  no sort, fully jittable and vmappable;
- the reference's per-column/per-row Python gradient loops become a single
  linspace outer-product, with the same float32 arithmetic and the same
  truncating uint8 cast.

Numeric parity notes (pinned by tests):
- ``np.median`` of an even-count uint8 sample averages the two middle order
  statistics and the reference then truncates via ``int()`` — reproduced
  here as ``(lo + hi) // 2`` on the two exact order statistics.
- The gradient fill uses ``t = x / max(1, n - 1)`` and truncates
  ``(1-t)*c1 + t*c2`` toward zero, exactly like the reference's
  ``astype(np.uint8)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def masked_median_rgb(rgba_u8: jnp.ndarray) -> jnp.ndarray:
    """Median RGB over alpha>0 pixels (falling back to all pixels).

    rgba_u8: uint8 [H, W, 4]. Returns int32 [3].
    Parity: _median_color_nontransparent (background_resizing.py:11-22).
    """
    flat = rgba_u8.reshape(-1, 4).astype(jnp.int32)
    alpha_mask = (flat[:, 3] > 0).astype(jnp.int32)
    any_opaque = jnp.any(alpha_mask > 0)
    mask = jnp.where(any_opaque, alpha_mask, jnp.ones_like(alpha_mask))
    # ONE scatter into a flattened [3*256] histogram (index = c*256 + v)
    # instead of three independent passes over the pixel buffer — the
    # medians then come from three tiny per-channel cdf reductions.
    chan = jnp.arange(3, dtype=jnp.int32)[None, :]
    idx = (chan * 256 + flat[:, :3]).reshape(-1)
    counts = (
        jnp.zeros((3 * 256,), jnp.int32)
        .at[idx]
        .add(jnp.broadcast_to(mask[:, None], (mask.shape[0], 3)).reshape(-1))
        .reshape(3, 256)
    )
    n = jnp.sum(counts[0])
    cdf = jnp.cumsum(counts, axis=1)
    k_lo = (n - 1) // 2
    k_hi = n // 2
    lo = jax.vmap(lambda c: jnp.searchsorted(c, k_lo + 1, side="left"))(cdf)
    hi = jax.vmap(lambda c: jnp.searchsorted(c, k_hi + 1, side="left"))(cdf)
    # np.median averages the two middle samples; int() then truncates.
    return ((lo + hi) // 2).astype(jnp.int32)


def _region_median_rgb(region_u8: jnp.ndarray) -> jnp.ndarray:
    return masked_median_rgb(region_u8)


def edge_strip_medians(rgba_u8: jnp.ndarray, strip_px: int = 8):
    """Median colors of the 8-px left/right/top/bottom strips.

    Returns (left, right, top, bottom) int32 [3] arrays.
    Parity: _edge_strip_median_colors (background_resizing.py:36-55).
    """
    h, w = rgba_u8.shape[:2]
    sl = min(strip_px, w)
    st = min(strip_px, h)
    left = _region_median_rgb(rgba_u8[:, :sl])
    right = _region_median_rgb(rgba_u8[:, max(0, w - strip_px):])
    top = _region_median_rgb(rgba_u8[:st, :])
    bottom = _region_median_rgb(rgba_u8[max(0, h - strip_px):, :])
    return left, right, top, bottom


def axis_variance(c1, c2) -> float:
    """Squared RGB distance used to pick the gradient axis."""
    return float(sum((int(a) - int(b)) ** 2 for a, b in zip(c1, c2)))


@functools.partial(jax.jit, static_argnames=("height", "width"))
def solid_canvas(color_rgb: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Opaque solid RGBA canvas of the given color. Returns uint8 [H, W, 4]."""
    rgba = jnp.concatenate(
        [color_rgb.astype(jnp.uint8), jnp.array([255], jnp.uint8)]
    )
    return jnp.broadcast_to(rgba, (height, width, 4))


def gradient_canvas(  # host-level: ramp math is numpy (see body); no jit
    c1: jnp.ndarray, c2: jnp.ndarray, height: int, width: int, horizontal: bool
) -> jnp.ndarray:
    """Linear gradient RGBA canvas c1 → c2 along the chosen axis.

    Truncating uint8 cast and f32 lerp match the reference's per-line loop
    (background_resizing.py:76-95) without the O(width) Python iteration.
    """
    n = width if horizontal else height
    # The ramp arithmetic runs in numpy with the reference loop's exact
    # float semantics — t and (1 - t) in f64, cast to f32 at the multiply,
    # separate mul/mul/add roundings. Two earlier vectorizations each lost
    # one ulp on ~0.03% of (width, color) rows and flipped the truncating
    # u8 cast: an f32 (1.0 - t) drops round-to-even ties, and XLA fuses
    # the f32 lerp into an FMA (single rounding). This is a host-level
    # entry point (pipeline/serving call it outside jit; sizes static), so
    # host math costs nothing.
    import numpy as _np

    t64 = _np.arange(n) / max(1, n - 1)
    t = t64.astype(_np.float32)
    w1 = (1.0 - t64).astype(_np.float32)
    c1f = _np.asarray(c1).astype(_np.float32)
    c2f = _np.asarray(c2).astype(_np.float32)
    ramp = w1[:, None] * c1f[None, :] + t[:, None] * c2f[None, :]
    ramp_u8 = jnp.asarray(ramp.astype(_np.uint8))  # truncation, as reference
    if horizontal:
        rgb = jnp.broadcast_to(ramp_u8[None, :, :], (height, width, 3))
    else:
        rgb = jnp.broadcast_to(ramp_u8[:, None, :], (height, width, 3))
    alpha = jnp.full((height, width, 1), 255, jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)


def gradient_spec(bg_rgba_u8: jnp.ndarray):
    """(c1, c2, horizontal): endpoint colors + axis for the gradient fill.

    The single home of the reference's axis-selection rule
    (background_resizing.py:58-75): edge-strip medians compared by squared
    RGB distance, lower-variance axis wins (ties go horizontal). Shared by
    synthesize_canvas and the fused renderer's background_spec so the
    per-request and batched gradients can never pick different axes.
    """
    import numpy as _np

    left, right, top, bottom = (
        tuple(int(x) for x in _np.asarray(c))
        for c in edge_strip_medians(bg_rgba_u8)
    )
    horizontal = axis_variance(left, right) <= axis_variance(top, bottom)
    c1, c2 = (left, right) if horizontal else (top, bottom)
    return c1, c2, horizontal


def synthesize_canvas(bg_rgba_u8: jnp.ndarray, width: int, height: int,
                      mode: str = "solid") -> jnp.ndarray:
    """Canvas synthesis entry point shared by the pipeline and the serving
    daemon: "solid" = median non-transparent color (the reference's only
    mode); "gradient" = edge-strip medians along the lower-variance axis
    (the reference's fill_gradient semantics). Returns uint8 [H, W, 4]."""
    if mode == "gradient":
        import numpy as _np

        c1, c2, horizontal = gradient_spec(bg_rgba_u8)
        return gradient_canvas(
            jnp.asarray(_np.array(c1, _np.uint8)),
            jnp.asarray(_np.array(c2, _np.uint8)),
            height, width, horizontal,
        )
    if mode != "solid":
        raise ValueError(f"unknown background mode: {mode!r}")
    median = masked_median_rgb(bg_rgba_u8)
    return solid_canvas(median.astype(jnp.uint8), height, width)
