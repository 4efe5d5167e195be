"""Resize + alpha-over composition on TPU.

TPU-native rebuild of the reference compose path
(/root/reference/compositor.py:6-22): per placement, LANCZOS-resize the RGBA
cutout to its box and alpha-over it onto the canvas, honoring list order
(z-order). Instead of PIL's mutate-in-place loop, this is a pure function
over arrays:

- objects live in one zero-padded [N, Hm, Wm, 4] buffer with per-object
  actual sizes; boxes are a [N, 4] int32 array — all shapes static, so the
  whole compose jits once per (canvas, pad) geometry and vmaps over batches;
- resizing is the MXU matmul formulation from ops.resize;
- pasting is destination-driven: every canvas pixel gathers from the resized
  object buffer (no dynamic-size scatter, which would block XLA fusion);
- alpha-over replicates Pillow's exact fixed-point integer arithmetic
  (AlphaComposite.c, PRECISION_BITS=7) in int32, so compositing is
  bit-exact vs PIL.

Two resize-coefficient sources (see ops.resize): host-built float64 tables
(bit-exact vs PIL — used by composite_exact / the shims, where boxes are
concrete host data) and in-graph float32 tables (for fully-fused programs
with traced boxes; worst case ~1/255 from rare coefficient rounding flips).

Out-of-canvas source pixels are dropped, matching PIL's source cropping for
in-bounds ``dest``; negative dests are a caller error in the reference
(PIL raises) and are clamped away by the solver before composing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .resize import resize_f32

_PRECISION_BITS = 7


def _shift_for_div255(a: jnp.ndarray) -> jnp.ndarray:
    # Pillow's SHIFTFORDIV255: ((a >> 8) + a) >> 8  ==  a // 255 (rounded via caller bias)
    return ((a >> 8) + a) >> 8


def alpha_over_u8(dst: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """Pillow-exact alpha compositing of uint8 RGBA arrays [..., 4].

    Returns int32 [..., 4] with uint8 values. src alpha 0 passes dst through
    exactly (including RGB), as in Pillow.
    """
    dst = dst.astype(jnp.int32)
    src = src.astype(jnp.int32)
    sa = src[..., 3]
    da = dst[..., 3]
    blend = da * (255 - sa)
    outa255 = sa * 255 + blend
    safe = jnp.where(outa255 == 0, 1, outa255)
    coef1 = (sa * 255 * 255 * (1 << _PRECISION_BITS)) // safe
    coef2 = (255 << _PRECISION_BITS) - coef1
    tmp = src[..., :3] * coef1[..., None] + dst[..., :3] * coef2[..., None]
    out_rgb = _shift_for_div255(tmp + (0x80 << _PRECISION_BITS)) >> _PRECISION_BITS
    out_a = _shift_for_div255(outa255 + 0x80)
    out = jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)
    return jnp.where((sa == 0)[..., None], dst, out)


def paste_object(
    canvas: jnp.ndarray,
    obj_f32: jnp.ndarray,
    xy: Tuple[jnp.ndarray, jnp.ndarray],
    wh: Tuple[jnp.ndarray, jnp.ndarray],
) -> jnp.ndarray:
    """Destination-driven alpha-over paste.

    canvas: int32 [H, W, 4]; obj_f32: float32 [Hm, Wm, 4] (uint8 values,
    zeros outside the live [h, w] region); xy = (x1, y1); wh = (w, h).
    Pixels of the object falling outside the canvas are dropped.
    """
    h_c, w_c = canvas.shape[:2]
    h_m, w_m = obj_f32.shape[:2]
    x1, y1 = xy
    w, h = wh
    yy = jnp.arange(h_c, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w_c, dtype=jnp.int32)[None, :]
    rel_y = yy - y1
    rel_x = xx - x1
    inside = (rel_y >= 0) & (rel_y < h) & (rel_x >= 0) & (rel_x < w)
    src = obj_f32[jnp.clip(rel_y, 0, h_m - 1), jnp.clip(rel_x, 0, w_m - 1)]
    src = jnp.where(inside[..., None], src.astype(jnp.int32), 0)
    return alpha_over_u8(canvas, src)


@functools.partial(jax.jit, static_argnames=("out_max_hw", "method"))
def composite_canvas(
    canvas_u8: jnp.ndarray,
    objs_u8: jnp.ndarray,
    obj_hw: jnp.ndarray,
    boxes: jnp.ndarray,
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
) -> jnp.ndarray:
    """Compose all objects onto the canvas in array order.

    canvas_u8: uint8 [H, W, 4]  — the background canvas.
    objs_u8:   uint8 [N, Hm, Wm, 4] — zero-padded RGBA cutouts.
    obj_hw:    int32 [N, 2] — (h, w) actual size per object.
    boxes:     int32 [N, 4] — (x1, y1, x2, y2) destination boxes. A padded
               slot must carry a zero-alpha object (zero padding suffices);
               it then composites as a no-op.

    Width/height floors at 1 px match the reference (compositor.py:17-18).
    """
    h_c, w_c = canvas_u8.shape[:2]
    if out_max_hw is None:
        out_max_hw = (h_c, w_c)

    def step(canvas, per_obj):
        obj, hw, box = per_obj
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        w = jnp.maximum(1, x2 - x1)
        h = jnp.maximum(1, y2 - y1)
        resized = resize_f32(
            obj.astype(jnp.float32), (hw[0], hw[1]), (h, w), out_max_hw, method
        )
        return paste_object(canvas, resized, (x1, y1), (w, h)), None

    # scan = z-order in array order, one traced body (fast compiles).
    canvas, _ = jax.lax.scan(
        step, canvas_u8.astype(jnp.int32), (objs_u8, obj_hw, boxes)
    )
    return canvas.astype(jnp.uint8)


composite_batch = jax.vmap(
    composite_canvas, in_axes=(0, 0, 0, 0), out_axes=0, axis_name="batch"
)
"""vmapped compose: canvases [B,H,W,4], objects [B,N,Hm,Wm,4], sizes, boxes."""


@functools.partial(jax.jit, static_argnames=())
def composite_canvas_tables(
    canvas_u8: jnp.ndarray,
    objs_u8: jnp.ndarray,
    boxes: jnp.ndarray,
    kh_i32: jnp.ndarray,
    kv_i32: jnp.ndarray,
    same_size: jnp.ndarray,
) -> jnp.ndarray:
    """Compose with precomputed per-object coefficient tables.

    kh_i32: int32 [N, Wout_max, Wm]; kv_i32: int32 [N, Hout_max, Hm];
    same_size: bool [N] — per-object PIL identity shortcut. With host-built
    tables the output is bit-exact vs the PIL pipeline.
    """
    from .resize import resize_with_tables

    def step(canvas, per_obj):
        obj, kh, kv, same, box = per_obj
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        w = jnp.maximum(1, x2 - x1)
        h = jnp.maximum(1, y2 - y1)
        resized = resize_with_tables(obj.astype(jnp.float32), kh, kv, same)
        return paste_object(canvas, resized, (x1, y1), (w, h)), None

    canvas, _ = jax.lax.scan(
        step,
        canvas_u8.astype(jnp.int32),
        (objs_u8, kh_i32, kv_i32, same_size, boxes),
    )
    return canvas.astype(jnp.uint8)


@jax.jit
def composite_canvas_tables_indexed(
    canvas_u8: jnp.ndarray,
    objs_all: jnp.ndarray,
    perm: jnp.ndarray,
    boxes: jnp.ndarray,
    kh_i32: jnp.ndarray,
    kv_i32: jnp.ndarray,
    same_size: jnp.ndarray,
) -> jnp.ndarray:
    """Compose placements that index into a fixed device-resident object
    tensor: ``perm[k]`` selects the source cutout for placement k.

    Keeps the (large) object tensor uploaded once per run while placements,
    boxes and coefficient tables change per iteration — the host->device
    traffic per compose is only the small per-placement metadata.
    """
    from .resize import resize_with_tables

    def step(canvas, per_placement):
        idx, box, kh, kv, same = per_placement
        obj = objs_all[idx]
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        w = jnp.maximum(1, x2 - x1)
        h = jnp.maximum(1, y2 - y1)
        resized = resize_with_tables(obj.astype(jnp.float32), kh, kv, same)
        return paste_object(canvas, resized, (x1, y1), (w, h)), None

    canvas, _ = jax.lax.scan(
        step,
        canvas_u8.astype(jnp.int32),
        (perm, boxes, kh_i32, kv_i32, same_size),
    )
    return canvas.astype(jnp.uint8)


def composite_exact(
    canvas_u8,
    objs_u8,
    obj_hw,
    boxes,
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
):
    """Host-driven exact compose: boxes/sizes are concrete, coefficient
    tables are built bit-exactly on host and shipped to the jitted kernel."""
    import numpy as np

    from .resize import build_coeffs_host

    h_c, w_c = canvas_u8.shape[:2]
    if out_max_hw is None:
        out_max_hw = (h_c, w_c)
    n, pad_h, pad_w = objs_u8.shape[0], objs_u8.shape[1], objs_u8.shape[2]
    kh = np.zeros((n, out_max_hw[1], pad_w), np.int32)
    kv = np.zeros((n, out_max_hw[0], pad_h), np.int32)
    same = np.zeros((n,), bool)
    for k in range(n):
        x1, y1, x2, y2 = (int(v) for v in boxes[k])
        w = max(1, x2 - x1)
        h = max(1, y2 - y1)
        oh, ow = int(obj_hw[k][0]), int(obj_hw[k][1])
        kh[k] = build_coeffs_host(ow, w, pad_w, out_max_hw[1], method)
        kv[k] = build_coeffs_host(oh, h, pad_h, out_max_hw[0], method)
        same[k] = (w == ow) and (h == oh)
    return composite_canvas_tables(
        jnp.asarray(canvas_u8),
        jnp.asarray(objs_u8),
        jnp.asarray(np.asarray(boxes, np.int32)),
        jnp.asarray(kh),
        jnp.asarray(kv),
        jnp.asarray(same),
    )
