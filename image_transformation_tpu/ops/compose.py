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
- pasting is *windowed*: a paste is an affine shift, so instead of a
  full-canvas gather (TPU gathers serialize — measured ~100x slower) the
  kernel dynamic-slices the box window out of a halo-padded workspace,
  alpha-blends it against the resized buffer, and dynamic-update-slices it
  back — O(box) traffic per object, not O(canvas);
- alpha-over replicates Pillow's exact fixed-point integer arithmetic
  (AlphaComposite.c, PRECISION_BITS=7) in int32, so compositing is
  bit-exact vs PIL.

Two resize-coefficient sources (see ops.resize): host-built float64 tables
(bit-exact vs PIL — used by composite_exact / the shims, where boxes are
concrete host data) and in-graph float32 tables (for fully-fused programs
with traced boxes; worst case ~1/255 from rare coefficient rounding flips).

Out-of-canvas pixels are dropped via the halo crop, matching PIL's source
cropping for in-bounds ``dest``; boxes whose origin lies outside
[-pad, canvas] are clamped onto the halo (fully off-canvas either way).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .resize import resize_f32, resize_with_tables

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


def _grow_canvas(canvas_u8: jnp.ndarray, out_max_hw: Tuple[int, int]) -> jnp.ndarray:
    """Pad the canvas so every blend window fits (only triggers when the
    object pad envelope exceeds the canvas — tiny-canvas cases). The padded
    fringe is cropped away after the scan; pixels landing there are
    dropped, preserving the crop-to-canvas semantics."""
    h_c, w_c = canvas_u8.shape[:2]
    grow_h = max(0, out_max_hw[0] - h_c)
    grow_w = max(0, out_max_hw[1] - w_c)
    canvas_u8 = canvas_u8.astype(jnp.uint8)
    if grow_h or grow_w:
        canvas_u8 = jnp.pad(canvas_u8, ((0, grow_h), (0, grow_w), (0, 0)))
    return canvas_u8


def _blend_window(
    canvas_u8: jnp.ndarray,
    resized_f32: jnp.ndarray,
    x1: jnp.ndarray,
    y1: jnp.ndarray,
) -> jnp.ndarray:
    """Alpha-over ``resized_f32`` [mh, mw, 4] at (x1, y1) onto the uint8
    canvas carry. O(mh*mw) traffic; the canvas never materializes in int32.

    Requires mh <= H and mw <= W (callers pad tiny canvases up or pick a
    smaller out_max). Destination clamping: dynamic_slice-style window
    clamping plus a compensating source shift reproduces PIL's "crop the
    overlay to the canvas" semantics for x1, y1 in [0, W/H]; fully
    off-canvas or NEGATIVE origins become no-ops. That last case is a
    DOCUMENTED divergence (PARITY.md #4): PIL raises ValueError on a
    negative alpha_composite dest, so the reference fails loudly where
    this kernel silently skips the placement. Solver-produced boxes are
    always clamped non-negative (layout/flex.clamp_boxes); raw
    compositor.composite callers passing negative origins get the skip.
    """
    mh, mw = resized_f32.shape[0], resized_f32.shape[1]
    h_c, w_c = canvas_u8.shape[0], canvas_u8.shape[1]
    drop = (x1 < 0) | (y1 < 0) | (x1 >= w_c) | (y1 >= h_c)
    x1c = jnp.clip(x1, 0, w_c)
    y1c = jnp.clip(y1, 0, h_c)
    ws_x = jnp.minimum(x1c, w_c - mw)
    ws_y = jnp.minimum(y1c, h_c - mh)
    dx = x1c - ws_x
    dy = y1c - ws_y
    # Window starts at ws = x1 - dx, so window col c holds source col c - dx:
    # front-pad the source and slice at (mh - dy, mw - dx).
    src_pad = jnp.pad(resized_f32, ((mh, 0), (mw, 0), (0, 0)))
    src = jax.lax.dynamic_slice(src_pad, (mh - dy, mw - dx, 0), (mh, mw, 4))
    src = jnp.where(drop, 0.0, src)
    window = jax.lax.dynamic_slice(canvas_u8, (ws_y, ws_x, 0), (mh, mw, 4))
    blended = alpha_over_u8(window.astype(jnp.int32), src.astype(jnp.int32))
    return jax.lax.dynamic_update_slice(
        canvas_u8, blended.astype(jnp.uint8), (ws_y, ws_x, 0)
    )


def paste_object(
    canvas: jnp.ndarray,
    obj_f32: jnp.ndarray,
    xy,
    wh=None,
) -> jnp.ndarray:
    """Single windowed alpha-over paste onto a uint8 canvas.

    obj_f32: float32 [mh, mw, 4] holding uint8 values, zero outside its
    live region (zero alpha => exact dst passthrough, as in Pillow).
    """
    del wh  # the zero-alpha region of obj_f32 already masks the live box
    return _blend_window(canvas.astype(jnp.uint8), obj_f32, xy[0], xy[1])


@functools.partial(jax.jit, static_argnames=("out_max_hw", "method"))
def composite_canvas(
    canvas_u8: jnp.ndarray,
    objs_u8: jnp.ndarray,
    obj_hw: jnp.ndarray,
    boxes: jnp.ndarray,
    out_max_hw: Tuple[int, int] | None = None,
    method: str = "lanczos",
) -> jnp.ndarray:
    """Compose all objects onto the canvas in array order (traced sizes).

    canvas_u8: uint8 [H, W, 4]  — the background canvas.
    objs_u8:   uint8 [N, Hm, Wm, 4] — zero-padded RGBA cutouts.
    obj_hw:    int32 [N, 2] — (h, w) actual size per object.
    boxes:     int32 [N, 4] — (x1, y1, x2, y2) destination boxes. A padded
               slot must carry a zero-alpha object (zero padding suffices);
               it then composites as a no-op.

    Width/height floors at 1 px match the reference (compositor.py:17-18).
    With downscale-only layouts (the solver never upscales) pass
    ``out_max_hw`` = the object pad size to minimize resize work.
    """
    h_c, w_c = canvas_u8.shape[:2]
    if out_max_hw is None:
        out_max_hw = (h_c, w_c)

    # Resize stays inside the scan: A/B-measured faster than hoisting a
    # batched resize (the materialized [N, mh, mw, 4] f32 buffer costs more
    # HBM traffic than the scan serialization costs MXU idle time).
    def step(work, per_obj):
        obj, hw, box = per_obj
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        w = jnp.maximum(1, x2 - x1)
        h = jnp.maximum(1, y2 - y1)
        resized = resize_f32(
            obj.astype(jnp.float32), (hw[0], hw[1]), (h, w), out_max_hw, method
        )
        return _blend_window(work, resized, x1, y1), None

    work = _grow_canvas(canvas_u8, out_max_hw)
    work, _ = jax.lax.scan(step, work, (objs_u8, obj_hw, boxes))
    return work[:h_c, :w_c]


composite_batch = jax.vmap(
    composite_canvas, in_axes=(0, 0, 0, 0), out_axes=0, axis_name="batch"
)
"""vmapped compose: canvases [B,H,W,4], objects [B,N,Hm,Wm,4], sizes, boxes."""


@functools.partial(jax.jit, static_argnames=("wide",))
def composite_canvas_tables(
    canvas_u8: jnp.ndarray,
    objs_u8: jnp.ndarray,
    boxes: jnp.ndarray,
    kh_i32: jnp.ndarray,
    kv_i32: jnp.ndarray,
    same_size: jnp.ndarray,
    wide: bool = False,
) -> jnp.ndarray:
    """Compose with precomputed per-object coefficient tables.

    kh_i32: int32 [N, Wout_max, Wm]; kv_i32: int32 [N, Hout_max, Hm];
    same_size: bool [N] — per-object PIL identity shortcut. With host-built
    tables the output is bit-exact vs the PIL pipeline.
    """
    h_c, w_c = canvas_u8.shape[:2]

    def step(work, per_obj):
        obj, kh, kv, same, box = per_obj
        resized = resize_with_tables(
            obj.astype(jnp.float32), kh, kv, same, wide=wide
        )
        return _blend_window(work, resized, box[0], box[1]), None

    work = _grow_canvas(canvas_u8, (kv_i32.shape[1], kh_i32.shape[1]))
    work, _ = jax.lax.scan(step, work, (objs_u8, kh_i32, kv_i32, same_size, boxes))
    return work[:h_c, :w_c]


@functools.partial(jax.jit, static_argnames=("wide",))
def composite_canvas_tables_indexed(
    canvas_u8: jnp.ndarray,
    objs_all: jnp.ndarray,
    perm: jnp.ndarray,
    boxes: jnp.ndarray,
    kh_i32: jnp.ndarray,
    kv_i32: jnp.ndarray,
    same_size: jnp.ndarray,
    wide: bool = False,
) -> jnp.ndarray:
    """Compose placements that index into a fixed device-resident object
    tensor: ``perm[k]`` selects the source cutout for placement k.

    Keeps the (large) object tensor uploaded once per run while placements,
    boxes and coefficient tables change per iteration — the host->device
    traffic per compose is only the small per-placement metadata.
    """
    h_c, w_c = canvas_u8.shape[:2]

    def step(work, per_placement):
        idx, box, kh, kv, same = per_placement
        resized = resize_with_tables(
            objs_all[idx].astype(jnp.float32), kh, kv, same, wide=wide
        )
        return _blend_window(work, resized, box[0], box[1]), None

    work = _grow_canvas(canvas_u8, (kv_i32.shape[1], kh_i32.shape[1]))
    work, _ = jax.lax.scan(step, work, (perm, boxes, kh_i32, kv_i32, same_size))
    return work[:h_c, :w_c]


@functools.partial(jax.jit, static_argnames=("wide",))
def composite_canvas_tables_indexed_many(
    canvas_u8: jnp.ndarray,
    objs_all: jnp.ndarray,
    perm: jnp.ndarray,
    boxes: jnp.ndarray,
    kh_i32: jnp.ndarray,
    kv_i32: jnp.ndarray,
    same_size: jnp.ndarray,
    wide: bool = False,
) -> jnp.ndarray:
    """A batch of independent placement sets (leading axis) composed onto
    one shared canvas/object tensor in a single dispatch.

    This is the serving coalescer's op: B queued compatible requests run as
    one vmapped program instead of B sequential dispatches. Placement-count
    padding uses all-zero coefficient tables (a fully transparent source is
    an exact alpha-over no-op), so ragged request sizes share one compile
    key. Returns uint8 [B, H, W, 4].
    """

    def one(p, b, kh, kv, s):
        return composite_canvas_tables_indexed(
            canvas_u8, objs_all, p, b, kh, kv, s, wide=wide
        )

    return jax.vmap(one)(perm, boxes, kh_i32, kv_i32, same_size)


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

    n, pad_h, pad_w = objs_u8.shape[0], objs_u8.shape[1], objs_u8.shape[2]
    if out_max_hw is None:
        # Resized buffers only need to cover the largest requested box.
        need_h = max(
            (max(1, int(b[3]) - int(b[1])) for b in boxes), default=1
        )
        need_w = max(
            (max(1, int(b[2]) - int(b[0])) for b in boxes), default=1
        )
        out_max_hw = (max(need_h, pad_h), max(need_w, pad_w))
    from .resize import needs_wide_accumulation

    kh = np.zeros((n, out_max_hw[1], pad_w), np.int32)
    kv = np.zeros((n, out_max_hw[0], pad_h), np.int32)
    same = np.zeros((n,), bool)
    wide = False
    for k in range(n):
        x1, y1, x2, y2 = (int(v) for v in boxes[k])
        w = max(1, x2 - x1)
        h = max(1, y2 - y1)
        oh, ow = int(obj_hw[k][0]), int(obj_hw[k][1])
        kh[k] = build_coeffs_host(ow, w, pad_w, out_max_hw[1], method)
        kv[k] = build_coeffs_host(oh, h, pad_h, out_max_hw[0], method)
        same[k] = (w == ow) and (h == oh)
        # extreme downscales (an object hundreds of times wider than its
        # box) need chunked-exact limb accumulation to stay bit-exact
        wide = wide or needs_wide_accumulation(ow, w, method) or (
            needs_wide_accumulation(oh, h, method)
        )
    return composite_canvas_tables(
        jnp.asarray(canvas_u8),
        jnp.asarray(objs_u8),
        jnp.asarray(np.asarray(boxes, np.int32)),
        jnp.asarray(kh),
        jnp.asarray(kv),
        jnp.asarray(same),
        wide=wide,
    )
