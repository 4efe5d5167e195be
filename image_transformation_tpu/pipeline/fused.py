"""Fully-fused render: background + layout solve + compose in ONE program.

BASELINE.json config #3 ("one bundle vmapped across 9:16/1:1/16:9/
ultra-wide canvases in a single pass"): aspect-ratio variants share one
compiled program by rendering onto a padded superset canvas with the
*actual* (W, H) as traced data — the tensorized solver (layout/solve.py)
takes traced canvas sizes, the compose kernel takes traced boxes, and the
solid background is a broadcast. One vmap leg = one ratio variant (or one
bundle); the crop to each variant's true size happens at artifact time.

This is the framework's flagship device step: everything after bundle
ingest — layout arithmetic, coefficient construction, Lanczos resampling,
alpha compositing, render statistics — runs in a single XLA program with
no host round-trips.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..layout.solve import FlexProgram, solve_program
from ..ops.compose import composite_canvas
from ..ops.compose_pallas import REC709 as _REC709


def _make_padded_canvas(background: str, gradient_horizontal: bool,
                        canvas_max_hw: Tuple[int, int]):
    """Background synthesizer for one variant onto the padded superset.

    "solid": broadcast rgba. "gradient": linear c1 -> c2 ramp spanning the
    variant's TRUE extent along the (static) axis — same f32 lerp +
    truncating u8 cast as ops.background.gradient_canvas (the reference's
    fill_gradient, /root/reference/background_resizing.py:63-98); the
    cropped region matches the per-request path within +/-1 at ramp
    truncation boundaries (different compiled programs may lower the
    division differently — pinned in tests/test_fused_render.py).
    """
    h_max, w_max = canvas_max_hw
    if background not in ("solid", "gradient"):
        raise ValueError(f"unknown background mode: {background!r}")

    def padded_canvas(bg, wh):
        """uint8 [h_max, w_max, 4] background for one variant."""
        if background == "solid":
            rgba = jnp.concatenate([bg, jnp.array([255], jnp.uint8)])
            return jnp.broadcast_to(rgba, (h_max, w_max, 4))
        c1f = bg[0].astype(jnp.float32)
        c2f = bg[1].astype(jnp.float32)
        span, extent = (
            (w_max, wh[0]) if gradient_horizontal else (h_max, wh[1])
        )
        # integer-ratio weights: i, (n-1-i), and (n-1) are all exact in
        # f32 (< 2^24), so each division rounds the exact rational ONCE —
        # matching the reference's f32(1 - t_f64) weight to the last ulp
        # (computing 1.0f - t instead loses a ulp to round-to-even ties
        # and flips the truncating u8 cast). The extent is traced here, so
        # the host-f64 form gradient_canvas uses is not available.
        denom = jnp.maximum(1.0, extent.astype(jnp.float32) - 1.0)
        idx = jnp.arange(span, dtype=jnp.float32)
        t = idx / denom
        w1 = (denom - idx) / denom
        ramp = (w1[:, None] * c1f + t[:, None] * c2f).astype(jnp.uint8)
        if gradient_horizontal:
            rgb = jnp.broadcast_to(ramp[None, :, :], (h_max, w_max, 3))
        else:
            rgb = jnp.broadcast_to(ramp[:, None, :], (h_max, w_max, 3))
        alpha = jnp.full((h_max, w_max, 1), 255, jnp.uint8)
        return jnp.concatenate([rgb, alpha], axis=-1)

    return padded_canvas


def _variant_luma(out_u8, wh, canvas_max_hw: Tuple[int, int]):
    """Mean Rec.709 luminance over the variant's TRUE (W, H) extent.

    The padded superset's out-of-canvas area is garbage-by-construction
    (background extrapolation), so the run-level stat masks it out instead
    of averaging over the full (h_max, w_max) plane."""
    h_max, w_max = canvas_max_hw
    row = jnp.arange(h_max, dtype=jnp.int32)[:, None] < wh[1]
    col = jnp.arange(w_max, dtype=jnp.int32)[None, :] < wh[0]
    mask = row & col
    denom = jnp.maximum(1.0, (wh[0] * wh[1]).astype(jnp.float32))
    # weighted per-pixel luminance, then ONE masked reduce (same pass
    # structure as ops.compose_pallas.packed_luma). An f32 tensordot here
    # measured ~0.4 luma error at 1080p scale — the dot's naive MAC
    # accumulation loses bits once the partial sum passes 2^25, while
    # XLA's reduce lowering stays ~1e-3 accurate.
    lum = out_u8[..., :3].astype(jnp.float32) @ jnp.array(_REC709, jnp.float32)
    return jnp.sum(jnp.where(mask, lum, 0.0)) / denom


def _make_render_one(prog, canvas_max_hw, obj_pad_hw, method, padded_canvas):
    """The per-variant XLA render core, shared by the single-chip and
    sharded steps so their semantics (backgrounds, stats) can't drift."""

    def render_one(wh, bg, objs, obj_wh, obj_known):
        boxes, scales = solve_program(prog, (wh[0], wh[1]), obj_wh, obj_known)
        canvas = padded_canvas(bg, wh)
        hw_swapped = obj_wh[:, ::-1]  # compose wants (h, w)
        out = composite_canvas(
            canvas, objs, hw_swapped, boxes, obj_pad_hw, method
        )
        return out, boxes, scales, _variant_luma(out, wh, canvas_max_hw)

    return render_one


def map_bundle_to_program(prog: FlexProgram, bundle, arrays):
    """Bundle arrays in FlexProgram row order: (objs, obj_wh, known).

    FlexProgram rows are DSL order; the bundle tensor is id order. The ONE
    home of this mapping (fused render, fleet, serving all consume it) —
    unknown object ids keep zero rows with known=False, exactly the
    compositor's skip semantics."""
    n = prog.n_objects
    objs = np.zeros((n, *arrays.objects.shape[1:]), np.uint8)
    obj_wh = np.zeros((n, 2), np.int32)
    known = np.zeros((n,), bool)
    size_map = bundle.sizes()
    for k, oid in enumerate(prog.obj_ids):
        oid = int(oid)
        if oid in size_map:
            objs[k] = arrays.objects[arrays.index_of(oid)]
            obj_wh[k] = size_map[oid]
            known[k] = True
    return objs, obj_wh, known


def make_fused_render(
    prog: FlexProgram,
    canvas_max_hw: Tuple[int, int],
    obj_pad_hw: Tuple[int, int],
    method: str = "lanczos",
    kernel: str = "xla",
    interpret: bool = False,
    background: str = "solid",
    gradient_horizontal: bool = True,
    static_obj_hw: Tuple[Tuple[int, int], ...] | None = None,
):
    """Build the jitted fused step for one layout structure.

    ``static_obj_hw`` (pallas kernel only): per-object static (h, w) size
    covers — each entry an upper bound on that object's actual asset size
    — specializing the kernel's resample dots per object index (STATUS
    item 19 in ops/compose_pallas; bitwise-identical output). Serving
    knows these exactly: assets are fixed per bundle.

    Returned step signature:
        step(canvas_wh [V,2] int32  (W, H per variant),
             bg        uint8: [3] solid color, or [2, 3] gradient (c1, c2),
             objs      [N, Hm, Wm, 4] uint8,
             obj_wh    [N, 2] int32 (w, h),
             obj_known [N] bool)
        -> (canvases [V, Hmax, Wmax, 4] uint8, boxes [V, N, 4],
            scales [V, N], luma [V])

    Out-of-canvas area of each padded render is garbage-by-construction
    (background extrapolation); crop with the per-variant (W, H) before
    use. ``luma`` is the masked mean over each variant's TRUE (W, H)
    extent — pad pixels never contaminate the stat.

    ``background="gradient"`` synthesizes the linear c1 -> c2 ramp on
    device per variant, spanning the variant's TRUE extent along the
    (static) ``gradient_horizontal`` axis — same f32 lerp + truncating u8
    cast as ops.background.gradient_canvas (the reference's fill_gradient,
    /root/reference/background_resizing.py:63-98); the cropped region
    matches the per-request path within +/-1 at ramp truncation
    boundaries (division lowering differs between compiled programs).

    ``kernel="pallas"`` swaps the vmapped XLA compose for the gen-3 fused
    Pallas kernel (in-kernel tables) INSIDE the same program — layout
    solve, background fill, resample+blend, and stats still compile into
    one dispatch. Same signature and padded-render semantics (the plane is
    bitcast back to u8 NHWC and cropped to (h_max, w_max)). Numerics:
    traced-table envelope. ``interpret`` runs the kernel in the Pallas
    interpreter (CPU tests).
    """
    h_max, w_max = canvas_max_hw
    padded_canvas = _make_padded_canvas(
        background, gradient_horizontal, canvas_max_hw
    )
    render_one = _make_render_one(
        prog, canvas_max_hw, obj_pad_hw, method, padded_canvas
    )

    @jax.jit
    def step(canvas_wh, bg_color, objs, obj_wh, obj_known):
        return jax.vmap(render_one, in_axes=(0, None, None, None, None))(
            canvas_wh, bg_color, objs, obj_wh, obj_known
        )

    if kernel != "pallas":
        return step

    from ..ops.compose_pallas import (
        _fused_v3_meta,
        _pallas_fused_v3_impl,
        _round_up,
        fused_canvas_pad_hw,
        packed_luma_masked,
        planarize_objects,
        window_extents,
    )

    mh_a = _round_up(obj_pad_hw[0], 8)
    mw_a = _round_up(obj_pad_hw[1], 128)
    MH, MW = window_extents((mh_a, mw_a))
    hp, wp = fused_canvas_pad_hw((h_max, w_max), (mh_a, mw_a))

    @jax.jit
    def pallas_step(canvas_wh, bg, objs, obj_wh, obj_known):
        v = canvas_wh.shape[0]
        boxes, scales = jax.vmap(
            lambda wh: solve_program(prog, (wh[0], wh[1]), obj_wh, obj_known)
        )(canvas_wh)
        hw_swapped = obj_wh[:, ::-1]
        # drop/clip against the PADDED (h_max, w_max) canvas — exactly the
        # XLA step's semantics (composite_canvas paints into the padded
        # superset; the per-variant crop happens at artifact time), so the
        # two kernels return identical padded renders and luma stats
        meta = jax.vmap(
            lambda b_: _fused_v3_meta(
                hw_swapped, b_, (h_max, w_max), (hp, wp), (MH, MW)
            )
        )(boxes)
        if background == "solid":
            rgba = jnp.concatenate([bg, jnp.array([255], jnp.uint8)])
            bg_packed = jax.lax.bitcast_convert_type(rgba, jnp.int32)[()]
            canvas_v = jnp.broadcast_to(bg_packed, (v, hp, wp))
        else:
            # per-variant gradient plane, packed u8x4 -> i32 (the kernel's
            # canvas convention); pad region extrapolates, crop discards it
            def grad_plane(wh):
                rgba = padded_canvas(bg, wh)
                padded = jnp.zeros((hp, wp, 4), jnp.uint8)
                padded = padded.at[:h_max, :w_max].set(rgba)
                return jax.lax.bitcast_convert_type(padded, jnp.int32)
            canvas_v = jax.vmap(grad_plane)(canvas_wh)
        # ONE shared planar copy — the kernel reads object row 0 for every
        # variant (compose_pallas STATUS item 24) instead of materializing
        # V identical ~10s-of-MB copies as a pallas operand per call
        objs_p = planarize_objects(objs[None])
        out_v = _pallas_fused_v3_impl(
            canvas_v, objs_p, meta, (hp, wp), (mh_a, mw_a), method, interpret,
            static_in_hw=static_obj_hw,
        )
        crop = out_v[:, :h_max, :w_max]
        out = jax.lax.bitcast_convert_type(crop, jnp.uint8)
        return out, boxes, scales, packed_luma_masked(crop, canvas_wh)

    return pallas_step


def make_sharded_fused_render(
    mesh,
    prog: FlexProgram,
    canvas_max_hw: Tuple[int, int],
    obj_pad_hw: Tuple[int, int],
    method: str = "lanczos",
    spatial: bool = False,
    batch_axes: Tuple[str, ...] = ("data",),
    masked: bool = False,
    background: str = "solid",
    gradient_horizontal: bool = True,
):
    """Multi-chip fused step: variants shard over the mesh batch axes
    (canvas rows over ``spatial`` when set); object tensors replicate; the
    global mean luminance is a cross-device all-reduce. The per-variant
    render core (backgrounds incl. ``background="gradient"``, masked luma)
    is shared with :func:`make_fused_render`, so single-chip and sharded
    semantics agree by construction.

    ``batch_axes`` names the mesh axes the variant batch shards over —
    ``("data",)`` for one slice, ``("slice", "data")`` to span a two-level
    mesh where the leading axis stands in for DCN between slices (the
    stats all-reduce then crosses both levels, exactly the multi-slice
    production topology).

    ``masked=True`` adds a ``valid [V] bool`` argument (sharded with the
    batch): ragged variant counts pad up to the mesh extent (see
    ``pad_ragged_variants``) and the global luminance is the masked mean —
    padding legs render but never contaminate the run-level stat.

    This is the full device step (solve -> background -> compose -> stats)
    the production sweep runs, and what __graft_entry__.dryrun_multichip
    validates on a virtual mesh.
    """
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = batch_axes if len(batch_axes) > 1 else batch_axes[0]
    batch = NamedSharding(mesh, P(axes))
    repl = NamedSharding(mesh, P())
    out_spec = NamedSharding(mesh, P(axes, "spatial") if spatial else P(axes))

    render_core = _make_render_one(
        prog, canvas_max_hw, obj_pad_hw, method,
        _make_padded_canvas(background, gradient_horizontal, canvas_max_hw),
    )

    def render_one(wh, bg_color, objs, obj_wh, obj_known):
        out, boxes, _scales, luma = render_core(
            wh, bg_color, objs, obj_wh, obj_known
        )
        return out, boxes, luma

    def render_all(canvas_wh, bg_color, objs, obj_wh, obj_known):
        return jax.vmap(render_one, in_axes=(0, None, None, None, None))(
            canvas_wh, bg_color, objs, obj_wh, obj_known
        )

    if masked:
        @partial(
            jax.jit,
            in_shardings=(batch, repl, repl, repl, repl, batch),
            out_shardings=(out_spec, batch, repl),
        )
        def masked_step(canvas_wh, bg_color, objs, obj_wh, obj_known, valid):
            out, boxes, luma = render_all(canvas_wh, bg_color, objs, obj_wh,
                                          obj_known)
            w = valid.astype(jnp.float32)
            total = jnp.sum(luma * w) / jnp.maximum(1.0, jnp.sum(w))
            return out, boxes, total[None]  # cross-device (and slice) reduce

        return masked_step

    @partial(
        jax.jit,
        in_shardings=(batch, repl, repl, repl, repl),
        out_shardings=(out_spec, batch, repl),
    )
    def step(canvas_wh, bg_color, objs, obj_wh, obj_known):
        out, boxes, luma = render_all(canvas_wh, bg_color, objs, obj_wh,
                                      obj_known)
        return out, boxes, jnp.mean(luma, keepdims=True)  # cross-device reduce

    return step


def pad_ragged_variants(canvas_wh: np.ndarray, multiple: int):
    """(padded canvas_wh, valid mask): repeat the last variant row up to the
    next multiple of the mesh batch extent (jit sharding requires divisible
    batch dims), returning the mask that keeps padding out of masked stats
    and lets callers slice the real outputs back out."""
    v = canvas_wh.shape[0]
    pad = (-v) % multiple
    valid = np.ones((v + pad,), bool)
    valid[v:] = False
    if pad:
        canvas_wh = np.concatenate(
            [canvas_wh, np.repeat(canvas_wh[-1:], pad, axis=0)]
        )
    return canvas_wh, valid


def background_spec(bg_rgba_u8, mode: str = "solid"):
    """(bg array for make_fused_render, gradient_horizontal flag).

    "solid": uint8 [3] masked-median color. "gradient": uint8 [2, 3] edge
    colors along the lower-variance axis — axis selection delegated to
    ops.background.gradient_spec, the single home of that rule, so the
    per-request and batched paths always agree.
    """
    from ..ops.background import gradient_spec, masked_median_rgb

    if mode == "solid":
        return masked_median_rgb(bg_rgba_u8).astype(jnp.uint8), True
    if mode != "gradient":
        raise ValueError(f"unknown background mode: {mode!r}")
    c1, c2, horizontal = gradient_spec(bg_rgba_u8)
    return jnp.asarray(np.array([c1, c2], np.uint8)), horizontal


def fused_multi_ratio_render(
    bundle,
    root: Dict,
    ratios: List[str],
    method: str = "lanczos",
    kernel: str = "xla",
    interpret: bool = False,
    background: str = "solid",
):
    """Render one bundle's layout at several ratios in a single device pass.

    Returns {ratio: np.uint8 [H, W, 4]} plus the solved boxes per ratio.
    ``kernel="pallas"`` routes the compose through the gen-3 fused kernel
    (see make_fused_render); callers wanting robustness should catch and
    retry with the default.
    """
    from ..layout.canvas import compute_canvas_size

    sizes = [compute_canvas_size(bundle.background.size, r, verbose=False) for r in ratios]
    w_max = max(w for w, _ in sizes)
    h_max = max(h for _, h in sizes)

    arrays = bundle.to_arrays()
    prog = FlexProgram.from_dsl(root)
    obj_pad = (arrays.objects.shape[1], arrays.objects.shape[2])
    objs, obj_wh, known = map_bundle_to_program(prog, bundle, arrays)

    bg, horizontal = background_spec(
        jnp.asarray(np.asarray(bundle.background)), background
    )
    step = make_fused_render(
        prog, (h_max, w_max), obj_pad, method, kernel=kernel,
        interpret=interpret, background=background,
        gradient_horizontal=horizontal,
    )
    out, boxes, scales, luma = step(
        jnp.asarray(np.asarray(sizes, np.int32)),
        bg,
        jnp.asarray(objs),
        jnp.asarray(obj_wh),
        jnp.asarray(known),
    )
    out_np = np.asarray(out)
    boxes_np = np.asarray(boxes)
    renders = {}
    solved = {}
    for i, r in enumerate(ratios):
        w, h = sizes[i]
        renders[r] = out_np[i, :h, :w]
        solved[r] = boxes_np[i]
    return renders, solved
