"""Fused solve+background+compose program vs the host pipeline."""

import numpy as np
from PIL import Image

from image_transformation_tpu.core.bundle import load_bundle
from image_transformation_tpu.layout.canvas import compute_canvas_size
from image_transformation_tpu.layout.flex import solve_flex
from image_transformation_tpu.pipeline.fused import fused_multi_ratio_render

RATIOS = ["9:16", "1:1", "16:9", "4:1"]


def _layout_for(bundle):
    return {
        "type": "flex",
        "direction": "column",
        "children": [
            {"object_id": oid, "name": bundle.meta[oid].label}
            for oid in bundle.object_ids()
        ],
    }


def _pil_reference(bundle, root, ratio):
    from background_resizing import fill_solid

    W, H = compute_canvas_size(bundle.background.size, ratio, verbose=False)
    placements = solve_flex(root, (W, H), bundle.sizes())
    canvas = fill_solid(str(bundle.background_path), (W, H))
    out = canvas.copy()
    for p in placements:
        oid = int(p["object_id"])
        x1, y1, x2, y2 = p["box"]
        w, h = max(1, x2 - x1), max(1, y2 - y1)
        out.alpha_composite(
            bundle.objects[oid].resize((w, h), Image.LANCZOS), dest=(x1, y1)
        )
    return np.asarray(out), placements


def test_fused_multi_ratio_matches_host_pipeline():
    bundle = load_bundle("data/audio_book")
    root = _layout_for(bundle)
    renders, solved = fused_multi_ratio_render(bundle, root, RATIOS)
    for i, ratio in enumerate(RATIOS):
        ref, placements = _pil_reference(bundle, root, ratio)
        got = renders[ratio]
        assert got.shape == ref.shape, f"{ratio}: {got.shape} vs {ref.shape}"
        # solved boxes must match the host oracle exactly
        for k, p in enumerate(placements):
            assert solved[ratio][k].tolist() == p["box"], (
                f"{ratio} obj {k}: {solved[ratio][k].tolist()} vs {p['box']}"
            )
        # pixels: traced-coefficient path budget
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 2, f"{ratio}: max pixel err {diff.max()}"


def test_fused_render_pallas_kernel_matches_xla():
    """make_fused_render(kernel='pallas') — layout solve + background fill
    + gen-3 fused Pallas compose in one program — must match the XLA step
    (interpret mode; identical in-kernel table math on CPU)."""
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.layout.solve import FlexProgram
    from image_transformation_tpu.ops.background import masked_median_rgb
    from image_transformation_tpu.pipeline.fused import make_fused_render

    bundle = load_bundle("data/squarespace")
    root = _layout_for(bundle)
    sizes = [compute_canvas_size(bundle.background.size, r, verbose=False)
             for r in RATIOS]
    w_max = max(w for w, _ in sizes)
    h_max = max(h for _, h in sizes)
    arrays = bundle.to_arrays()
    prog = FlexProgram.from_dsl(root)
    n = prog.n_objects
    obj_pad = (arrays.objects.shape[1], arrays.objects.shape[2])
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
    median = masked_median_rgb(jnp.asarray(np.asarray(bundle.background)))
    args = (
        jnp.asarray(np.asarray(sizes, np.int32)),
        median.astype(jnp.uint8),
        jnp.asarray(objs),
        jnp.asarray(obj_wh),
        jnp.asarray(known),
    )
    ox, bx, sx, lx = make_fused_render(prog, (h_max, w_max), obj_pad)(*args)
    op, bp, sp, lp = make_fused_render(
        prog, (h_max, w_max), obj_pad, kernel="pallas", interpret=True
    )(*args)
    assert np.array_equal(np.asarray(bx), np.asarray(bp))
    assert np.array_equal(np.asarray(sx), np.asarray(sp))
    diff = np.abs(np.asarray(ox).astype(int) - np.asarray(op).astype(int))
    assert diff.max() <= 1  # cross-program traced-resample envelope
    # luma is the MASKED mean over each variant's true extent, so the
    # kernels' +/-1 pixel envelope carries straight through (it is no
    # longer diluted by bit-identical padding): |mean diff| <= max pixel
    # diff. The old 0.01 bound only held because pad pixels dominated.
    assert np.allclose(np.asarray(lx), np.asarray(lp), atol=1.0)


def test_fused_luma_is_masked_to_true_extent():
    """The per-variant luma must equal the Rec.709 mean of the CROPPED
    render — out-of-canvas padding (garbage-by-construction) must not
    contaminate the stat, however different the variant extents are."""
    import jax.numpy as jnp

    bundle = load_bundle("data/squarespace")
    root = _layout_for(bundle)
    ratios = ["9:16", "16:9"]  # maximally mismatched extents in one batch
    renders, _ = fused_multi_ratio_render(bundle, root, ratios)
    from image_transformation_tpu.layout.canvas import compute_canvas_size
    from image_transformation_tpu.layout.solve import FlexProgram
    from image_transformation_tpu.pipeline.fused import (
        make_fused_render,
        map_bundle_to_program,
    )
    from image_transformation_tpu.ops.background import masked_median_rgb

    sizes = [compute_canvas_size(bundle.background.size, r, verbose=False)
             for r in ratios]
    w_max = max(w for w, _ in sizes)
    h_max = max(h for _, h in sizes)
    arrays = bundle.to_arrays()
    prog = FlexProgram.from_dsl(root)
    obj_pad = (arrays.objects.shape[1], arrays.objects.shape[2])
    objs, obj_wh, known = map_bundle_to_program(prog, bundle, arrays)
    median = masked_median_rgb(jnp.asarray(np.asarray(bundle.background)))
    out, _, _, luma = make_fused_render(prog, (h_max, w_max), obj_pad)(
        jnp.asarray(np.asarray(sizes, np.int32)), median.astype(jnp.uint8),
        jnp.asarray(objs), jnp.asarray(obj_wh), jnp.asarray(known),
    )
    out_np = np.asarray(out)
    for i, (w, h) in enumerate(sizes):
        crop = out_np[i, :h, :w, :3].astype(np.float64)
        expect = crop.mean(axis=(0, 1)) @ np.array([0.2126, 0.7152, 0.0722])
        assert abs(float(luma[i]) - expect) < 0.05, (i, float(luma[i]), expect)


def test_fused_render_is_one_program_small():
    bundle = load_bundle("data/squarespace")
    root = _layout_for(bundle)
    renders, _ = fused_multi_ratio_render(bundle, root, ["1:1"])
    out = renders["1:1"]
    assert out.shape == (492, 492, 4)
    assert (out[..., 3] == 255).all()


def test_fused_render_gradient_pallas_matches_xla():
    """Gradient-background fused render: the pallas branch (packed
    per-variant gradient plane) must match the XLA branch (interpret
    mode), and the cropped background must match the standalone gradient
    canvas bit-for-bit (identical traced ramp arithmetic)."""
    import jax.numpy as jnp

    from image_transformation_tpu.layout.solve import FlexProgram
    from image_transformation_tpu.pipeline.fused import (
        background_spec,
        make_fused_render,
    )

    bundle = load_bundle("data/audio_book")
    root = _layout_for(bundle)
    sizes = [compute_canvas_size(bundle.background.size, r, verbose=False)
             for r in RATIOS]
    w_max = max(w for w, _ in sizes)
    h_max = max(h for _, h in sizes)
    arrays = bundle.to_arrays()
    prog = FlexProgram.from_dsl(root)
    n = prog.n_objects
    obj_pad = (arrays.objects.shape[1], arrays.objects.shape[2])
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
    bg, horizontal = background_spec(
        jnp.asarray(np.asarray(bundle.background)), "gradient"
    )
    assert bg.shape == (2, 3)
    args = (
        jnp.asarray(np.asarray(sizes, np.int32)),
        bg,
        jnp.asarray(objs),
        jnp.asarray(obj_wh),
        jnp.asarray(known),
    )
    kw = dict(background="gradient", gradient_horizontal=horizontal)
    ox, bx, sx, lx = make_fused_render(prog, (h_max, w_max), obj_pad, **kw)(*args)
    op, bp, sp, lp = make_fused_render(
        prog, (h_max, w_max), obj_pad, kernel="pallas", interpret=True, **kw
    )(*args)
    assert np.array_equal(np.asarray(bx), np.asarray(bp))
    diff = np.abs(np.asarray(ox).astype(int) - np.asarray(op).astype(int))
    assert diff.max() <= 1  # cross-program traced-resample envelope
    # gradient ramps flip by 1 at truncation boundaries between the two
    # programs' division lowerings, so the mean shifts by up to ~1 level
    assert np.allclose(np.asarray(lx), np.asarray(lp), atol=1.0)

    # uncovered background pixels equal the fused gradient (both branches)
    ox_np, bx_np = np.asarray(ox), np.asarray(bx)
    for i, (w, h) in enumerate(sizes):
        covered = np.zeros((h, w), bool)
        for x1, y1, x2, y2 in bx_np[i]:
            covered[max(0, y1):max(0, y2), max(0, x1):max(0, x2)] = True
        crop = ox_np[i, :h, :w]
        crop_p = np.asarray(op)[i, :h, :w]
        bg_diff = np.abs(crop[~covered].astype(int) - crop_p[~covered].astype(int))
        assert bg_diff.max() <= 1  # ramp truncation boundaries, program-dependent
        assert (crop[~covered][:, 3] == 255).all()
