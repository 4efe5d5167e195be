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


def test_fused_render_is_one_program_small():
    bundle = load_bundle("data/squarespace")
    root = _layout_for(bundle)
    renders, _ = fused_multi_ratio_render(bundle, root, ["1:1"])
    out = renders["1:1"]
    assert out.shape == (492, 492, 4)
    assert (out[..., 3] == 255).all()
