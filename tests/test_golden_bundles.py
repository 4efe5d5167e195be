"""Compose-path goldens on the shipped bundles.

The oracle is PIL itself (LANCZOS resize + alpha_composite in placement
order), i.e. exactly what the reference pipeline executes per placement.
The public shim path (host-built coefficient tables) must be BIT-EXACT;
the fully-traced path (in-graph f32 tables) is allowed <=2/255 from rare
coefficient rounding flips. This pins the BASELINE.json numerics target.
"""

import numpy as np
import pytest
from PIL import Image

from compositor import composite, load_object_images
from image_transformation_tpu.layout.canvas import compute_canvas_size

BUNDLES = ["squarespace", "audio_book"]


def _pil_oracle(bg, objects, placements):
    canvas = bg.copy()
    for p in placements:
        oid = int(p["object_id"])
        if oid not in objects:
            continue
        x1, y1, x2, y2 = [int(v) for v in p["box"]]
        w, h = max(1, x2 - x1), max(1, y2 - y1)
        canvas.alpha_composite(objects[oid].resize((w, h), Image.LANCZOS), dest=(x1, y1))
    return canvas


def _placements_for(objects, W, H, seed):
    rng = np.random.default_rng(seed)
    placements = []
    for oid in sorted(objects):
        ow, oh = objects[oid].size
        s = float(rng.uniform(0.25, 1.5))
        w, h = max(1, int(ow * s)), max(1, int(oh * s))
        w, h = min(w, W), min(h, H)
        x1 = int(rng.integers(0, max(1, W - w)))
        y1 = int(rng.integers(0, max(1, H - h)))
        placements.append({"object_id": oid, "box": [x1, y1, x1 + w, y1 + h]})
    # plus one identity-scale placement exercising the PIL copy shortcut
    oid0 = sorted(objects)[0]
    ow, oh = objects[oid0].size
    placements.append({"object_id": oid0, "box": [0, 0, min(ow, W), min(oh, H)]})
    return placements


@pytest.mark.parametrize("bundle", BUNDLES)
@pytest.mark.parametrize("ratio", ["1:1", "9:16"])
def test_bundle_compose_bit_exact(bundle, ratio):
    objects = load_object_images(f"data/{bundle}/results.json")
    bg_img = Image.open(f"data/{bundle}/background.png").convert("RGBA")
    W, H = compute_canvas_size(bg_img.size, ratio, verbose=False)
    canvas = Image.new("RGBA", (W, H), (120, 130, 140, 255))
    placements = _placements_for(objects, W, H, seed=len(bundle) * 37 + len(ratio))
    ours = np.asarray(composite(canvas, objects, placements))
    ref = np.asarray(_pil_oracle(canvas, objects, placements))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() == 0, f"{bundle} {ratio}: max err {diff.max()}"


def test_bundle_compose_1080p_bit_exact():
    objects = load_object_images("data/squarespace/results.json")
    canvas = Image.new("RGBA", (1920, 1080), (240, 240, 240, 255))
    placements = _placements_for(objects, 1920, 1080, seed=11)
    ours = np.asarray(composite(canvas, objects, placements))
    ref = np.asarray(_pil_oracle(canvas, objects, placements))
    assert np.abs(ours.astype(int) - ref.astype(int)).max() == 0


def test_traced_path_within_budget():
    """The fully-traced compose (in-graph coefficient tables) stays inside
    the documented 2/255 worst-case envelope on real bundle data."""
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.ops.compose import composite_canvas

    bundle = load_bundle("data/audio_book")
    arrays = bundle.to_arrays()
    W = H = 400
    canvas = Image.new("RGBA", (W, H), (10, 200, 30, 255))
    placements = _placements_for(bundle.objects, W, H, seed=5)[: arrays.n_valid]
    boxes = np.array([p["box"] for p in placements], np.int32)
    out = np.asarray(
        composite_canvas(
            jnp.asarray(np.asarray(canvas)),
            jnp.asarray(arrays.objects),
            jnp.asarray(arrays.obj_hw),
            jnp.asarray(boxes),
        )
    )
    ref = np.asarray(
        _pil_oracle(
            canvas,
            bundle.objects,
            [
                {"object_id": int(arrays.object_ids[k]), "box": boxes[k].tolist()}
                for k in range(arrays.n_valid)
            ],
        )
    )
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2
