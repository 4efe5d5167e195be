"""Robustness at higher object counts than the shipped bundles (3-4).

Synthesizes a 12-object bundle (3x the squarespace cutouts under fresh
ids/labels) and drives (a) the full hermetic iterate loop — conflict
precompute, validator coverage, solver, compose — and (b) the batched
clamped compose kernel vs the XLA path in interpret mode.
"""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

SRC = Path("data/squarespace")


@pytest.fixture(scope="module")
def big_bundle(tmp_path_factory):
    root = tmp_path_factory.mktemp("bundles") / "big"
    (root / "objects").mkdir(parents=True)
    shutil.copy(SRC / "background.png", root / "background.png")
    items = json.loads((SRC / "results.json").read_text())
    out_items = []
    oid = 1
    for copy in range(3):
        for it in items:
            fname = f"objects/{Path(it['filename']).stem}_c{copy}.png"
            shutil.copy(SRC / it["filename"], root / fname)
            out_items.append({
                "object_id": oid,
                "label": it["label"],
                "per_label_number": oid,
                "filename": fname,
                "bounding_box": it["bounding_box"],
                "confidence_score": 1.0,
            })
            oid += 1
    (root / "results.json").write_text(json.dumps(out_items))
    return root


def test_full_loop_with_twelve_objects(big_bundle, tmp_path):
    from image_transformation_tpu.pipeline.fleet import install_generic_fake_client
    from image_transformation_tpu.pipeline.run import run_macro_only
    from image_transformation_tpu.vlm.client import register_fake_client

    install_generic_fake_client()
    try:
        base = run_macro_only(
            big_bundle, "9:16", "center", 0.05,
            api_type="auto", refine_iters=1, base_output_root=tmp_path,
        )
    finally:
        register_fake_client(None)
    layout = json.loads(
        (base / "iteration_00/layout_json/layout_macro_iter_00.json").read_text()
    )
    assert len(layout["placements"]) == 12
    # every object placed inside the canvas
    W, H = layout["canvas"]["width"], layout["canvas"]["height"]
    for p in layout["placements"]:
        x1, y1, x2, y2 = p["box"]
        assert 0 <= x1 <= x2 <= W and 0 <= y1 <= y2 <= H, p
    draft = Image.open(
        base / "iteration_00/final_product/draft_macro_iter_00.png"
    )
    assert draft.size == (W, H)


def test_batched_kernel_with_twelve_objects(big_bundle):
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.ops.compose import composite_canvas
    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_hybrid_packed,
    )
    from image_transformation_tpu.parallel.sweep import random_downscale_boxes

    bundle = load_bundle(big_bundle)
    arrays = bundle.to_arrays()
    assert arrays.objects.shape[0] == 12
    pad = arrays.objects.shape[1:3]
    H, W, B = 480, 640, 2
    rng = np.random.default_rng(29)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    dev = tuple(
        jnp.asarray(x)
        for x in (canvases, objs, hw.astype(np.int32), boxes.astype(np.int32))
    )
    from image_transformation_tpu.ops import resize as rz

    real = rz.resample_fixed_traced
    rz.resample_fixed_traced = rz.resample_fixed  # order-independent math
    jax.clear_caches()  # jitted producers may be cached with the hp resample
    try:
        out = np.asarray(
            composite_batch_hybrid_packed(*dev, interpret=True, clamped=True)
        )
        ref = np.asarray(
            jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
        )
    finally:
        rz.resample_fixed_traced = real
        jax.clear_caches()
    assert np.array_equal(out, ref)
