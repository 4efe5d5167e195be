"""Fused Pallas compose kernel vs the exact XLA path (interpret mode).

The compiled kernel is additionally validated bit-exact on real TPU
hardware (see ops/compose_pallas.py STATUS); CI runs the interpreter.
"""

import numpy as np
import pytest

from image_transformation_tpu.core.bundle import load_bundle
from image_transformation_tpu.ops.compose import composite_exact
from image_transformation_tpu.ops.compose_pallas import (
    composite_batch_pallas_host_tables,
    window_extents,
)
from image_transformation_tpu.parallel.sweep import random_downscale_boxes


def test_window_extents_tile_aligned():
    mh, mw = window_extents((207, 357))
    assert mh % 8 == 0 and mw % 128 == 0
    assert mh >= 207 + 8 and mw >= 357 + 128


@pytest.mark.parametrize("bundle_name", ["squarespace", "audio_book"])
def test_pallas_kernel_bit_exact_vs_xla_exact(bundle_name):
    bundle = load_bundle(f"data/{bundle_name}")
    arrays = bundle.to_arrays()
    H, W, B = 300, 400, 2
    rng = np.random.default_rng(7)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 90
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    # exercise the identity shortcut and an off-canvas drop
    boxes[0, 0] = [3, 5, 3 + arrays.obj_hw[0, 1], 5 + arrays.obj_hw[0, 0]]
    boxes[1, 0] = [-10, -10, -10 + arrays.obj_hw[0, 1], -10 + arrays.obj_hw[0, 0]]

    out = np.asarray(
        composite_batch_pallas_host_tables(canvases, objs, hw, boxes, interpret=True)
    )
    for b in range(B):
        ref = np.asarray(composite_exact(canvases[b], objs[b], hw[b], boxes[b]))
        assert np.array_equal(out[b], ref), f"canvas {b} diverged"


@pytest.mark.parametrize("bundle_name", ["squarespace", "audio_book"])
def test_packed_hybrid_matches_xla_traced_path(bundle_name):
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_hybrid_packed,
    )

    bundle = load_bundle(f"data/{bundle_name}")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 300, 400, 2
    rng = np.random.default_rng(11)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 70
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    boxes[0, 0] = [3, 5, 3 + arrays.obj_hw[0, 1], 5 + arrays.obj_hw[0, 0]]
    boxes[1, 0] = [-7, -7, -7 + arrays.obj_hw[0, 1], -7 + arrays.obj_hw[0, 0]]
    dev = tuple(
        jnp.asarray(x)
        for x in (canvases, objs, hw.astype(np.int32), boxes.astype(np.int32))
    )
    out = np.asarray(composite_batch_hybrid_packed(*dev, interpret=True))
    from image_transformation_tpu.ops.compose import composite_canvas

    ref = np.asarray(
        jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
    )
    assert np.array_equal(out, ref)


def test_packed_hybrid_pipelined_matches(tmp_path):
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose import composite_canvas
    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_hybrid_packed,
    )

    bundle = load_bundle("data/audio_book")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 280, 360, 3
    rng = np.random.default_rng(21)
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
    out = np.asarray(
        composite_batch_hybrid_packed(*dev, interpret=True, pipelined=True)
    )
    ref = np.asarray(
        jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
    )
    assert np.array_equal(out, ref)


def test_aligned_variant_matches(tmp_path):
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose import composite_canvas
    from image_transformation_tpu.ops.compose_pallas import composite_batch_aligned

    bundle = load_bundle("data/squarespace")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 300, 400, 2
    rng = np.random.default_rng(31)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    boxes[0, 0] = [3, 5, 3 + arrays.obj_hw[0, 1], 5 + arrays.obj_hw[0, 0]]
    dev = tuple(
        jnp.asarray(x)
        for x in (canvases, objs, hw.astype(np.int32), boxes.astype(np.int32))
    )
    out = np.asarray(composite_batch_aligned(*dev, interpret=True))
    ref = np.asarray(
        jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
    )
    assert np.array_equal(out, ref)
