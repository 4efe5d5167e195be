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


@pytest.fixture
def exact_traced_resample(monkeypatch):
    """Pin the traced-path resample to the bit-exact limb math.

    The production traced path uses the HIGHEST-precision f32 resample,
    whose reduction order differs between compiled programs (vmap vs scan)
    — so cross-PROGRAM comparisons can flip +-1 at rounding boundaries.
    The kernel-vs-XLA equality tests exist to pin the BLEND geometry
    bit-exactly, so they force the order-independent integer resample in
    both programs; test_hp_resample_close_to_limb covers the f32 envelope.
    """
    import jax

    from image_transformation_tpu.ops import resize as rz

    monkeypatch.setattr(rz, "resample_fixed_traced", rz.resample_fixed)
    # jitted producers cache executables by shape; pinned math must not be
    # shadowed by entries compiled with the hp resample (or vice versa)
    jax.clear_caches()
    yield
    jax.clear_caches()


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
def test_packed_hybrid_matches_xla_traced_path(bundle_name, exact_traced_resample):
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


def test_packed_hybrid_pipelined_matches(tmp_path, exact_traced_resample):
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


def test_aligned_variant_matches(tmp_path, exact_traced_resample):
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


@pytest.mark.parametrize("mode", [
    {"clamped": True},
    {"clamped": True, "pipelined": True},
    {"band": True},
    {"batchsrc": True},
    {"resident": True},
    {"rowbaked": True},
])
@pytest.mark.parametrize("bundle_name", ["squarespace", "audio_book"])
def test_clamped_packed_matches_xla_traced_path(bundle_name, mode, exact_traced_resample):
    """v2 clamped-window kernel: no one-window canvas pre-pad; boxes pinned
    at the right/bottom edges exercise the large-dy/dx clamping paths."""
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_hybrid_packed,
    )

    bundle = load_bundle(f"data/{bundle_name}")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 1080, 1920, 3
    rng = np.random.default_rng(13)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 70
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    # edge stress: object flush against the bottom-right corner (window
    # clamps, dy/dx become large), hanging off the right edge (wrap columns
    # must be cropped), off the bottom edge, and a negative-origin drop.
    oh0, ow0 = int(arrays.obj_hw[0, 0]), int(arrays.obj_hw[0, 1])
    boxes[0, 0] = [W - ow0, H - oh0, W, H]
    boxes[1, 0] = [W - ow0 // 2, H - oh0 // 2, W + ow0 // 2, H + oh0 // 2]
    boxes[2, 0] = [-3, 40, -3 + ow0, 40 + oh0]
    if boxes.shape[1] > 1:
        oh1, ow1 = int(arrays.obj_hw[1, 0]), int(arrays.obj_hw[1, 1])
        boxes[0, 1] = [W - ow1, 0, W, oh1]          # top-right corner
        boxes[1, 1] = [0, H - oh1, ow1, H]          # bottom-left corner
        boxes[2, 1] = [W - 1, H - 1, W - 1 + ow1, H - 1 + oh1]  # 1px visible
    dev = tuple(
        jnp.asarray(x)
        for x in (canvases, objs, hw.astype(np.int32), boxes.astype(np.int32))
    )
    out = np.asarray(composite_batch_hybrid_packed(*dev, interpret=True, **mode))
    from image_transformation_tpu.ops.compose import composite_canvas

    ref = np.asarray(
        jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
    )
    assert np.array_equal(out, ref)


def test_clamped_packed_tiny_canvas(exact_traced_resample):
    """Canvas smaller than one window: pads up to the window extent."""
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose import composite_canvas
    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_hybrid_packed,
    )

    bundle = load_bundle("data/audio_book")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 120, 200, 2
    rng = np.random.default_rng(5)
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
    out = np.asarray(composite_batch_hybrid_packed(*dev, interpret=True, clamped=True))
    ref = np.asarray(
        jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
    )
    assert np.array_equal(out, ref)
    out_rb = np.asarray(
        composite_batch_hybrid_packed(*dev, interpret=True, rowbaked=True)
    )
    assert np.array_equal(out_rb, ref)


def test_hp_resample_close_to_limb():
    """The HIGHEST-precision traced resample stays within +-2 of the exact
    limb path on COMPOSITED output (its f32 sums flip the final rounding
    only at exact >>22 boundaries; unpremultiply amplification at tiny
    alpha is re-weighted away by the blend)."""
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops import resize as rz
    from image_transformation_tpu.ops.compose import composite_canvas

    bundle = load_bundle("data/squarespace")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 300, 400, 4
    rng = np.random.default_rng(17)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 70
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

    def run():
        return np.asarray(
            jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
        )

    out_hp = run()
    real = rz.resample_fixed_traced
    rz.resample_fixed_traced = rz.resample_fixed
    try:
        jax.clear_caches()
        out_limb = run()
    finally:
        rz.resample_fixed_traced = real
        jax.clear_caches()
    diff = np.abs(out_hp.astype(int) - out_limb.astype(int))
    assert diff.max() <= 2, diff.max()


def test_packed_out_host_view_matches_u8_output():
    """packed_out=True returns the u32 plane whose HOST bytes view as the
    exact uint8 RGBA output."""
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_hybrid_packed,
        packed_to_u8_np,
    )

    bundle = load_bundle("data/squarespace")
    arrays = bundle.to_arrays()
    H, W, B = 296, 512, 2
    rng = np.random.default_rng(41)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 40
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    def dev():
        return tuple(
            jnp.asarray(x)
            for x in (canvases, objs, hw.astype(np.int32), boxes.astype(np.int32))
        )

    u8 = np.asarray(
        composite_batch_hybrid_packed(*dev(), interpret=True, clamped=True)
    )
    packed = np.asarray(
        composite_batch_hybrid_packed(
            *dev(), interpret=True, clamped=True, packed_out=True
        )
    )
    assert packed.dtype == np.int32 and packed.shape == (B, H, W)
    assert np.array_equal(packed_to_u8_np(packed), u8)


def test_packed_out_rejected_on_unsupported_variants():
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_hybrid_packed,
    )

    args = (jnp.zeros((1, 64, 128, 4), jnp.uint8),
            jnp.zeros((1, 1, 16, 16, 4), jnp.uint8),
            jnp.zeros((1, 1, 2), jnp.int32),
            jnp.zeros((1, 1, 4), jnp.int32))
    with pytest.raises(ValueError):
        composite_batch_hybrid_packed(
            *args, interpret=True, clamped=True, pipelined=True, packed_out=True
        )
    with pytest.raises(ValueError):
        composite_batch_hybrid_packed(
            *args, interpret=True, rowbaked=True, packed_out=True
        )
    with pytest.raises(ValueError):
        composite_batch_hybrid_packed(*args, interpret=True, packed_out=True)


@pytest.mark.parametrize("bundle_name", ["squarespace", "audio_book"])
def test_fused_v2_matches_exact_xla_path(bundle_name, exact_traced_resample):
    """Gen-2 fused resample+blend kernel (grid-(B,N)): bit-equal to the XLA
    path under the exact limb resample, incl. edge-pinned boxes."""
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose import composite_canvas
    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_fused_v2,
        packed_to_u8_np,
    )

    bundle = load_bundle(f"data/{bundle_name}")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 600, 1024, 2
    rng = np.random.default_rng(57)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 90
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    oh0, ow0 = int(arrays.obj_hw[0, 0]), int(arrays.obj_hw[0, 1])
    boxes[0, 0] = [W - ow0, H - oh0, W, H]           # identity at the corner
    boxes[1, 0] = [W - ow0 // 2, H - 5, W + ow0 // 2, H - 5 + oh0]  # hangs off
    dev = tuple(
        jnp.asarray(x)
        for x in (canvases, objs, hw.astype(np.int32), boxes.astype(np.int32))
    )
    out = np.asarray(composite_batch_fused_v2(*dev, interpret=True))
    ref = np.asarray(
        jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
    )
    assert np.array_equal(out, ref)
    packed = np.asarray(
        composite_batch_fused_v2(*dev, interpret=True, packed_out=True)
    )
    assert np.array_equal(packed_to_u8_np(packed), ref)


def test_fused_v3_out_of_envelope_box_degrades_gracefully():
    """A box larger than out_max must not corrupt other objects: boxes
    are traced VLM data, and the chunked resample stores ceil(out/128)
    chunks into envelope-sized VMEM scratch — the meta clamps target
    sizes to the envelope (a cropped-scale render, like gen-2's graceful
    crop) instead of writing past the scratch."""
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_fused_v3,
    )

    H, W, B, n = 256, 384, 1, 2
    pad_h, pad_w = 16, 24
    rng = np.random.default_rng(7)
    objs = np.zeros((B, n, pad_h, pad_w, 4), np.uint8)
    objs[..., :3] = rng.integers(0, 256, (B, n, pad_h, pad_w, 3))
    objs[..., 3] = 255
    hw = np.full((B, n, 2), (pad_h, pad_w), np.int32)
    boxes = np.zeros((B, n, 4), np.int32)
    boxes[0, 0] = [0, 0, 200, 200]  # upscale FAR beyond the envelope
    boxes[0, 1] = [300, 200, 300 + pad_w, 200 + pad_h]  # identity, disjoint
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., 3] = 255

    dev = tuple(jnp.asarray(x) for x in (canvases, objs, hw, boxes))
    out = np.asarray(composite_batch_fused_v3(*dev, interpret=True))

    # the in-envelope identity object renders exactly (opaque alpha)
    assert np.array_equal(out[0, 200:200 + pad_h, 300:300 + pad_w], objs[0, 1])
    # the oversized box renders SOMETHING at its origin (clamped scale)...
    assert (out[0, :16, :24, :3] != 0).any()
    # ...but nothing beyond the envelope cap inside the requested box,
    # and the rest of the canvas stays background
    assert (out[0, 140:200, :200, :3] == 0).all()
    assert (out[0, :, 340:, :3] == 0).all()


@pytest.mark.parametrize("bundle_name", ["squarespace", "audio_book"])
def test_fused_v3_in_kernel_tables(bundle_name, exact_traced_resample):
    """Gen-3 fused kernel (tables built in-kernel from per-object scalars):
    bit-equal to gen-2 in interpret mode (the jnp table math coincides with
    build_coeffs_traced on CPU), within the traced envelope (+-1) of the
    XLA path, and the packed-canvas input convention returns the same
    pixels as the u8 NHWC input."""
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose import composite_canvas
    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_fused_v2,
        composite_batch_fused_v3,
        packed_to_u8_np,
    )

    bundle = load_bundle(f"data/{bundle_name}")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 600, 1024, 2
    rng = np.random.default_rng(91)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 90
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    oh0, ow0 = int(arrays.obj_hw[0, 0]), int(arrays.obj_hw[0, 1])
    boxes[0, 0] = [W - ow0, H - oh0, W, H]           # identity at the corner
    boxes[1, 0] = [W - ow0 // 2, H - 5, W + ow0 // 2, H - 5 + oh0]  # hangs off
    dev = tuple(
        jnp.asarray(x)
        for x in (canvases, objs, hw.astype(np.int32), boxes.astype(np.int32))
    )
    v3 = np.asarray(composite_batch_fused_v3(*dev, interpret=True))
    v2 = np.asarray(composite_batch_fused_v2(*dev, interpret=True))
    assert np.array_equal(v3, v2)
    ref = np.asarray(
        jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
    )
    assert np.abs(v3.astype(int) - ref.astype(int)).max() <= 1
    # engine-style packed-u32 canvas input: same pixels, no repack pass
    cv = jnp.asarray(canvases.view(np.uint32).reshape(B, H, W).astype(np.int32))
    v3p = np.asarray(
        composite_batch_fused_v3(cv, *dev[1:], interpret=True, packed_out=True)
    )
    assert np.array_equal(packed_to_u8_np(v3p), v3)
    # pre-planarized object assets + double-buffered variant: same pixels
    from image_transformation_tpu.ops.compose_pallas import planarize_objects

    op = planarize_objects(dev[1])
    v3pl = np.asarray(
        composite_batch_fused_v3(dev[0], op, *dev[2:], interpret=True)
    )
    assert np.array_equal(v3pl, v3)
    v3pipe = np.asarray(
        composite_batch_fused_v3(*dev, interpret=True, pipelined=True)
    )
    assert np.array_equal(v3pipe, v3)
    # on-device solid-background fill + padded output (host view-crop):
    # matches compositing onto an uploaded canvas of the same color
    filled = np.zeros((B, H, W, 4), np.uint8)
    filled[..., :3] = 40
    filled[..., 3] = 255
    ref_fill = np.asarray(
        composite_batch_fused_v3(jnp.asarray(filled), *dev[1:], interpret=True)
    )
    full = np.asarray(
        composite_batch_fused_v3(
            None, op, *dev[2:], interpret=True, packed_out=True,
            padded_out=True, bg_rgba=(40, 40, 40, 255), canvas_hw=(H, W),
        )
    )
    assert np.array_equal(packed_to_u8_np(full)[:, :H, :W], ref_fill)
    # fill path + SHARED object tensor (STATUS item 24): [1, N, ...]
    # objects against B-batch boxes must render B canvases identical to
    # the copied form — the canvas batch sizes from BOXES, not objs
    same_objs = np.array_equal(np.asarray(op[0]), np.asarray(op[1]))
    op_sh = op[:1] if same_objs else jnp.broadcast_to(op[:1], op.shape)[:1]
    ref_sh = np.asarray(
        composite_batch_fused_v3(
            None, jnp.broadcast_to(op_sh, op.shape), *dev[2:],
            interpret=True, packed_out=True, padded_out=True,
            bg_rgba=(40, 40, 40, 255), canvas_hw=(H, W),
        )
    )
    full_sh = np.asarray(
        composite_batch_fused_v3(
            None, op_sh, *dev[2:], interpret=True, packed_out=True,
            padded_out=True, bg_rgba=(40, 40, 40, 255), canvas_hw=(H, W),
        )
    )
    assert full_sh.shape[0] == B
    assert np.array_equal(full_sh, ref_sh)
    # single-program renderer (the bench headline path): same pixels
    from image_transformation_tpu.ops.compose_pallas import (
        pack_rgba_scalar,
        render_solid_fused_v3_program,
    )

    single = np.asarray(
        jax.jit(
            lambda o, h_, b: render_solid_fused_v3_program(
                o, h_, b, (H, W), pack_rgba_scalar((40, 40, 40, 255)),
                interpret=True,
            )
        )(op, *dev[2:])
    )
    assert np.array_equal(single, full)
    # per-object static-size specialization (STATUS item 19): exact sizes
    # AND a loose upper-bound cover must both be bitwise-identical to the
    # generic path (dropped rows/cols carry zero coefficients or pixels)
    exact_hw = tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)
    loose_hw = tuple((h + 5, w + 13) for h, w in exact_hw)
    for s in (exact_hw, loose_hw):
        v3s = np.asarray(
            composite_batch_fused_v3(
                dev[0], op, *dev[2:], interpret=True, static_obj_hw=s
            )
        )
        assert np.array_equal(v3s, v3)


@pytest.mark.parametrize("bundle_name", ["squarespace", "audio_book"])
def test_fused_v3_all_identity_bit_exact(bundle_name):
    """All-identity batches (every object placed at native size — the
    serving default-layout and agentic no-scaling workloads) take the
    gen-3 kernel's identity branch, which has NO resample at all: the
    output must be BIT-EXACT vs the exact XLA path, not just within the
    traced envelope. Measured 1.82x on v5e (STATUS item 15)."""
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_fused_v3,
    )

    bundle = load_bundle(f"data/{bundle_name}")
    arrays = bundle.to_arrays()
    H, W, B = 700, 1100, 2
    rng = np.random.default_rng(31)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 77
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.zeros((B, arrays.obj_hw.shape[0], 4), np.int32)
    for b in range(B):
        for k in range(arrays.obj_hw.shape[0]):
            oh, ow = int(arrays.obj_hw[k, 0]), int(arrays.obj_hw[k, 1])
            x1 = int(rng.integers(0, max(1, W - ow)))
            y1 = int(rng.integers(0, max(1, H - oh)))
            boxes[b, k] = (x1, y1, x1 + ow, y1 + oh)
    dev = tuple(
        jnp.asarray(x)
        for x in (canvases, objs, hw.astype(np.int32), boxes)
    )
    v3 = np.asarray(composite_batch_fused_v3(*dev, interpret=True))
    for b in range(B):
        ref = np.asarray(composite_exact(
            dev[0][b], dev[1][b], arrays.obj_hw, boxes[b].tolist()
        ))
        assert np.array_equal(v3[b], ref)


@pytest.mark.parametrize("horizontal", [True, False])
def test_fused_v3_gradient_render(horizontal, exact_traced_resample):
    """Gradient-background renderer: the in-program ramp must equal
    ops.background.gradient_canvas on the cropped region and the composite
    must match rendering onto that canvas via the v3 kernel."""
    import jax.numpy as jnp

    from image_transformation_tpu.ops.background import gradient_canvas
    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_fused_v3,
        packed_to_u8_np,
        planarize_objects,
        render_gradient_fused_v3_program,
    )

    bundle = load_bundle("data/audio_book")
    arrays = bundle.to_arrays()
    H, W, B = 300, 512, 2
    rng = np.random.default_rng(77)
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    c1 = np.array([[200, 30, 40], [10, 220, 30]], np.uint8)
    c2 = np.array([[20, 40, 230], [240, 240, 10]], np.uint8)
    op = planarize_objects(jnp.asarray(objs))
    hw_d = jnp.asarray(hw.astype(np.int32))
    boxes_d = jnp.asarray(boxes.astype(np.int32))
    out = np.asarray(
        render_gradient_fused_v3_program(
            op, hw_d, boxes_d, (H, W), jnp.asarray(c1), jnp.asarray(c2),
            horizontal, interpret=True,
        )
    )
    got = packed_to_u8_np(out)[:, :H, :W]
    refs = []
    for b in range(B):
        canvas = np.asarray(
            gradient_canvas(jnp.asarray(c1[b]), jnp.asarray(c2[b]), H, W,
                            horizontal)
        )
        refs.append(canvas)
    ref = np.asarray(
        composite_batch_fused_v3(
            jnp.asarray(np.stack(refs)), op, hw_d, boxes_d, interpret=True
        )
    )
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("bundle_name", ["squarespace", "audio_book"])
def test_fused_v2_host_tables_bit_exact(bundle_name):
    """The gen-2 kernel fed Pillow-exact host tables must reproduce the
    exact XLA path (and therefore PIL) bit-for-bit — for both u8 NHWC and
    pre-planarized object inputs (interpret mode)."""
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_fused_v2_host_tables,
        planarize_objects,
    )

    bundle = load_bundle(f"data/{bundle_name}")
    arrays = bundle.to_arrays()
    H, W, B = 400, 640, 2
    rng = np.random.default_rng(41)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 90
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    oh0, ow0 = int(arrays.obj_hw[0, 0]), int(arrays.obj_hw[0, 1])
    boxes[0, 0] = [W - ow0, H - oh0, W, H]           # identity at the corner
    boxes[1, 0] = [W - ow0 // 2, H - 5, W + ow0 // 2, H - 5 + oh0]  # hangs off
    out = np.asarray(
        composite_batch_fused_v2_host_tables(
            jnp.asarray(canvases), jnp.asarray(objs), hw, boxes, interpret=True
        )
    )
    op = planarize_objects(jnp.asarray(objs))
    out_p = np.asarray(
        composite_batch_fused_v2_host_tables(
            jnp.asarray(canvases), op, hw, boxes, interpret=True
        )
    )
    for b in range(B):
        ref = np.asarray(composite_exact(canvases[b], objs[b], hw[b], boxes[b]))
        assert np.array_equal(out[b], ref), f"canvas {b} diverged"
        assert np.array_equal(out_p[b], ref), f"planar canvas {b} diverged"


def test_compose_engine_auto_kernel_falls_back():
    """ComposeEngine(kernel='auto') — the opt-in fused exact path — on a
    Mosaic-less backend latches the XLA indexed path loudly and stays
    bit-identical to the default kernel='xla'."""
    from image_transformation_tpu.layout.flex import solve_flex
    from image_transformation_tpu.pipeline import engine as engine_mod
    from image_transformation_tpu.pipeline.engine import ComposeEngine

    bundle = load_bundle("data/squarespace")
    arrays = bundle.to_arrays()
    canvas = np.zeros((300, 300, 4), np.uint8)
    canvas[..., :3] = 77
    canvas[..., 3] = 255
    root = {
        "type": "flex", "direction": "column",
        "children": [
            {"object_id": oid, "name": bundle.meta[oid].label}
            for oid in bundle.object_ids()
        ],
    }
    placements = solve_flex(root, (300, 300), bundle.sizes())
    prior = engine_mod._FUSED_DISABLED[0]
    try:
        engine_mod._FUSED_DISABLED[0] = False
        auto = ComposeEngine(arrays, canvas, kernel="auto")
        out_auto = np.asarray(auto.compose(placements))
        xla = ComposeEngine(arrays, canvas, kernel="xla")
        out_xla = np.asarray(xla.compose(placements))
        assert np.array_equal(out_auto, out_xla)
    finally:
        engine_mod._FUSED_DISABLED[0] = prior


def test_fused_v3_fuzz_geometries(exact_traced_resample):
    """Randomized box-geometry fuzz for the gen-3 kernel: random canvas
    sizes and placements including degenerate (1px), identity-size,
    edge-hanging, and fully off-canvas boxes — must match the XLA path
    (exact resample pinned) bit-for-bit in interpret mode."""
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose import composite_canvas
    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_fused_v3,
    )

    bundle = load_bundle("data/audio_book")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    rng = np.random.default_rng(123)
    n = arrays.objects.shape[0]
    for trial in range(4):
        H = int(rng.integers(40, 700))
        W = int(rng.integers(130, 1100))
        B = 2
        canvases = rng.integers(0, 256, (B, H, W, 4), dtype=np.uint8)
        canvases[..., 3] = 255
        objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
        hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
        boxes = np.zeros((B, n, 4), np.int32)
        for b in range(B):
            for k in range(n):
                oh, ow = int(hw[b, k, 0]), int(hw[b, k, 1])
                mode = rng.integers(0, 5)
                if mode == 0:  # degenerate 1px box
                    x1, y1 = int(rng.integers(0, W)), int(rng.integers(0, H))
                    boxes[b, k] = (x1, y1, x1 + 1, y1 + 1)
                elif mode == 1:  # identity size, possibly hanging off
                    x1 = int(rng.integers(0, max(1, W - 5)))
                    y1 = int(rng.integers(0, max(1, H - 5)))
                    boxes[b, k] = (x1, y1, x1 + ow, y1 + oh)
                elif mode == 2:  # fully off-canvas (dropped)
                    boxes[b, k] = (-ow, -oh, 0, 0)
                else:  # random downscale, may hang off right/bottom
                    s = float(rng.uniform(0.2, 1.0))
                    w = max(1, min(int(ow * s), W))
                    h = max(1, min(int(oh * s), H))
                    x1 = int(rng.integers(0, W))
                    y1 = int(rng.integers(0, H))
                    boxes[b, k] = (x1, y1, x1 + w, y1 + h)
        dev = tuple(
            jnp.asarray(x)
            for x in (canvases, objs, hw.astype(np.int32), boxes)
        )
        out = np.asarray(composite_batch_fused_v3(*dev, interpret=True))
        ref = np.asarray(
            jax.vmap(lambda c, o, h_, b: composite_canvas(c, o, h_, b, pad))(*dev)
        )
        assert np.array_equal(out, ref), f"trial {trial} ({W}x{H}) diverged"


def test_fused_v3_framebuffer_reuse():
    """Framebuffer-reuse render (STATUS item 20): restoring only the
    windows the previous render touched on the donated plane, then
    composing new boxes, must be bitwise identical to a fresh full-fill
    render — across a multi-generation chain (including returning to the
    first box set, which proves the restore erases every touched pixel)."""
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose_pallas import (
        pack_rgba_scalar,
        planarize_objects,
        render_solid_fused_v3_program,
        render_solid_fused_v3_reuse_program,
    )

    rng = np.random.default_rng(5)
    B, N, ph, pw = 2, 3, 24, 140
    objs = rng.integers(0, 256, (B, N, ph, pw, 4), dtype=np.uint8)
    hw_row = np.array([[24, 140], [9, 17], [16, 130]], np.int32)
    for k in range(N):
        h, w = hw_row[k]
        objs[:, k, h:] = 0
        objs[:, k, :, w:] = 0
    hw = jnp.asarray(np.broadcast_to(hw_row, (B, N, 2)).copy())
    Hc, Wc = 64, 200

    def rboxes(seed):
        r = np.random.default_rng(seed)
        bx = np.zeros((B, N, 4), np.int32)
        for b in range(B):
            for k in range(N):
                h, w = hw_row[k]
                s = r.uniform(0.4, 1.0)
                w2, h2 = min(max(1, int(w * s)), Wc), min(max(1, int(h * s)), Hc)
                x1 = r.integers(0, Wc - w2 + 1)
                y1 = r.integers(0, Hc - h2 + 1)
                bx[b, k] = (x1, y1, x1 + w2, y1 + h2)
        return jnp.asarray(bx)

    b1, b2 = rboxes(1), rboxes(2)
    op = planarize_objects(jnp.asarray(objs))
    bg = pack_rgba_scalar((50, 60, 70, 255))
    first = render_solid_fused_v3_program(op, hw, b1, (Hc, Wc), bg, interpret=True)
    reused = render_solid_fused_v3_reuse_program(
        first, b1, op, hw, b2, (Hc, Wc), bg, interpret=True
    )
    fresh = render_solid_fused_v3_program(op, hw, b2, (Hc, Wc), bg, interpret=True)
    assert np.array_equal(np.asarray(reused), np.asarray(fresh))
    third = render_solid_fused_v3_reuse_program(
        reused, b2, op, hw, b1, (Hc, Wc), bg, interpret=True
    )
    assert np.array_equal(np.asarray(third), np.asarray(first))

    # Per-object static restore windows (STATUS item 22): same chain, DMAs
    # sized to each object's own extents, must stay bitwise identical —
    # including boxes clamped against the bottom/right canvas edges (the
    # per-object origin re-clamp path).
    static_hw = tuple((int(h), int(w)) for h, w in hw_row)
    edge = np.zeros((B, N, 4), np.int32)
    for b in range(B):
        for k in range(N):
            h, w = int(hw_row[k][0]), int(hw_row[k][1])
            w2, h2 = min(w, Wc), min(h, Hc)
            edge[b, k] = (Wc - w2, Hc - h2, Wc, Hc)
    edge = jnp.asarray(edge)
    first_s = render_solid_fused_v3_program(
        op, hw, edge, (Hc, Wc), bg, interpret=True, static_obj_hw=static_hw
    )
    reused_s = render_solid_fused_v3_reuse_program(
        first_s, edge, op, hw, b2, (Hc, Wc), bg, interpret=True,
        static_obj_hw=static_hw,
    )
    fresh_s = render_solid_fused_v3_program(
        op, hw, b2, (Hc, Wc), bg, interpret=True, static_obj_hw=static_hw
    )
    assert np.array_equal(np.asarray(reused_s), np.asarray(fresh_s))
    back_s = render_solid_fused_v3_reuse_program(
        reused_s, b2, op, hw, edge, (Hc, Wc), bg, interpret=True,
        static_obj_hw=static_hw,
    )
    assert np.array_equal(np.asarray(back_s), np.asarray(first_s))

    # SHARED OBJECT TENSOR (STATUS item 24): a [1, N, ...] planar tensor
    # against B-batch boxes must produce bitwise-identical planes to B
    # materialized copies of the same assets — for the grid kernel, the
    # pipelined kernel (one object DMA per grid step), and through a
    # reuse chain. (This test's per-row objects differ, so the copied
    # reference broadcasts row 0.)
    op1 = op[:1]
    op_b = jnp.broadcast_to(op1, op.shape)
    for pl_flag in (False, True):
        ref_first = render_solid_fused_v3_program(
            op_b, hw, b1, (Hc, Wc), bg, interpret=True,
            static_obj_hw=static_hw, pipelined=pl_flag,
        )
        first_sh = render_solid_fused_v3_program(
            op1, hw, b1, (Hc, Wc), bg, interpret=True,
            static_obj_hw=static_hw, pipelined=pl_flag,
        )
        assert np.array_equal(np.asarray(first_sh), np.asarray(ref_first))
        ref_reused = render_solid_fused_v3_reuse_program(
            ref_first, b1, op_b, hw, b2, (Hc, Wc), bg, interpret=True,
            static_obj_hw=static_hw, pipelined=pl_flag,
        )
        reused_sh = render_solid_fused_v3_reuse_program(
            first_sh, b1, op1, hw, b2, (Hc, Wc), bg, interpret=True,
            static_obj_hw=static_hw, pipelined=pl_flag,
        )
        assert np.array_equal(np.asarray(reused_sh), np.asarray(ref_reused))

    # THE PRODUCTION CONFIGURATION (bench.py headline + sweep default):
    # pipelined double-buffered kernel + per-object static sizes + reuse
    # chain. Must match the non-pipelined grid-(B,N) results bitwise —
    # this is the path CI green must actually cover.
    for s in (None, static_hw):
        first_p = render_solid_fused_v3_program(
            op, hw, b1, (Hc, Wc), bg, interpret=True, static_obj_hw=s,
            pipelined=True,
        )
        assert np.array_equal(np.asarray(first_p), np.asarray(first))
        reused_p = render_solid_fused_v3_reuse_program(
            first_p, b1, op, hw, b2, (Hc, Wc), bg, interpret=True,
            static_obj_hw=s, pipelined=True,
        )
        assert np.array_equal(np.asarray(reused_p), np.asarray(fresh))
        back_p = render_solid_fused_v3_reuse_program(
            reused_p, b2, op, hw, edge, (Hc, Wc), bg, interpret=True,
            static_obj_hw=s, pipelined=True,
        )
        assert np.array_equal(np.asarray(back_p), np.asarray(first_s))


def test_limb_dot_i8_exact_vs_bf16():
    """STATUS item 27: the s8 MXU limb dot (re-centered limbs/pixels +
    integer correction terms) is bit-equal to the bf16 3-limb dot and an
    int64 oracle on PIL-mass tables (per-row L1 ~ 2^22), both operand
    orders."""
    import jax.numpy as jnp

    from image_transformation_tpu.ops.compose_pallas import (
        _center_img_s8,
        _limb_dot,
        _limb_dot_i8,
    )

    rng = np.random.default_rng(7)
    for _ in range(12):
        M = int(rng.integers(1, 200))
        K = int(rng.integers(2, 256))
        N = int(rng.integers(1, 160))
        k = rng.integers(-(1 << 22), 1 << 22, (N, K)).astype(np.float64)
        k[rng.random((N, K)) < 0.5] = 0
        l1 = np.abs(k).sum(axis=1, keepdims=True)
        l1[l1 == 0] = 1
        k = np.round(k / l1 * (1 << 22)).astype(np.int64)
        img = rng.integers(0, 256, (K, M))
        k_j = jnp.asarray(k, jnp.int32)
        img_bf = jnp.asarray(img, jnp.bfloat16)
        img_i8 = _center_img_s8(jnp.asarray(img, jnp.int32))
        for k_first in (True, False):
            ref = np.asarray(_limb_dot(img_bf, k_j, 0, 1, k_first=k_first))
            got = np.asarray(_limb_dot_i8(img_i8, k_j, 0, 1, k_first=k_first))
            oracle = (k @ img.astype(np.int64) if k_first
                      else img.astype(np.int64).T @ k.T)
            assert np.array_equal(ref.astype(np.int64), oracle)
            assert np.array_equal(got, ref)

    # Large-K contractions (ADVICE r3): the kernels contract PADDED object
    # extents (pw_k >= 1024), where the mod-2^32 wrap argument for the s8
    # correction terms (128*colsum + 128^2*K over the FULL padded axis)
    # carries the most weight. Real coeff rows are window-sparse (a
    # Lanczos window touches <= ~64 columns), so pin K in 1024-2048 with
    # windowed rows directly against the i64 oracle.
    for K in (1024, 1361, 2048):
        M = int(rng.integers(32, 160))
        N = int(rng.integers(16, 128))
        k = np.zeros((N, K), np.float64)
        for row in range(N):
            width = int(rng.integers(1, 64))
            start = int(rng.integers(0, K - width))
            k[row, start : start + width] = rng.integers(
                -(1 << 22), 1 << 22, width
            )
        l1 = np.abs(k).sum(axis=1, keepdims=True)
        l1[l1 == 0] = 1
        k = np.round(k / l1 * (1 << 22)).astype(np.int64)
        img = rng.integers(0, 256, (K, M))
        k_j = jnp.asarray(k, jnp.int32)
        img_i8 = _center_img_s8(jnp.asarray(img, jnp.int32))
        for k_first in (True, False):
            got = np.asarray(_limb_dot_i8(img_i8, k_j, 0, 1, k_first=k_first))
            oracle = (k @ img.astype(np.int64) if k_first
                      else img.astype(np.int64).T @ k.T)
            assert np.array_equal(got.astype(np.int64), oracle), K


def test_fused_v3_int8_dots_bit_exact(monkeypatch, exact_traced_resample):
    """The INT8_DOTS switch routes the gen-3 chunked resample through s8
    MXU dots; renders must be bitwise identical to the bf16 path across
    scaled, identity, and edge-hanging geometries (pipelined included).

    CACHE DISCIPLINE: the flag is a module global the jitted wrappers
    close over, NOT part of their cache key — flipping it after a
    same-shape compile silently serves the STALE executable (verified:
    zero retraces on the flip), which made the original form of this
    test vacuous. Every flip must clear the jit caches."""
    import jax
    import jax.numpy as jnp

    import image_transformation_tpu.ops.compose_pallas as cp

    bundle = load_bundle("data/squarespace")
    arrays = bundle.to_arrays()
    H, W, B = 600, 1024, 2
    rng = np.random.default_rng(23)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 90
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    oh0, ow0 = int(arrays.obj_hw[0, 0]), int(arrays.obj_hw[0, 1])
    boxes[0, 0] = [W - ow0, H - oh0, W, H]  # identity-size at the corner
    boxes[1, 0] = [W - ow0 // 2, H - 5, W + ow0 // 2, H - 5 + oh0]  # hangs
    dev = tuple(
        jnp.asarray(x)
        for x in (canvases, objs, hw.astype(np.int32), boxes.astype(np.int32))
    )
    monkeypatch.setattr(cp, "INT8_DOTS", False)  # bf16 reference path
    jax.clear_caches()
    ref = np.asarray(cp.composite_batch_fused_v3(*dev, interpret=True))
    ref_pipe = np.asarray(
        cp.composite_batch_fused_v3(*dev, interpret=True, pipelined=True)
    )
    assert np.array_equal(ref_pipe, ref)
    monkeypatch.setattr(cp, "INT8_DOTS", True)  # s8 path (the default)
    jax.clear_caches()
    got = np.asarray(cp.composite_batch_fused_v3(*dev, interpret=True))
    got_pipe = np.asarray(
        cp.composite_batch_fused_v3(*dev, interpret=True, pipelined=True)
    )
    assert np.array_equal(got, ref)
    assert np.array_equal(got_pipe, ref)

    # SHARED-OBJECT pipelined path: the hoisted premultiply scratch is
    # stored centered-s8 under the flag (STATUS item 28) — must stay
    # bitwise identical to the bf16-scratch form across the flag flip
    op1 = cp.planarize_objects(dev[1])[:1]
    hw1 = dev[2]
    bg = cp.pack_rgba_scalar((50, 60, 70, 255))
    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(cp, "INT8_DOTS", flag)
        jax.clear_caches()
        outs[flag] = np.asarray(cp.render_solid_fused_v3_program(
            op1, hw1, dev[3], (H, W), bg, interpret=True, pipelined=True,
        ))
    assert np.array_equal(outs[True], outs[False])


def test_static_windows_parity(monkeypatch):
    """Per-object static window DMAs (STATUS item 30): sizing the
    pipelined render kernel's window copies to each object's own extents
    (with per-object origin caps in the meta) must be bitwise identical
    to the batch-max-window kernel — across downscales, identity
    placements, edge-clamped and off-canvas boxes, shared objects, and a
    framebuffer-reuse chain."""
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops import compose_pallas as cp

    rng = np.random.default_rng(30)
    Hc, Wc = 64, 200
    B, N = 3, 3
    hw_row = np.array([[24, 140], [9, 17], [16, 130]], np.int32)
    ph, pw = int(hw_row[:, 0].max()), int(hw_row[:, 1].max())
    objs = rng.integers(0, 256, (1, N, ph, pw, 4), dtype=np.uint8)
    for k in range(N):
        h, w = hw_row[k]
        objs[:, k, h:] = 0
        objs[:, k, :, w:] = 0
    hw = jnp.asarray(np.broadcast_to(hw_row, (B, N, 2)).copy())
    static_hw = tuple((int(h), int(w)) for h, w in hw_row)
    op = cp.planarize_objects(jnp.asarray(objs))
    bg = cp.pack_rgba_scalar((50, 60, 70, 255))

    def rboxes(seed):
        r = np.random.default_rng(seed)
        bx = np.zeros((B, N, 4), np.int32)
        for b in range(B):
            for k in range(N):
                h, w = int(hw_row[k][0]), int(hw_row[k][1])
                mode = r.integers(0, 4)
                if mode == 0:  # identity size, may hang off bottom/right
                    x1 = int(r.integers(0, Wc - 2))
                    y1 = int(r.integers(0, Hc - 2))
                    bx[b, k] = (x1, y1, x1 + w, y1 + h)
                elif mode == 1:  # fully off-canvas (dropped)
                    bx[b, k] = (-w, -h, 0, 0)
                elif mode == 2:  # edge-clamped corner placement
                    w2, h2 = min(w, Wc), min(h, Hc)
                    bx[b, k] = (Wc - w2, Hc - h2, Wc, Hc)
                else:  # random downscale anywhere
                    s = float(r.uniform(0.2, 1.0))
                    w2 = max(1, int(w * s))
                    h2 = max(1, int(h * s))
                    x1 = int(r.integers(0, Wc))
                    y1 = int(r.integers(0, Hc))
                    bx[b, k] = (x1, y1, x1 + w2, y1 + h2)
        return jnp.asarray(bx)

    for trial in range(3):
        bx = rboxes(trial)
        base = np.asarray(cp.render_solid_fused_v3_program(
            op, hw, bx, (Hc, Wc), bg, interpret=True, pipelined=True,
            static_obj_hw=static_hw, static_windows=False,
        ))
        got = np.asarray(cp.render_solid_fused_v3_program(
            op, hw, bx, (Hc, Wc), bg, interpret=True, pipelined=True,
            static_obj_hw=static_hw, static_windows=True,
        ))
        assert np.array_equal(got, base), f"trial {trial} diverged"

    # reuse chain: static-window renders restore/compose on the donated
    # plane bitwise-identically to a fresh batch-max-window render
    b1, b2 = rboxes(10), rboxes(11)
    first = cp.render_solid_fused_v3_program(
        op, hw, b1, (Hc, Wc), bg, interpret=True, pipelined=True,
        static_obj_hw=static_hw, static_windows=True,
    )
    reused = cp.render_solid_fused_v3_reuse_program(
        first, b1, op, hw, b2, (Hc, Wc), bg, interpret=True,
        pipelined=True, static_obj_hw=static_hw, static_windows=True,
    )
    fresh = cp.render_solid_fused_v3_program(
        op, hw, b2, (Hc, Wc), bg, interpret=True, pipelined=True,
        static_obj_hw=static_hw, static_windows=False,
    )
    assert np.array_equal(np.asarray(reused), np.asarray(fresh))

    # composite_batch_fused_v3 surface: same parity through the producer
    # path (meta built by _fused_v3_producer_fill with per-object caps)
    out_sw = np.asarray(cp.composite_batch_fused_v3(
        None, op, hw, b2, bg_rgba=(50, 60, 70, 255), canvas_hw=(Hc, Wc),
        interpret=True, pipelined=True, static_obj_hw=static_hw,
        static_windows=True,
    ))
    out_bm = np.asarray(cp.composite_batch_fused_v3(
        None, op, hw, b2, bg_rgba=(50, 60, 70, 255), canvas_hw=(Hc, Wc),
        interpret=True, pipelined=True, static_obj_hw=static_hw,
        static_windows=False,
    ))
    assert np.array_equal(out_sw, out_bm)

    # the impl refuses static windows without the pipelined walk or the
    # static-size contract (no per-object extents to derive from); the
    # public surfaces gate the flag, so only a direct call can mispair
    import pytest

    mh_a = ((ph + 7) // 8) * 8
    mw_a = ((pw + 127) // 128) * 128
    plane = jnp.zeros((B, 64, 256), jnp.int32)
    meta = jnp.zeros((B, N, 10), jnp.int32)
    for pipe, st in ((False, static_hw), (True, None)):
        with pytest.raises(ValueError, match="static_windows requires"):
            cp._pallas_fused_v3_impl(
                plane, op, meta, (Hc, Wc), (mh_a, mw_a), "lanczos",
                True, pipe, st, True,
            )

def test_pipeline_tables_parity(monkeypatch):
    """Cross-chunk table prefetch (STATUS item 35): software-pipelining
    the in-kernel coeff-table builds against the MXU dots (next chunk's
    table built before this chunk's dot, carried through the fori loop)
    must be bitwise identical to the in-order kernel — across downscales,
    identity placements, edge-clamped and off-canvas boxes, on both the
    shared-object solid render and the per-canvas batch surface, under
    both dot paths (s8 and bf16).

    CACHE DISCIPLINE (same as the INT8 flip test): the flag is a module
    global the jitted wrappers close over — every flip clears the jit
    caches or the stale executable silently serves."""
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.ops import compose_pallas as cp

    rng = np.random.default_rng(35)
    Hc, Wc = 64, 200
    B, N = 3, 3
    # >128-wide and >128-tall objects so ch_w/ch_h exceed 1 and the
    # carried-table path actually pipelines across chunks
    hw_row = np.array([[24, 140], [9, 17], [16, 130]], np.int32)
    ph, pw = int(hw_row[:, 0].max()), int(hw_row[:, 1].max())
    objs = rng.integers(0, 256, (1, N, ph, pw, 4), dtype=np.uint8)
    for k in range(N):
        h, w = hw_row[k]
        objs[:, k, h:] = 0
        objs[:, k, :, w:] = 0
    hw = jnp.asarray(np.broadcast_to(hw_row, (B, N, 2)).copy())
    static_hw = tuple((int(h), int(w)) for h, w in hw_row)
    op = cp.planarize_objects(jnp.asarray(objs))
    bg = cp.pack_rgba_scalar((50, 60, 70, 255))

    def rboxes(seed):
        r = np.random.default_rng(seed)
        bx = np.zeros((B, N, 4), np.int32)
        for b in range(B):
            for k in range(N):
                h, w = int(hw_row[k][0]), int(hw_row[k][1])
                mode = r.integers(0, 4)
                if mode == 0:
                    x1 = int(r.integers(0, Wc - 2))
                    y1 = int(r.integers(0, Hc - 2))
                    bx[b, k] = (x1, y1, x1 + w, y1 + h)
                elif mode == 1:
                    bx[b, k] = (-w, -h, 0, 0)
                elif mode == 2:
                    w2, h2 = min(w, Wc), min(h, Hc)
                    bx[b, k] = (Wc - w2, Hc - h2, Wc, Hc)
                else:
                    s = float(r.uniform(0.2, 1.0))
                    w2 = max(1, int(w * s))
                    h2 = max(1, int(h * s))
                    x1 = int(r.integers(0, Wc))
                    y1 = int(r.integers(0, Hc))
                    bx[b, k] = (x1, y1, x1 + w2, y1 + h2)
        return jnp.asarray(bx)

    objs_b = jnp.asarray(
        np.broadcast_to(objs[0], (B, N, ph, pw, 4)).copy()
    )
    canvases = np.zeros((B, Hc, Wc, 4), np.uint8)
    canvases[..., :3] = 90
    canvases[..., 3] = 255
    cv = jnp.asarray(canvases)

    for int8 in (True, False):
        monkeypatch.setattr(cp, "INT8_DOTS", int8)
        for trial in range(2):
            bx = rboxes(100 + trial)
            outs = {}
            batch_outs = {}
            for flag in (False, True):
                monkeypatch.setattr(cp, "PIPELINE_TABLES", flag)
                jax.clear_caches()
                outs[flag] = np.asarray(cp.render_solid_fused_v3_program(
                    op, hw, bx, (Hc, Wc), bg, interpret=True,
                    pipelined=True, static_obj_hw=static_hw,
                ))
                batch_outs[flag] = np.asarray(cp.composite_batch_fused_v3(
                    cv, objs_b, hw, bx, interpret=True,
                ))
            assert np.array_equal(outs[True], outs[False]), (
                f"solid render diverged (int8={int8}, trial {trial})"
            )
            assert np.array_equal(batch_outs[True], batch_outs[False]), (
                f"batch surface diverged (int8={int8}, trial {trial})"
            )
