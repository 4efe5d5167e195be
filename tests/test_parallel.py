"""Multi-chip layer: mesh construction, sharded compose, throughput sweep.

Runs on the 8 virtual CPU devices forced by conftest.py — the TPU-world
answer to testing multi-chip without a cluster (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_transformation_tpu.core.bundle import load_bundle
from image_transformation_tpu.ops.compose import composite_canvas
from image_transformation_tpu.parallel.mesh import make_mesh, replicated, shard_batched
from image_transformation_tpu.parallel.sweep import (
    make_batched_compose,
    random_downscale_boxes,
    sharded_compose_step,
    throughput_sweep,
)


def _batch(B, H, W, seed=0):
    bundle = load_bundle("data/audio_book")
    arrays = bundle.to_arrays()
    rng = np.random.default_rng(seed)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 77
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    pad = arrays.objects.shape[1:3]
    return canvases, objs, hw, boxes, pad


def test_make_mesh_shapes():
    mesh = make_mesh(jax.devices()[:8], spatial=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "spatial")
    with pytest.raises(ValueError):
        make_mesh(jax.devices()[:6], data=4, spatial=2)
    assert shard_batched(mesh).spec == jax.sharding.PartitionSpec("data")
    assert replicated(mesh).spec == jax.sharding.PartitionSpec()


def test_sharded_compose_matches_single_device():
    canvases, objs, hw, boxes, pad = _batch(B=8, H=256, W=256)
    dev = tuple(jnp.asarray(x) for x in (canvases, objs, hw, boxes))

    single_out, single_luma = make_batched_compose(pad)(*dev)

    mesh = make_mesh(jax.devices()[:8], spatial=2)
    step = sharded_compose_step(mesh, pad, spatial=True)
    with mesh:
        out, luma = step(*dev)
    assert np.array_equal(np.asarray(out), np.asarray(single_out))
    assert np.asarray(luma)[0] == pytest.approx(
        float(np.mean(np.asarray(single_luma))), rel=1e-5
    )


def test_sharded_matches_reference_compose_per_canvas():
    canvases, objs, hw, boxes, pad = _batch(B=4, H=200, W=304, seed=3)
    mesh = make_mesh(jax.devices()[:4], spatial=1)
    step = sharded_compose_step(mesh, pad)
    with mesh:
        out, _ = step(*(jnp.asarray(x) for x in (canvases, objs, hw, boxes)))
    for b in range(4):
        ref = composite_canvas(
            jnp.asarray(canvases[b]), jnp.asarray(objs[b]),
            jnp.asarray(hw[b]), jnp.asarray(boxes[b]), pad,
        )
        assert np.array_equal(np.asarray(out[b]), np.asarray(ref))


def test_throughput_sweep_smoke():
    bundles = [load_bundle("data/squarespace"), load_bundle("data/audio_book")]
    result = throughput_sweep(
        bundles, ["1:1", "16:9"], batch_per_ratio=2, warmup=1, reps=1
    )
    assert set(result["ratios"]) == {"1:1", "16:9"}
    assert result["canvases_per_sec"] > 0
    assert result["total_canvases"] == 4


def test_throughput_sweep_pallas_cpu_smoke():
    """kernel='pallas' sweep completes on a Mosaic-less backend through
    the latched fallback chain, with hoisted planar object args and
    warmup=0 (both compile warms must still happen outside the timing)."""
    bundles = [load_bundle("data/squarespace")]
    result = throughput_sweep(
        bundles, ["1:1"], batch_per_ratio=2, warmup=0, reps=1,
        kernel="pallas",
    )
    assert result["canvases_per_sec"] > 0
    assert result["total_canvases"] == 2


def test_throughput_sweep_on_mesh():
    bundles = [load_bundle("data/audio_book")] * 4
    mesh = make_mesh(jax.devices()[:4], spatial=1)
    result = throughput_sweep(
        bundles, ["1:1"], batch_per_ratio=4, warmup=1, reps=1, mesh=mesh
    )
    assert result["canvases_per_sec"] > 0


def test_batched_compose_pallas_kernel_falls_back_on_cpu():
    """kernel='pallas' must produce identical results on backends without
    Mosaic (falls back to the XLA path after one failed attempt)."""
    import jax.numpy as jnp
    import numpy as np

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.parallel.sweep import (
        make_batched_compose,
        random_downscale_boxes,
    )

    bundle = load_bundle("data/audio_book")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 200, 256, 2
    rng = np.random.default_rng(3)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    args = tuple(jnp.asarray(x) for x in (canvases, objs, hw.astype(np.int32),
                                          boxes.astype(np.int32)))
    out_x, luma_x = make_batched_compose(pad, kernel="xla")(*args)
    step_p = make_batched_compose(pad, kernel="pallas")
    out_p, luma_p = step_p(*args)
    out_p2, _ = step_p(*args)  # second call exercises the latched fallback
    assert np.array_equal(np.asarray(out_x), np.asarray(out_p))
    assert np.array_equal(np.asarray(out_p), np.asarray(out_p2))
    assert np.allclose(np.asarray(luma_x), np.asarray(luma_p))


def test_sharded_solid_render_on_mesh():
    """The gen-3 fused Pallas kernel under shard_map over the 8-device
    virtual mesh (interpret mode on CPU): per-device rendering plus the
    cross-device pmean collective must match the single-device XLA step."""
    import jax.numpy as jnp
    import numpy as np

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.ops.compose_pallas import (
        packed_to_u8_np,
        planarize_objects,
    )
    from image_transformation_tpu.parallel.mesh import make_mesh
    from image_transformation_tpu.parallel.sweep import (
        make_batched_compose,
        make_sharded_solid_render,
        random_downscale_boxes,
    )

    bundle = load_bundle("data/squarespace")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 160, 256, 8
    rng = np.random.default_rng(9)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 128
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    objs_p = planarize_objects(jnp.asarray(objs))
    hw_d = jnp.asarray(hw.astype(np.int32))
    boxes_d = jnp.asarray(boxes.astype(np.int32))

    mesh = make_mesh(jax.devices()[:8], spatial=1)
    step = make_sharded_solid_render(mesh, (H, W), pad, interpret=True)
    out, luma = step(objs_p, hw_d, boxes_d)
    assert out.shape[0] == B and luma.shape == (1,)

    ref, luma_ref = make_batched_compose(pad, kernel="xla")(
        jnp.asarray(canvases), jnp.asarray(objs), hw_d, boxes_d
    )
    got = packed_to_u8_np(np.asarray(out))[:, :H, :W]
    # cross-PROGRAM comparisons of traced-table composes carry the usual
    # +-1 at rounding boundaries (f32 reduction order differs between the
    # sharded and unsharded compiles — see ops/resize.py)
    diff = np.abs(got.astype(int) - np.asarray(ref).astype(int))
    assert diff.max() <= 1
    assert np.allclose(float(luma[0]), float(np.asarray(luma_ref).mean()),
                       atol=1e-2)


def test_solid_render_step_falls_back_on_cpu():
    """The one-program solid render step (sweep/bench fast path) must
    latch the generic fallback on backends without Mosaic and then match
    the XLA step on the same solid canvases."""
    import jax.numpy as jnp
    import numpy as np

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.parallel.sweep import (
        make_batched_compose,
        make_solid_render_step,
        random_downscale_boxes,
    )

    bundle = load_bundle("data/squarespace")
    arrays = bundle.to_arrays()
    pad = arrays.objects.shape[1:3]
    H, W, B = 200, 256, 2
    rng = np.random.default_rng(5)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 128
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    args = tuple(jnp.asarray(x) for x in (canvases, objs, hw.astype(np.int32),
                                          boxes.astype(np.int32)))
    out_x, luma_x = make_batched_compose(pad, kernel="xla")(*args)
    step_s = make_solid_render_step((H, W), pad)
    out_s, luma_s = step_s(*args)
    assert step_s.fallback[0] is not None  # latched on CPU
    # both tiers return the SAME padded packed-plane convention; the host
    # byte view-crop recovers u8 NHWC
    from image_transformation_tpu.ops.compose_pallas import packed_to_u8_np

    got = packed_to_u8_np(np.asarray(out_s))[:, :H, :W]
    assert np.array_equal(np.asarray(out_x), got)
    assert np.allclose(np.asarray(luma_x), np.asarray(luma_s))
