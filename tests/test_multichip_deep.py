"""Deep multichip correctness: ragged batches, wide spatial, two-slice DCN.

Extends the basic sharding tests (test_parallel.py/test_fleet.py, evenly
divisible tiny shapes) with the cases a production mesh actually hits:
variant counts not divisible by the mesh, mixed canvas sizes per shard,
spatial=4 row sharding, and a two-level (slice, data) mesh whose stats
reduction crosses the simulated DCN boundary. Every case asserts the
sharded render is BIT-identical to the single-device fused step on the
real (unpadded) work.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_transformation_tpu.layout.solve import FlexProgram
from image_transformation_tpu.parallel.mesh import make_mesh, make_slice_mesh
from image_transformation_tpu.pipeline.fused import (
    make_fused_render,
    make_sharded_fused_render,
    pad_ragged_variants,
)

H_MAX, W_MAX = 32, 64
PAD_H, PAD_W = 16, 16
N_OBJ = 3


@pytest.fixture(scope="module")
def workload():
    root = {
        "type": "flex", "direction": "column",
        "children": [
            {"object_id": i + 1, "name": f"o{i + 1}"} for i in range(N_OBJ)
        ],
    }
    prog = FlexProgram.from_dsl(root)
    rng = np.random.default_rng(7)
    objs = rng.integers(0, 256, (N_OBJ, PAD_H, PAD_W, 4), dtype=np.uint8)
    obj_wh = np.array([[12, 8], [16, 10], [6, 6]], np.int32)
    for k, (w, h) in enumerate(obj_wh):
        objs[k, h:, :] = 0
        objs[k, :, w:] = 0
    known = np.ones((N_OBJ,), bool)
    bg = np.array([30, 60, 90], np.uint8)
    return prog, objs, obj_wh, known, bg


def _mixed_sizes(v: int) -> np.ndarray:
    """Every variant gets a different (W, H) — mixed sizes per shard."""
    wh = np.tile(np.array([[W_MAX, H_MAX]], np.int32), (v, 1))
    for i in range(v):
        wh[i, 0] = W_MAX - 4 * (i % 5)
        wh[i, 1] = H_MAX - 2 * (i % 3)
    return wh


def _reference(prog, canvas_wh, bg, objs, obj_wh, known):
    """Single-device fused render on the true variants."""
    step = make_fused_render(prog, (H_MAX, W_MAX), (PAD_H, PAD_W))
    return step(
        jnp.asarray(canvas_wh), jnp.asarray(bg), jnp.asarray(objs),
        jnp.asarray(obj_wh), jnp.asarray(known),
    )


def test_ragged_variants_masked_stats(workload):
    """V=5 over an 8-way batch: pad + masked mean; bits match unsharded."""
    prog, objs, obj_wh, known, bg = workload
    mesh = make_mesh(jax.devices()[:8], spatial=1)
    v_true = 5
    canvas_wh = _mixed_sizes(v_true)
    padded_wh, valid = pad_ragged_variants(canvas_wh, mesh.devices.shape[0])
    assert padded_wh.shape[0] == 8 and valid.sum() == v_true

    step = make_sharded_fused_render(
        mesh, prog, (H_MAX, W_MAX), (PAD_H, PAD_W), masked=True
    )
    with mesh:
        out, boxes, luma = step(
            jnp.asarray(padded_wh), jnp.asarray(bg), jnp.asarray(objs),
            jnp.asarray(obj_wh), jnp.asarray(known), jnp.asarray(valid),
        )
    ref_out, ref_boxes, _, ref_luma = _reference(
        prog, canvas_wh, bg, objs, obj_wh, known
    )
    assert np.array_equal(np.asarray(out)[:v_true], np.asarray(ref_out))
    assert np.array_equal(np.asarray(boxes)[:v_true], np.asarray(ref_boxes))
    # masked global mean == mean over the TRUE variants only
    assert np.allclose(
        float(luma[0]), float(np.mean(np.asarray(ref_luma))), rtol=1e-5
    )


def test_spatial4_row_sharding(workload):
    """2x4 (data, spatial) mesh: canvas rows shard 4-wide; bits match."""
    prog, objs, obj_wh, known, bg = workload
    mesh = make_mesh(jax.devices()[:8], spatial=4)
    v = mesh.devices.shape[0] * 2  # 2 variants per data shard
    canvas_wh = _mixed_sizes(v)
    step = make_sharded_fused_render(
        mesh, prog, (H_MAX, W_MAX), (PAD_H, PAD_W), spatial=True
    )
    with mesh:
        out, boxes, luma = step(
            jnp.asarray(canvas_wh), jnp.asarray(bg), jnp.asarray(objs),
            jnp.asarray(obj_wh), jnp.asarray(known),
        )
    ref_out, ref_boxes, _, ref_luma = _reference(
        prog, canvas_wh, bg, objs, obj_wh, known
    )
    assert np.array_equal(np.asarray(out), np.asarray(ref_out))
    assert np.array_equal(np.asarray(boxes), np.asarray(ref_boxes))
    assert np.allclose(float(luma[0]), float(np.mean(np.asarray(ref_luma))),
                       rtol=1e-5)


def test_two_slice_dcn_simulation(workload):
    """(slice=2, data=4) mesh: the batch spans both levels and the stats
    all-reduce crosses the simulated DCN boundary; bits match, and the
    ragged+masked path composes with the slice mesh."""
    prog, objs, obj_wh, known, bg = workload
    mesh = make_slice_mesh(jax.devices()[:8], slices=2)
    assert mesh.axis_names == ("slice", "data")

    # even case across both levels
    v = 8
    canvas_wh = _mixed_sizes(v)
    step = make_sharded_fused_render(
        mesh, prog, (H_MAX, W_MAX), (PAD_H, PAD_W),
        batch_axes=("slice", "data"),
    )
    with mesh:
        out, boxes, luma = step(
            jnp.asarray(canvas_wh), jnp.asarray(bg), jnp.asarray(objs),
            jnp.asarray(obj_wh), jnp.asarray(known),
        )
    ref_out, ref_boxes, _, ref_luma = _reference(
        prog, canvas_wh, bg, objs, obj_wh, known
    )
    assert np.array_equal(np.asarray(out), np.asarray(ref_out))
    assert np.allclose(float(luma[0]), float(np.mean(np.asarray(ref_luma))),
                       rtol=1e-5)

    # ragged across the two-level mesh (V=6 over 8 legs)
    v_true = 6
    canvas_wh = _mixed_sizes(v_true)
    padded_wh, valid = pad_ragged_variants(canvas_wh, 8)
    ragged = make_sharded_fused_render(
        mesh, prog, (H_MAX, W_MAX), (PAD_H, PAD_W),
        batch_axes=("slice", "data"), masked=True,
    )
    with mesh:
        out_r, boxes_r, luma_r = ragged(
            jnp.asarray(padded_wh), jnp.asarray(bg), jnp.asarray(objs),
            jnp.asarray(obj_wh), jnp.asarray(known), jnp.asarray(valid),
        )
    ref_out, ref_boxes, _, ref_luma = _reference(
        prog, canvas_wh, bg, objs, obj_wh, known
    )
    assert np.array_equal(np.asarray(out_r)[:v_true], np.asarray(ref_out))
    assert np.allclose(float(luma_r[0]), float(np.mean(np.asarray(ref_luma))),
                       rtol=1e-5)


def test_ragged_shard_map_solid_render(workload):
    """shard_map path (even-shards only by construction): ragged batch pads
    to the mesh and slices back; padded legs render the repeated work and
    the valid prefix is bit-identical to the unsharded program."""
    from image_transformation_tpu.ops.compose_pallas import (
        packed_to_u8_np,
        planarize_objects,
    )
    from image_transformation_tpu.parallel.sweep import (
        make_batched_compose,
        make_sharded_solid_render,
    )

    prog, objs, obj_wh, known, bg = workload
    mesh = make_mesh(jax.devices()[:8], spatial=1)
    b_true = 5
    hw = np.broadcast_to(obj_wh[:, ::-1], (b_true, N_OBJ, 2)).astype(np.int32)
    boxes = np.stack([
        np.array([[2 + i, 2, 10 + i, 8], [20, 8 + i, 30, 16 + i],
                  [40, 20, 46, 26]], np.int32)
        for i in range(b_true)
    ])
    objs_b = np.broadcast_to(objs, (b_true, *objs.shape)).copy()

    pad = (-b_true) % 8
    objs_p = np.concatenate([objs_b, np.repeat(objs_b[-1:], pad, 0)])
    hw_p = np.concatenate([hw, np.repeat(hw[-1:], pad, 0)])
    boxes_p = np.concatenate([boxes, np.repeat(boxes[-1:], pad, 0)])

    render = make_sharded_solid_render(
        mesh, (H_MAX, W_MAX), (PAD_H, PAD_W), interpret=True
    )
    out, luma = render(
        planarize_objects(jnp.asarray(objs_p)), jnp.asarray(hw_p),
        jnp.asarray(boxes_p),
    )
    got = packed_to_u8_np(np.asarray(out))[:b_true, :H_MAX, :W_MAX]

    bg_canvases = np.zeros((b_true, H_MAX, W_MAX, 4), np.uint8)
    bg_canvases[..., :3] = 128
    bg_canvases[..., 3] = 255
    ref_step = make_batched_compose((PAD_H, PAD_W), kernel="xla")
    ref_out, _ = ref_step(
        jnp.asarray(bg_canvases), jnp.asarray(objs_b), jnp.asarray(hw),
        jnp.asarray(boxes),
    )
    assert np.array_equal(got, np.asarray(ref_out))


def test_sharded_gradient_background_matches_single_chip(workload):
    """The sharded step's gradient support (gained when the per-variant
    render core was unified with make_fused_render) is bit-identical to
    the single-chip gradient render across the 8-way mesh."""
    prog, objs, obj_wh, known, _bg = workload
    mesh = make_mesh(jax.devices()[:8], spatial=1)
    v = 8
    canvas_wh = _mixed_sizes(v)
    bg_grad = np.array([[200, 40, 10], [15, 90, 230]], np.uint8)  # c1, c2

    step = make_sharded_fused_render(
        mesh, prog, (H_MAX, W_MAX), (PAD_H, PAD_W),
        background="gradient", gradient_horizontal=True,
    )
    with mesh:
        out, boxes, luma = step(
            jnp.asarray(canvas_wh), jnp.asarray(bg_grad), jnp.asarray(objs),
            jnp.asarray(obj_wh), jnp.asarray(known),
        )
    ref = make_fused_render(
        prog, (H_MAX, W_MAX), (PAD_H, PAD_W),
        background="gradient", gradient_horizontal=True,
    )
    ref_out, ref_boxes, _, ref_luma = ref(
        jnp.asarray(canvas_wh), jnp.asarray(bg_grad), jnp.asarray(objs),
        jnp.asarray(obj_wh), jnp.asarray(known),
    )
    assert np.array_equal(np.asarray(out), np.asarray(ref_out))
    assert np.array_equal(np.asarray(boxes), np.asarray(ref_boxes))
    assert np.allclose(
        float(luma[0]), float(np.mean(np.asarray(ref_luma))), rtol=1e-5
    )
