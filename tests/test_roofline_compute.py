"""Compute-side roofline model (ops/roofline_compute.py, VERDICT r3
item 2): jaxpr op counting, per-stage aggregation over realized boxes,
and the peak tables' utilization fold."""

import numpy as np
import pytest

from image_transformation_tpu.ops import roofline_compute as rc


def test_count_matmul_macs():
    import jax
    import jax.numpy as jnp

    c = rc.count_jaxpr_ops(
        jax.make_jaxpr(lambda a, b: a @ b)(
            jax.ShapeDtypeStruct((32, 192), jnp.bfloat16),
            jax.ShapeDtypeStruct((192, 64), jnp.bfloat16),
        )
    )
    assert c["mxu_macs"] == 32 * 192 * 64
    assert c["vpu_ops"] == 0


def test_count_elementwise_and_reduction():
    import jax
    import jax.numpy as jnp

    def f(x):
        y = x * 2 + 1  # 2 elementwise ops x 8*128
        return jnp.sum(y, axis=0)  # reduction: input elements

    c = rc.count_jaxpr_ops(
        jax.make_jaxpr(f)(jax.ShapeDtypeStruct((8, 128), jnp.float32))
    )
    # mul + add (2 x 1024) + reduce (1024); constants may add a
    # broadcast move but no arithmetic
    assert c["vpu_ops"] == 3 * 8 * 128
    assert c["mxu_macs"] == 0


def test_count_moves_tallied_separately():
    import jax
    import jax.numpy as jnp

    def f(x):
        return jnp.pad(x, ((0, 0), (0, 64)))

    c = rc.count_jaxpr_ops(
        jax.make_jaxpr(f)(jax.ShapeDtypeStruct((8, 64), jnp.int32))
    )
    assert c["move_ops"] == 8 * 128
    assert c["vpu_ops"] <= 1  # the scalar pad-value convert


def test_control_flow_rejected():
    import jax
    import jax.numpy as jnp

    def f(x):
        return jax.lax.fori_loop(0, 4, lambda i, v: v + 1, x)

    with pytest.raises(ValueError, match="control-flow"):
        rc.count_jaxpr_ops(
            jax.make_jaxpr(f)(jax.ShapeDtypeStruct((8,), jnp.int32))
        )


@pytest.fixture(scope="module")
def squarespace_geometry():
    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.parallel.sweep import random_downscale_boxes

    arrays = load_bundle("data/squarespace").to_arrays()
    rng = np.random.default_rng(3)
    B = 8
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (480, 640))
         for _ in range(B)]
    )
    static_hw = tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)
    return arrays, boxes, static_hw


def test_batch_model_scales_linearly(squarespace_geometry):
    arrays, boxes, static_hw = squarespace_geometry
    pad = tuple(arrays.objects.shape[1:3])
    w1 = rc.solid_render_compute_per_batch(
        arrays.obj_hw, boxes[:4], (480, 640), pad, static_obj_hw=static_hw
    )
    w2 = rc.solid_render_compute_per_batch(
        arrays.obj_hw, np.concatenate([boxes[:4]] * 2), (480, 640), pad,
        static_obj_hw=static_hw,
    )
    assert w1["mxu_macs"] > 0 and w1["vpu_ops"] > 0
    # doubling identical batch elements doubles everything except the
    # once-per-grid-step premultiply
    prem1 = w1["stages"]["prem"]["vpu_ops"]
    assert w2["mxu_macs"] == pytest.approx(2 * w1["mxu_macs"])
    assert w2["vpu_ops"] + prem1 == pytest.approx(2 * w1["vpu_ops"])


def test_identity_boxes_skip_resample_work(squarespace_geometry):
    arrays, _, static_hw = squarespace_geometry
    pad = tuple(arrays.objects.shape[1:3])
    N = arrays.obj_hw.shape[0]
    # every object placed at its own size: the identity fast path
    boxes = np.zeros((2, N, 4), np.int64)
    boxes[..., 2] = arrays.obj_hw[None, :, 1]
    boxes[..., 3] = arrays.obj_hw[None, :, 0]
    work = rc.solid_render_compute_per_batch(
        arrays.obj_hw, boxes, (4000, 4000), pad, static_obj_hw=static_hw
    )
    st = work["stages"]
    assert st["h_chunk"]["mxu_macs"] == 0
    assert st["v_tile"]["mxu_macs"] == 0
    assert st["identity"]["vpu_ops"] > 0
    assert st["blend_chunk"]["vpu_ops"] > 0  # blends still run


def test_summarize_compute_fields(squarespace_geometry):
    arrays, boxes, static_hw = squarespace_geometry
    pad = tuple(arrays.objects.shape[1:3])
    work = rc.solid_render_compute_per_batch(
        arrays.obj_hw, boxes, (480, 640), pad, static_obj_hw=static_hw
    )
    s = rc.summarize_compute(
        work, 100.0, "TPU v5 lite", int8=True, hbm_bytes_per_batch=1e9
    )
    assert s["mxu_utilization"] is not None and 0 < s["mxu_utilization"]
    assert s["vpu_utilization"] is not None and 0 < s["vpu_utilization"]
    assert s["binding_unit"] in ("mxu", "vpu", "hbm")
    assert s["compute_sol_fraction"] > 0
    assert set(s["stage_sol_ms"]) >= {"h_chunk", "v_tile", "blend_chunk"}
    # unknown device: peaks (and utilizations) must be null, not guessed
    s2 = rc.summarize_compute(work, 100.0, "TPU v99x", int8=True)
    assert s2["mxu_utilization"] is None
    assert s2["vpu_utilization"] is None


def test_bf16_mode_counts_more_vpu_macs_same(squarespace_geometry):
    """bf16 dots skip the s8 correction terms but run the same MAC count
    (3 limb dots either way)."""
    arrays, boxes, static_hw = squarespace_geometry
    pad = tuple(arrays.objects.shape[1:3])
    w8 = rc.solid_render_compute_per_batch(
        arrays.obj_hw, boxes, (480, 640), pad, static_obj_hw=static_hw,
        int8=True,
    )
    wb = rc.solid_render_compute_per_batch(
        arrays.obj_hw, boxes, (480, 640), pad, static_obj_hw=static_hw,
        int8=False,
    )
    assert w8["mxu_macs"] == pytest.approx(wb["mxu_macs"])
