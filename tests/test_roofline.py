"""HBM roofline model (ops/roofline.py): the bytes model must mirror the
ACTUAL kernel derivations in ops/compose_pallas.py — window extents,
canvas padding, per-object static restore windows — or the reported
utilization is fiction. Cross-checked here against the kernel module's
own helpers, plus sanity on the summary math.
"""

import numpy as np

from image_transformation_tpu.ops import roofline
from image_transformation_tpu.ops.compose_pallas import (
    _round_up,
    fused_canvas_pad_hw,
    window_extents,
)


def test_window_and_pad_mirror_the_kernel():
    for out_hw in ((208, 384), (64, 128), (1, 1), (333, 517)):
        assert roofline.window_extents(out_hw) == window_extents(out_hw)
    for canvas, out_max in (
        ((1080, 1920), (208, 384)),
        ((657, 369), (208, 384)),
        ((100, 100), (512, 512)),
    ):
        mh_a = _round_up(out_max[0], 8)
        mw_a = _round_up(out_max[1], 128)
        assert roofline.fused_canvas_pad_hw(
            canvas, (mh_a, mw_a)
        ) == fused_canvas_pad_hw(canvas, (mh_a, mw_a))


def test_bytes_model_terms():
    B, N = 448, 4
    canvas, obj_pad = (1080, 1920), (201, 380)
    static = ((50, 120), (201, 380), (10, 10), (100, 300))
    m = roofline.solid_render_bytes_per_batch(
        B, N, canvas, obj_pad, static_obj_hw=static,
        shared_objs=True, reuse=True, stat="fence",
    )
    mh_a, mw_a = _round_up(201, 8), _round_up(380, 128)
    MH, MW = window_extents((mh_a, mw_a))
    assert m["window_io_bytes"] == B * N * 2 * MH * MW * 4
    # restore windows: per-object static extents, aligned then windowed
    wins = roofline.static_restore_windows(static, (mh_a, mw_a))
    assert m["restore_write_bytes"] == B * 4 * sum(h * w for h, w in wins)
    # one shared planar copy (leading dim 1), u8 four planes
    assert m["object_read_bytes"] == 4 * mh_a * mw_a * N
    assert m["stat_read_bytes"] == B * 128 * 4
    assert m["total_bytes"] == sum(
        v for k, v in m.items() if k != "total_bytes"
    )
    # non-shared objects scale the read term by B
    m2 = roofline.solid_render_bytes_per_batch(
        B, N, canvas, obj_pad, static_obj_hw=static,
        shared_objs=False, reuse=True, stat="fence",
    )
    assert m2["object_read_bytes"] == m["object_read_bytes"] * B
    # first (non-reuse) render pays the full plane fill instead
    m3 = roofline.solid_render_bytes_per_batch(
        B, N, canvas, obj_pad, static_obj_hw=static, reuse=False,
    )
    hp, wp = roofline.fused_canvas_pad_hw(canvas, (mh_a, mw_a))
    assert m3["restore_write_bytes"] == B * hp * wp * 4


def test_static_windows_never_exceed_batch_max():
    static = ((50, 120), (999, 999), (10, 10))
    out_max = (_round_up(208, 8), _round_up(384, 128))
    wins = roofline.static_restore_windows(static, out_max)
    MH, MW = window_extents(out_max)
    assert all(h <= MH and w <= MW for h, w in wins)


def test_summarize_and_peaks():
    m = {"total_bytes": 2.0e9}
    s = roofline.summarize(m, batches_per_sec=65.0, device_kind="TPU v5 lite")
    assert s["achieved_gbps"] == 130.0
    assert s["hbm_peak_gbps"] == 819.0
    assert abs(s["hbm_utilization"] - 130.0 / 819.0) < 1e-3
    # unknown chip -> utilization null, never guessed
    s2 = roofline.summarize(m, 65.0, "TPU v99")
    assert s2["hbm_peak_gbps"] is None and s2["hbm_utilization"] is None
    assert roofline.hbm_peak_gbps("TPU v4") == 1228.0
    assert roofline.hbm_peak_gbps("") is None


def test_expected_live_hbm_names_the_512_wall_inputs():
    """The live-HBM model the watchdog reports: two donated planes plus
    the shared object copy, matching the kernel's padded plane."""
    ex = roofline.expected_live_hbm_bytes(512, 4, (1080, 1920), (201, 380))
    mh_a, mw_a = _round_up(201, 8), _round_up(380, 128)
    hp, wp = roofline.fused_canvas_pad_hw((1080, 1920), (mh_a, mw_a))
    assert ex["plane_bytes"] == 512 * hp * wp * 4
    assert ex["planes_live_at_swap"] == 2
    assert ex["total_bytes"] == 2 * ex["plane_bytes"] + ex["object_bytes"]
