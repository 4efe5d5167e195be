"""HBM-traffic roofline model for the solid-render compose path.

Makes the headline throughput claim FALSIFIABLE: ``bench.py`` reports
achieved HBM GB/s (model bytes / measured wall) against the chip's peak,
so "X canvases/sec" is anchored to how close the pass runs to the memory
speed-of-light instead of floating free. The model mirrors the actual
DMA structure of the gen-3 pipelined kernels in
:mod:`image_transformation_tpu.ops.compose_pallas` (every term cites the
kernel it models); it intentionally counts HBM-side traffic only — VMEM
reads, MXU FLOPs, and the resample intermediates never touch HBM.

The reference has nothing comparable (its only perf surface is wall-clock
timers, ``/root/reference/utils/timing.py``); a roofline is how TPU work
is judged, so the framework carries its own.

Model terms, steady-state framebuffer-reuse step (the bench loop):

1. **restore writes** — ``_make_restore_kernel_static``: one solid-block
   DMA per (batch, object) sized to that object's static window extents
   (STATUS item 22), started unconditionally.
2. **render window I/O** — ``_make_fused_kernel_v3_pipelined``: each
   (object, batch) step DMAs the object's window from the plane into
   VMEM and writes it back (read + write). With ``static_windows``
   (STATUS item 30) the window is sized to EACH object's static extents;
   otherwise every step moves the full batch-max ``(MH, MW)`` window
   regardless of the object's own size (the pre-item-30 headroom line
   this model made visible — 79% of modeled traffic on the headline).
3. **object reads** — one planar asset DMA of the full padded slot per
   grid step when objects are shared across the batch (STATUS item 24),
   per (batch, object) otherwise.
4. **stat reads** — the fence stat reads 128 lanes of row 0 per canvas;
   the sweep's ``packed_luma`` reads the whole crop.

First (non-reuse) render replaces term 1 with a full-plane background
fill write (``render_solid_fused_v3_program``'s ``jnp.full``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def window_extents(out_hw: Tuple[int, int]) -> Tuple[int, int]:
    """Mirror of ``compose_pallas.window_extents`` (kept dependency-free
    so the model can run host-side without importing the kernel stack)."""
    mh, mw = out_hw
    return _round_up(mh + 8, 8), _round_up(mw + 128, 128)


def fused_canvas_pad_hw(
    canvas_hw: Tuple[int, int], out_max_hw: Tuple[int, int]
) -> Tuple[int, int]:
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    MH, MW = window_extents((mh_a, mw_a))
    return (
        max(_round_up(canvas_hw[0], 8), MH),
        max(_round_up(canvas_hw[1], 128), MW),
    )


def static_restore_windows(
    static_obj_hw: Sequence[Tuple[int, int]], out_max_hw: Tuple[int, int]
) -> Tuple[Tuple[int, int], ...]:
    """Per-object restore-window extents — the exact derivation of
    ``render_solid_fused_v3_reuse_program`` (compose_pallas.py:3402-3409)."""
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    return tuple(
        window_extents((
            min(_round_up(max(int(h), 1), 8), mh_a),
            min(_round_up(max(int(w), 1), 128), mw_a),
        ))
        for h, w in static_obj_hw
    )


def solid_render_bytes_per_batch(
    batch: int,
    n_objects: int,
    canvas_hw: Tuple[int, int],
    obj_pad_hw: Tuple[int, int],
    out_max_hw: Optional[Tuple[int, int]] = None,
    static_obj_hw: Optional[Sequence[Tuple[int, int]]] = None,
    shared_objs: bool = True,
    reuse: bool = True,
    stat: str = "fence",
    static_windows: bool = False,
) -> Dict[str, float]:
    """HBM bytes one batched solid-render dispatch moves, by term.

    ``obj_pad_hw`` is the UNALIGNED padded asset envelope (the bundle's
    ``objects.shape[1:3]``); alignment to the planar (8, 128) tiles
    happens here, mirroring ``planarize_objects``. Returns a dict of the
    four model terms plus ``total`` (floats, bytes).
    """
    B, N = int(batch), int(n_objects)
    ph_a = _round_up(obj_pad_hw[0], 8)
    pw_a = _round_up(obj_pad_hw[1], 128)
    if out_max_hw is None:
        out_max_hw = (ph_a, pw_a)
    mh_a = _round_up(out_max_hw[0], 8)
    mw_a = _round_up(out_max_hw[1], 128)
    MH, MW = window_extents((mh_a, mw_a))
    hp, wp = fused_canvas_pad_hw(canvas_hw, (mh_a, mw_a))

    # term 1: restore writes (reuse) or full-plane fill (first render)
    if not reuse:
        restore = float(B) * hp * wp * 4
    elif static_obj_hw is not None and B >= 2:
        wins = static_restore_windows(static_obj_hw, (mh_a, mw_a))
        restore = float(B) * 4 * sum(wh * ww for wh, ww in wins)
    else:
        restore = float(B) * N * MH * MW * 4

    # term 2: render window read + write, every (b, k) — per-object
    # extents when the kernel runs static windows (STATUS item 30),
    # batch-max otherwise
    if static_windows and static_obj_hw is not None:
        wins = static_restore_windows(static_obj_hw, (mh_a, mw_a))
        window_io = float(B) * 2 * 4 * sum(wh * ww for wh, ww in wins)
    else:
        window_io = float(B) * N * 2 * MH * MW * 4

    # term 3: planar object asset DMAs (u8, full padded slot)
    per_obj = 4.0 * ph_a * pw_a
    objects = per_obj * N * (1 if shared_objs else B)

    # term 4: the run-level stat
    if stat == "fence":
        stat_bytes = float(B) * 128 * 4
    else:  # packed_luma over the (H, W) crop
        stat_bytes = float(B) * canvas_hw[0] * canvas_hw[1] * 4

    return {
        "restore_write_bytes": restore,
        "window_io_bytes": window_io,
        "object_read_bytes": objects,
        "stat_read_bytes": stat_bytes,
        "total_bytes": restore + window_io + objects + stat_bytes,
    }


# Public per-chip HBM peak (GB/s) by jax device_kind. Sources: Google
# Cloud TPU system-architecture docs (v4 1228, v5e 819, v5p 2765,
# v6e/Trillium 1640 GB/s).
HBM_PEAK_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def hbm_peak_gbps(device_kind: str) -> Optional[float]:
    """Peak HBM bandwidth for a ``jax.Device.device_kind``, or None if
    unknown (callers must then report utilization as null, not guess)."""
    kind = (device_kind or "").strip()
    if kind in HBM_PEAK_GBPS:
        return HBM_PEAK_GBPS[kind]
    for name, peak in HBM_PEAK_GBPS.items():
        if kind.lower().startswith(name.lower()):
            return peak
    return None


def expected_live_hbm_bytes(
    batch: int,
    n_objects: int,
    canvas_hw: Tuple[int, int],
    obj_pad_hw: Tuple[int, int],
    out_max_hw: Optional[Tuple[int, int]] = None,
    shared_objs: bool = True,
) -> Dict[str, float]:
    """Expected LIVE HBM at the reuse steady state — the number to hold
    against the chip's capacity when a batch size hits the resource wall
    (VERDICT r2 item 1). Two packed planes are live across the donation
    swap (the donated input is freed only once the new output
    materializes), plus the planar object copy."""
    B, N = int(batch), int(n_objects)
    ph_a = _round_up(obj_pad_hw[0], 8)
    pw_a = _round_up(obj_pad_hw[1], 128)
    if out_max_hw is None:
        out_max_hw = (ph_a, pw_a)
    hp, wp = fused_canvas_pad_hw(
        canvas_hw, (_round_up(out_max_hw[0], 8), _round_up(out_max_hw[1], 128))
    )
    plane = float(B) * hp * wp * 4
    objects = 4.0 * ph_a * pw_a * N * (1 if shared_objs else B)
    return {
        "plane_bytes": plane,
        "planes_live_at_swap": 2,
        "object_bytes": objects,
        "total_bytes": 2 * plane + objects,
    }


def summarize(
    bytes_per_batch: Dict[str, float],
    batches_per_sec: float,
    device_kind: str,
) -> Dict[str, object]:
    """Fold the model into the bench JSON fields (achieved GB/s, peak,
    utilization — utilization null when the chip's peak is unknown)."""
    achieved = bytes_per_batch["total_bytes"] * batches_per_sec / 1e9
    peak = hbm_peak_gbps(device_kind)
    return {
        "model_bytes_per_batch": {
            k: round(v) for k, v in bytes_per_batch.items()
        },
        "achieved_gbps": round(achieved, 1),
        "hbm_peak_gbps": peak,
        "hbm_utilization": (
            round(achieved / peak, 3) if peak else None
        ),
        "device_kind": device_kind,
    }


__all__ = [
    "solid_render_bytes_per_batch",
    "expected_live_hbm_bytes",
    "static_restore_windows",
    "hbm_peak_gbps",
    "summarize",
    "HBM_PEAK_GBPS",
]
