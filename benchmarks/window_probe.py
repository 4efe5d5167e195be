"""Render-window extent sensitivity probe (VERDICT r3 item 3).

79% of the HBM-roofline's modeled traffic is the batch-max ``(MH, MW)``
render-window DMA every (object, batch) step pays regardless of the
object's real size (ops/roofline.py term 2). The candidate fix —
per-object static window extents, the STATUS-item-22 treatment applied
to the blend window — is a large kernel refactor (the window size
parameterizes the blend trace), so before building it this probe
measures what window size is actually WORTH at the headline config by
running the same workload at INFLATED ``out_max_hw`` envelopes:

* every placement stays bitwise-valid (out_max is an upper bound; a
  bigger cover is still correct), and
* the throughput-vs-window-area slope bounds the gain shrinking could
  buy: per-object windows would reduce the average per-step window area
  to ``shrink_potential`` of batch-max (printed below from the static
  asset sizes); if inflating the window by 1.3-2x moves throughput by
  ~nothing, shrinking it below 1x cannot pay either (the inflation
  direction also grows the blend's full-MW row ops, so the measured
  slope UPPER-bounds the DMA-only effect).

Writes benchmarks/window_probe.json and prints one JSON line.
Run on hardware: python benchmarks/window_probe.py [--batch 768] [--reps 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=768)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--out", default=str(REPO / "benchmarks" / "window_probe.json"))
    args = parser.parse_args()

    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.ops.compose_pallas import (
        _round_up,
        planarize_objects,
        window_extents,
    )
    from image_transformation_tpu.ops.roofline import static_restore_windows
    from image_transformation_tpu.parallel.sweep import (
        make_solid_render_step,
        random_downscale_boxes,
    )

    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W, B = 1080, 1920, args.batch
    pad_h, pad_w = arrays.objects.shape[1], arrays.objects.shape[2]
    rng = np.random.default_rng(0)
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    static_hw = tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)

    mh_a = _round_up(pad_h, 8)
    mw_a = _round_up(pad_w, 128)
    MH, MW = window_extents((mh_a, mw_a))
    # what per-object windows could shrink the average step window to
    wins = static_restore_windows(static_hw, (mh_a, mw_a))
    shrink = float(np.mean([wh * ww for wh, ww in wins]) / (MH * MW))

    objs_dev = jnp.asarray(
        np.asarray(planarize_objects(jnp.asarray(arrays.objects[None])))
    )
    hw_dev = jnp.asarray(hw)
    boxes_dev = jnp.asarray(boxes)

    def fence(x):
        np.asarray(x)

    rows = []
    for label, out_max in (
        ("1.00x (default: batch-max envelope)", (pad_h, pad_w)),
        ("1.3x area", (_round_up(int(pad_h * 1.15), 8),
                       _round_up(int(pad_w * 1.15), 128))),
        ("2.0x area", (_round_up(int(pad_h * 1.42), 8),
                       _round_up(int(pad_w * 1.42), 128))),
    ):
        mh_i = _round_up(out_max[0], 8)
        mw_i = _round_up(out_max[1], 128)
        MHi, MWi = window_extents((mh_i, mw_i))
        step = make_solid_render_step(
            (H, W), out_max, bg_rgba=(128, 128, 128, 255),
            static_obj_hw=static_hw, stat="fence", fallback_mode="tiered",
        )
        out, stat = step(None, objs_dev, hw_dev, boxes_dev)
        fence(stat)
        out, stat = step(None, objs_dev, hw_dev, boxes_dev)  # reuse warm
        fence(stat)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, stat = step(None, objs_dev, hw_dev, boxes_dev)
        fence(stat)
        dt = time.perf_counter() - t0
        cps = B * args.reps / dt
        held = step.fallback[0] is None
        rows.append({
            "label": label,
            "out_max_hw": [mh_i, mw_i],
            "window_hw": [MHi, MWi],
            "window_area_vs_default": round(MHi * MWi / (MH * MW), 3),
            "canvases_per_sec": round(cps, 1),
            "fast_path_held": held,
        })
        log(f"{label}: window {MHi}x{MWi} "
            f"({MHi * MWi / (MH * MW):.2f}x area) -> {cps:.0f} canvases/sec"
            + ("" if held else "  [FALLBACK — invalid row]"))
        out = stat = None
        step.release()

    base = rows[0]["canvases_per_sec"]
    result = {
        "config": {"batch": B, "reps": args.reps, "canvas": [H, W]},
        "per_object_window_shrink_potential": round(shrink, 3),
        "rows": rows,
        "slope_summary": {
            r["label"]: round(r["canvases_per_sec"] / base, 4) for r in rows
        },
    }
    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
