"""STATUS item 35 hardware A/B (VERDICT r4 item 3): cross-chunk
coeff-table prefetch (ITPU_PIPELINE_TABLES) vs the in-order kernel.

Single-process interleaved design — deliberately different from
ab_static_windows.sh's fresh-process-per-run protocol: the round-5
tunnel pays 3-8 MINUTES of backend-init/first-transfer latency per
process on a degraded day (BENCH supervisor logs), which would swamp a
12-run campaign and add between-process drift. Here ONE backend init
serves every arm; the flag is flipped on the module global +
``jax.clear_caches()`` (the same discipline the parity test
``test_pipeline_tables_parity`` proves re-traces the kernel), the step
factory is rebuilt, and arms alternate OFF/ON within the same process so
tunnel drift lands on both arms symmetrically. The old step's
framebuffer is released before each rebuild — two live batch-768 planes
(2 x 6.4 GB) would not fit HBM alongside compile scratch.

Workloads (house cross-workload discipline, round-3 blend-tiling revert):
  - scaled:   the headline random-downscale distribution (always resampling
              — the path the prefetch targets);
  - identity: native-size placements (table build skipped by the identity
              branch — guards against regressions outside the lever).

    JAX_PLATFORMS=axon python benchmarks/ab_pipeline_tables.py --batch 768
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from benchmarks.identity_bench import identity_boxes  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=768)
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--rounds", type=int, default=3,
                        help="OFF/ON alternations per workload")
    parser.add_argument("--out", default="/tmp/ab_pipeline_tables.json")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.core.cache import enable_compile_cache
    from image_transformation_tpu.ops import compose_pallas as cp
    from image_transformation_tpu.parallel.sweep import (
        make_solid_render_step,
        random_downscale_boxes,
    )

    enable_compile_cache()
    t0 = time.perf_counter()
    print(f"devices: {jax.devices()} ({time.perf_counter() - t0:.1f}s)")

    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W = 1080, 1920
    B = args.batch
    pad_h, pad_w = arrays.objects.shape[1], arrays.objects.shape[2]
    static_hw = tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)
    rng = np.random.default_rng(7)

    objs_dev = jnp.asarray(
        np.asarray(cp.planarize_objects(jnp.asarray(arrays.objects[None])))
    )
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    hw_dev = jnp.asarray(hw)

    workloads = {}
    for name, maker in (
        ("scaled", random_downscale_boxes),
        ("identity", identity_boxes),
    ):
        boxes = np.stack([maker(rng, arrays.obj_hw, (H, W)) for _ in range(B)])
        workloads[name] = jnp.asarray(boxes)

    def build_step():
        return make_solid_render_step(
            (H, W), (pad_h, pad_w), bg_rgba=(128, 128, 128, 255),
            static_obj_hw=static_hw, stat="fence", fallback_mode="tiered",
        )

    def timed(step, boxes_dev):
        out, stat = step(None, objs_dev, hw_dev, boxes_dev)
        np.asarray(stat)  # fence (tunnel-safe; in-order device stream)
        out, stat = step(None, objs_dev, hw_dev, boxes_dev)
        np.asarray(stat)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, stat = step(None, objs_dev, hw_dev, boxes_dev)
        np.asarray(stat)
        return (time.perf_counter() - t0) / args.reps * 1e3  # ms/batch

    samples: dict = {w: {"off": [], "on": []} for w in workloads}
    for rnd in range(args.rounds):
        for flag, arm in ((False, "off"), (True, "on")):
            cp.PIPELINE_TABLES = flag
            jax.clear_caches()
            step = build_step()
            for wname, boxes_dev in workloads.items():
                ms = timed(step, boxes_dev)
                samples[wname][arm].append(round(ms, 3))
                print(f"round {rnd} {wname:8s} pipeline_tables={arm:3s} "
                      f"{ms:8.3f} ms/batch "
                      f"({B / ms * 1e3:,.0f} canvases/sec)", flush=True)
                if step.fallback[0] is not None:
                    print(f"  !! fallback latched: {step.fallback[0]}")
            step.release()
            del step

    summary = {}
    for wname, arms in samples.items():
        off = float(np.median(arms["off"]))
        on = float(np.median(arms["on"]))
        summary[wname] = {
            "off_ms_median": off, "on_ms_median": on,
            "off_samples": arms["off"], "on_samples": arms["on"],
            "speedup_pct": round((off - on) / off * 100.0, 2),
        }
    payload = {
        "batch": B, "reps": args.reps, "rounds": args.rounds,
        "kernel_flags": {"int8_dots": cp.INT8_DOTS,
                         "static_windows": cp.STATIC_WINDOWS},
        "summary": summary,
    }
    Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload["summary"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
