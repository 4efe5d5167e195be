"""Headline batch-size ladder, single process (round 5).

Motivation: the smem scalar-major fix (round 3) removed the batch-512
wall and static windows (round 4) cut HBM traffic ~38%, so batches past
the 768 default may now win. Separate bench.py processes can't resolve a
sub-1% delta across tunnel windows (768 pair measured 0.005% apart
WITHIN a window, but windows differ by more); this ladder times every
batch size in ONE process, interleaved across rounds, rebuilding and
RELEASING each step's framebuffer between arms (two live 1080p planes at
896+ would exceed HBM).

    JAX_PLATFORMS=axon python benchmarks/batch_ladder.py --batches 768 896 1024
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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[768, 896, 1024])
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--out", default="/tmp/batch_ladder.json")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.core.cache import enable_compile_cache
    from image_transformation_tpu.ops.compose_pallas import planarize_objects
    from image_transformation_tpu.parallel.sweep import (
        make_solid_render_step,
        random_downscale_boxes,
    )

    enable_compile_cache()
    print(f"devices: {jax.devices()}", flush=True)

    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W = 1080, 1920
    pad_h, pad_w = arrays.objects.shape[1], arrays.objects.shape[2]
    static_hw = tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)
    rng = np.random.default_rng(7)

    objs_dev = jnp.asarray(
        np.asarray(planarize_objects(jnp.asarray(arrays.objects[None])))
    )
    work = {}
    for B in args.batches:
        hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
        boxes = np.stack(
            [random_downscale_boxes(rng, arrays.obj_hw, (H, W))
             for _ in range(B)]
        )
        work[B] = (jnp.asarray(hw), jnp.asarray(boxes))

    samples: dict = {B: [] for B in args.batches}
    for rnd in range(args.rounds):
        for B in args.batches:
            hw_dev, boxes_dev = work[B]
            step = make_solid_render_step(
                (H, W), (pad_h, pad_w), bg_rgba=(128, 128, 128, 255),
                static_obj_hw=static_hw, stat="fence",
                fallback_mode="tiered",
            )
            out, stat = step(None, objs_dev, hw_dev, boxes_dev)
            np.asarray(stat)
            out, stat = step(None, objs_dev, hw_dev, boxes_dev)
            np.asarray(stat)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out, stat = step(None, objs_dev, hw_dev, boxes_dev)
            np.asarray(stat)
            dt = (time.perf_counter() - t0) / args.reps
            cps = B / dt
            samples[B].append(round(cps, 1))
            print(f"round {rnd} batch {B:5d}: {dt * 1e3:7.3f} ms/batch "
                  f"= {cps:,.0f} canvases/sec "
                  f"({dt / B * 1e6:.2f} us/canvas)", flush=True)
            if step.fallback[0] is not None:
                print(f"  !! fallback latched: {step.fallback[0]}")
            step.release()
            del step, out, stat

    summary = {
        str(B): {
            "canvases_per_sec_median": float(np.median(s)),
            "samples": s,
        }
        for B, s in samples.items()
    }
    payload = {"reps": args.reps, "rounds": args.rounds, "summary": summary}
    Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(summary), flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
