"""Identity-placement kernel benchmark (ROADMAP item 1 leftover).

Measures the gen-3 fused kernel on two box distributions over the same
bundle/batch:
  - "scaled":   random downscale boxes (0.3-1.0x) — the headline bench
                workload, always resampling;
  - "identity": every object placed at its NATIVE size (random position) —
                the serving default-column-layout and agentic-compositor
                workload (the agentic pipeline forbids scaling entirely,
                reference agentic/nodes/compositor.py:38-42).

Before the identity fast path, both cost the same ~17 us/object-step
(tables were built and dots run, then discarded by a select). With the
pl.when branch the identity case skips the table build + MXU resample.

    JAX_PLATFORMS=axon python benchmarks/identity_bench.py --batch 64
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


def identity_boxes(rng, obj_hw, canvas_hw):
    """Native-size placements at random in-canvas positions."""
    n = obj_hw.shape[0]
    H, W = canvas_hw
    boxes = np.zeros((n, 4), np.int32)
    for k in range(n):
        oh, ow = int(obj_hw[k, 0]), int(obj_hw[k, 1])
        if oh == 0 or ow == 0 or oh > H or ow > W:
            continue
        x1 = int(rng.integers(0, max(1, W - ow)))
        y1 = int(rng.integers(0, max(1, H - oh)))
        boxes[k] = (x1, y1, x1 + ow, y1 + oh)
    return boxes


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument(
        "--headline-config", action="store_true",
        help="run the HEADLINE bench's kernel configuration (pipelined "
        "walk + static_obj_hw + ONE shared object copy) instead of the "
        "historical default program — for cross-workload A/Bs of "
        "pipelined-kernel changes (e.g. ITPU_STATIC_WINDOWS) on the "
        "identity/no-scaling distribution",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.core.cache import enable_compile_cache
    from image_transformation_tpu.ops.compose_pallas import (
        pack_rgba_scalar,
        planarize_objects,
        render_solid_fused_v3_program,
    )
    from image_transformation_tpu.parallel.sweep import random_downscale_boxes

    enable_compile_cache()
    print(f"devices: {jax.devices()}")
    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W = 1080, 1920
    B = args.batch
    rng = np.random.default_rng(7)

    n_obj_copies = 1 if args.headline_config else B
    objs = np.broadcast_to(
        arrays.objects, (n_obj_copies, *arrays.objects.shape)
    ).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    objs_p = jnp.asarray(planarize_objects(jnp.asarray(objs)))
    hw_dev = jnp.asarray(hw)
    bg = pack_rgba_scalar((128, 128, 128, 255))
    static_hw = (
        tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)
        if args.headline_config else None
    )

    import functools

    @functools.partial(jax.jit, static_argnames=("canvas_hw", "bg"))
    def render_step(o, h_, b, canvas_hw, bg):
        out = render_solid_fused_v3_program(
            o, h_, b, canvas_hw, bg,
            pipelined=args.headline_config, static_obj_hw=static_hw,
        )
        return out, jnp.sum(out[:, 0, :128], axis=1)

    def measure(boxes_np):
        boxes_dev = jnp.asarray(boxes_np)
        out, luma = render_step(objs_p, hw_dev, boxes_dev, (H, W), bg)
        np.asarray(luma)  # fence (tunnel-safe)
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out, luma = render_step(objs_p, hw_dev, boxes_dev, (H, W), bg)
            np.asarray(luma)
            best = min(best, (time.perf_counter() - t0) / args.reps)
        return best

    results = {}
    for name, maker in (
        ("scaled", random_downscale_boxes),
        ("identity", identity_boxes),
    ):
        boxes = np.stack([maker(rng, arrays.obj_hw, (H, W)) for _ in range(B)])
        if name == "identity":
            assert (boxes[:, :, 2:] - boxes[:, :, :2]
                    == hw[:, :, ::-1]).all(), "not identity-sized"
        sec = measure(boxes)
        results[name] = {
            "ms_per_batch": sec * 1e3,
            "canvases_per_sec": B / sec,
            "us_per_object_step": sec / (B * arrays.obj_hw.shape[0]) * 1e6,
        }
        print(name, json.dumps(results[name]))

    payload = {"batch": B, "reps": args.reps, "results": results}
    if args.headline_config:
        # A/B mode: print only — don't clobber the historical
        # default-program results file with a different configuration
        payload["kernel_config"] = "headline"
        print(json.dumps(payload))
    else:
        out_path = REPO / "benchmarks" / "identity_bench_results.json"
        out_path.write_text(json.dumps(payload, indent=2))
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
