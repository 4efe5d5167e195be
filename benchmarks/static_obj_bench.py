"""A/B: gen-3 fused kernel, generic vs per-object static-size branches.

STATUS item 19: within a bundle the object ASSET sizes are fixed — only
the placement boxes vary per render — so the kernel can emit one
``pl.when(k == i)`` branch per object with the resample dots sized to
that object's padded extents instead of the batch-max pad. This script
measures both paths interleaved on hardware (same geometry as the
bench.py headline: squarespace bundle, 1080p canvases, solver-realistic
downscale boxes) and asserts the outputs are bitwise identical.

Usage: python benchmarks/static_obj_bench.py [--batch 64] [--reps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(REPO))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--rounds", type=int, default=4)
    parser.add_argument("--canvas", default="1080x1920")
    args = parser.parse_args()

    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.ops.compose_pallas import (
        pack_rgba_scalar,
        planarize_objects,
        render_solid_fused_v3_program,
    )
    from image_transformation_tpu.parallel.sweep import random_downscale_boxes

    H, W = (int(v) for v in args.canvas.split("x"))
    B = args.batch
    print(f"devices: {jax.devices()}  canvas {H}x{W}  batch {B}", file=sys.stderr)

    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    rng = np.random.default_rng(0)
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    objs_p = jnp.asarray(np.asarray(planarize_objects(jnp.asarray(objs))))
    hw_d = jnp.asarray(hw)
    boxes_d = jnp.asarray(boxes)
    bg = pack_rgba_scalar((128, 128, 128, 255))
    static_hw = tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)
    print(f"static_obj_hw = {static_hw}", file=sys.stderr)

    import functools

    @functools.partial(jax.jit, static_argnames=("s",))
    def step(o, h_, b, s):
        out = render_solid_fused_v3_program(
            o, h_, b, (H, W), bg, static_obj_hw=s
        )
        return out, jnp.sum(out[:, 0, :128], axis=1)

    def fence(x):
        np.asarray(x)

    variants = {"generic": None, "static": static_hw}
    outs = {}
    for name, s in variants.items():
        t0 = time.perf_counter()
        out, luma = step(objs_p, hw_d, boxes_d, s)
        fence(luma)
        print(f"{name}: first call {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        outs[name] = np.asarray(out)

    if np.array_equal(outs["generic"], outs["static"]):
        print("outputs bitwise IDENTICAL", file=sys.stderr)
    else:
        diff = (outs["generic"] != outs["static"]).sum()
        print(f"OUTPUT MISMATCH: {diff} packed words differ", file=sys.stderr)
        sys.exit(1)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, s in variants.items():
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out, luma = step(objs_p, hw_d, boxes_d, s)
            fence(luma)
            times[name].append((time.perf_counter() - t0) / args.reps * 1e3)
    for name, ts in times.items():
        cps = B / (min(ts) / 1e3)
        print(
            f"{name}: {' '.join(f'{t:.2f}' for t in ts)} ms/batch "
            f"(best {min(ts):.2f} ms, {cps:.0f} canvases/sec)"
        )


if __name__ == "__main__":
    main()
