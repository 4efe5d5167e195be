"""Diagnose Mosaic compile latency for the bit-exact fused engine path.

Round-1 finding (ROADMAP item 4): gen-2 fused-exact compiles through the
remote compile helper measured 3 s-8 min for the SAME program, so the
engine default stayed on the XLA indexed path. Round-2 question: how much
of that was backend warmup (first device program in a fresh process costs
40-850 s on the tunnel regardless of content), does the persistent cache
cover Mosaic kernels across processes, and does canvas-geometry bucketing
collapse the compile-key space?

Protocol:
 1. warm the backend FIRST (tiny jit + one small fused-exact program) so
    measurements exclude the warmup artifact;
 2. for G random canvas geometries: build ComposeEngine(kernel="pallas"),
    time the first fused compose (trace+compile+execute) and a warm call;
 3. optional --bucket H,W pads every canvas geometry up to multiples
    before engine construction (fewer distinct kernel shapes).

Run twice in a row to see cross-process persistent-cache behavior.
Prints one JSON line per geometry to stdout; summary to stderr.
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
    parser.add_argument("--geometries", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--bucket", default=None, metavar="H,W",
        help="pad canvas geometry up to multiples of H,W before the engine",
    )
    parser.add_argument("--kernel", default="pallas", choices=["pallas", "xla"])
    args = parser.parse_args()

    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.layout.flex import solve_flex
    from image_transformation_tpu.pipeline.engine import ComposeEngine

    log(f"devices: {jax.devices()}")
    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    root = {
        "type": "flex", "direction": "column",
        "children": [
            {"object_id": oid, "name": bundle.meta[oid].label}
            for oid in bundle.object_ids()
        ],
    }
    sizes = bundle.sizes()

    bucket = None
    if args.bucket:
        bucket = tuple(int(x) for x in args.bucket.split(","))

    def canvas_for(w: int, h: int) -> np.ndarray:
        canvas = np.zeros((h, w, 4), np.uint8)
        canvas[..., :3] = 128
        canvas[..., 3] = 255
        return canvas

    def compose_once(w: int, h: int, warm_reps: int = 3):
        """Build an engine for this geometry, time first + warm composes."""
        ch, cw = h, w
        if bucket:
            ch = -(-h // bucket[0]) * bucket[0]
            cw = -(-w // bucket[1]) * bucket[1]
        placements = solve_flex(root, (w, h), sizes)
        engine = ComposeEngine(arrays, canvas_for(cw, ch), kernel=args.kernel)
        t0 = time.perf_counter()
        out = engine.compose(placements)
        np.asarray(out)
        first = time.perf_counter() - t0
        warm = []
        for _ in range(warm_reps):
            t0 = time.perf_counter()
            out = engine.compose(placements)
            np.asarray(out)
            warm.append(time.perf_counter() - t0)
        used_fused = engine._use_fused
        return first, min(warm), used_fused, (cw, ch)

    # ---- backend warmup: absorb the fresh-process device-program cost ----
    t0 = time.perf_counter()
    np.asarray(jnp.arange(8) * 2)
    log(f"warmup tiny jit: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    first, warm, fused, _ = compose_once(320, 256)
    log(f"warmup fused-exact program (320x256): first={first:.1f}s "
        f"warm={warm * 1e3:.1f}ms fused={fused} "
        f"(total {time.perf_counter() - t0:.1f}s)")

    rng = np.random.default_rng(args.seed)
    rows = []
    for g in range(args.geometries):
        w = int(rng.integers(260, 1400))
        h = int(rng.integers(260, 1400))
        t0 = time.perf_counter()
        first, warm, fused, eff = compose_once(w, h)
        row = {
            "geometry": [w, h],
            "effective_canvas": list(eff),
            "first_call_s": round(first, 3),
            "warm_ms": round(warm * 1e3, 2),
            "fused_active": bool(fused),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    firsts = sorted(r["first_call_s"] for r in rows)
    log(
        f"first-call seconds over {len(rows)} fresh geometries: "
        f"p50={firsts[len(firsts) // 2]:.2f} "
        f"p95={firsts[min(len(firsts) - 1, int(len(firsts) * 0.95))]:.2f} "
        f"max={firsts[-1]:.2f}"
    )


if __name__ == "__main__":
    main()
