"""BASELINE.json benchmark configs #1-#5, end to end.

Run: python benchmarks/run_all.py [--quick]
Writes benchmarks/results.json and prints a summary table to stderr plus
one JSON line (the headline metric) to stdout, mirroring bench.py.

Configs (BASELINE.json):
 1. squarespace bundle: single compose onto a 1:1 solid canvas, verified
    bit-exact vs the PIL reference (the test_compositor path).
 2. audio_book 9:16 -> 16:9 re-layout: margin-driven conflict precompute +
    validation + flex solve with per-phase p50/p95 (align is legacy-path
    metadata the flex solver never reads — not swept).
 3. batched multi-ratio render: one bundle across 9:16/1:1/16:9/4:1 in a
    single fused device pass (solve + background + compose).
 4. full iterate loop with mocked VLM personas (compose -> critic ->
    refine x N) including contact-sheet generation.
 5. throughput sweep: 64 bundles x 4 ratios at 4K pixel budget.
 6. object-count scaling: canvases/sec vs objects-per-canvas and the
    fitted µs/object-step slope.
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


def fence(x) -> None:
    np.asarray(x)


def config1_single_compose() -> dict:
    """Single squarespace compose on 1:1 canvas; bit-exactness verified."""
    from PIL import Image

    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.layout.canvas import compute_canvas_size
    from image_transformation_tpu.layout.flex import solve_flex
    from image_transformation_tpu.ops.background import masked_median_rgb, solid_canvas
    from image_transformation_tpu.pipeline.engine import ComposeEngine

    bundle = load_bundle(REPO / "data" / "squarespace")
    W, H = compute_canvas_size(bundle.background.size, "1:1", verbose=False)
    root = {
        "type": "flex", "direction": "column",
        "children": [
            {"object_id": oid, "name": bundle.meta[oid].label}
            for oid in bundle.object_ids()
        ],
    }
    placements = solve_flex(root, (W, H), bundle.sizes())
    median = masked_median_rgb(jnp.asarray(np.asarray(bundle.background)))
    canvas = np.asarray(solid_canvas(median.astype(jnp.uint8), H, W))
    engine = ComposeEngine(bundle.to_arrays(), canvas)

    out = engine.compose(placements)
    fence(out)
    # Fenced per-call samples (includes the host<->device round-trip; on
    # the tunneled dev host that adds ~30-50 ms of pure dispatch latency).
    samples = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = engine.compose(placements)
        fence(out)
        samples.append(time.perf_counter() - t0)
    samples.sort()
    p50 = samples[len(samples) // 2]
    p95 = samples[int(len(samples) * 0.95)]
    # Amortized device time (pipelined dispatches, one fence).
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        out = engine.compose(placements)
    fence(out)
    dt = (time.perf_counter() - t0) / reps

    # bit-exactness vs PIL
    ref = Image.fromarray(canvas, "RGBA")
    for p in placements:
        oid = int(p["object_id"])
        x1, y1, x2, y2 = p["box"]
        ref.alpha_composite(
            bundle.objects[oid].resize(
                (max(1, x2 - x1), max(1, y2 - y1)), Image.LANCZOS
            ),
            dest=(x1, y1),
        )
    exact = bool(np.array_equal(np.asarray(out), np.asarray(ref)))
    return {
        "canvas": [W, H],
        "device_ms_per_compose_amortized": dt * 1e3,
        "p50_compose_latency_ms_incl_dispatch": p50 * 1e3,
        "p95_compose_latency_ms_incl_dispatch": p95 * 1e3,
        "bit_exact_vs_pil": exact,
    }


def _percentiles(samples_s: list) -> dict:
    from benchmarks.common import percentiles_ms

    return percentiles_ms(samples_s)


def config2_margin_conflict_relayout() -> dict:
    """audio_book 9:16 -> 16:9 re-layout: per-margin conflict precompute +
    validation + flex solve.

    Honest scope: ``margin`` feeds the conflict precomputation and the
    validator (what the reference consumes it for in the flex path); the
    solver itself places into the full canvas, and ``align`` is legacy-path
    metadata the flex solver never reads — so neither is fake-swept here.
    Reports per-phase p50/p95 host latencies.
    """
    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.layout.canvas import compute_canvas_size
    from image_transformation_tpu.layout.flex import solve_flex
    from image_transformation_tpu.layout.validate import (
        compute_nesting_conflicts,
        validate_flex_dsl,
    )

    bundle = load_bundle(REPO / "data" / "audio_book")
    sizes = bundle.sizes()
    ids = bundle.object_ids()
    labels = [bundle.meta[oid].label for oid in ids]
    dims = [sizes[oid] for oid in ids]

    def root_for(direction: str) -> dict:
        return {
            "type": "flex", "direction": direction,
            "children": [
                {"object_id": oid, "name": bundle.meta[oid].label} for oid in ids
            ],
        }

    margins = (0.0, 0.05, 0.1, 0.2, 0.3)
    t0 = time.perf_counter()
    n_layouts = 0
    validations = {"passed": 0, "failed": 0}
    conflict_counts = {}
    conflict_s, validate_s, solve_s = [], [], []
    for ratio, direction in (("9:16", "column"), ("16:9", "row")):
        root = root_for(direction)
        W, H = compute_canvas_size(bundle.background.size, ratio, verbose=False)
        for margin in margins:
            t = time.perf_counter()
            row_bad, col_bad = compute_nesting_conflicts(labels, dims, (W, H), margin)
            conflict_s.append(time.perf_counter() - t)
            conflict_counts[f"{ratio}@{margin}"] = {
                "row": len(row_bad), "col": len(col_bad)
            }
            t = time.perf_counter()
            try:
                validate_flex_dsl(
                    {"root": json_copy(root)}, ids, bundle.id_to_label(),
                    row_bad_pairs={frozenset(p) for p in row_bad},
                    col_bad_pairs={frozenset(p) for p in col_bad},
                )
                validations["passed"] += 1
            except Exception:
                validations["failed"] += 1
            validate_s.append(time.perf_counter() - t)
            t = time.perf_counter()
            placements = solve_flex(root, (W, H), sizes)
            solve_s.append(time.perf_counter() - t)
            assert len(placements) == len(ids)
            n_layouts += 1
    dt = time.perf_counter() - t0

    # device sweep: ONE vmapped program validates every margin variant
    # (conflict masks + coverage bitsets on device, layout/validate_vec.py)
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.layout.solve import FlexProgram
    from image_transformation_tpu.layout.validate_vec import (
        inner_extents,
        validate_program_extents,
    )

    prog = FlexProgram.from_dsl(root_for("row"))
    obj_wh = jnp.asarray(np.asarray(dims, np.int32))
    required = jnp.asarray(ids)
    W, H = compute_canvas_size(bundle.background.size, "16:9", verbose=False)
    # margin quantization host-side (bit-exact f64 contract); the device
    # program is integer-only and vmaps over the extents table
    extents = inner_extents((W, H), np.asarray(margins, np.float64))

    @jax.jit
    def device_sweep(ext):
        return jax.vmap(
            lambda e: validate_program_extents(prog, obj_wh, e, required)
        )(ext)

    res = device_sweep(jnp.asarray(extents))
    fence(res["n_row_violations"])
    t = time.perf_counter()
    res = device_sweep(jnp.asarray(extents))
    fence(res["n_row_violations"])
    device_sweep_ms = (time.perf_counter() - t) * 1e3

    return {
        "layouts_solved": n_layouts,
        "margins_swept": list(margins),
        "validations": validations,
        "conflict_pairs_by_margin": conflict_counts,
        "conflict_precompute": _percentiles(conflict_s),
        "validate": _percentiles(validate_s),
        "solve": _percentiles(solve_s),
        "device_vmapped_validation": {
            "margins": len(margins),
            "ms_per_sweep": device_sweep_ms,
            "row_violations": [int(v) for v in np.asarray(res["n_row_violations"])],
            "all_covered": bool(np.asarray(res["covered"]).all()),
        },
        "seconds": dt,
    }


def json_copy(obj):
    return json.loads(json.dumps(obj))


def config3_multi_ratio() -> dict:
    """One bundle across 4 ratios in a single fused device pass.

    Device pass (solve + background + compose + stats) is timed with a
    scalar fence; the full host round-trip (padded-frame readback) is
    reported separately — on tunneled dev hosts the readback dominates.
    """
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.layout.canvas import compute_canvas_size
    from image_transformation_tpu.layout.solve import FlexProgram
    from image_transformation_tpu.ops.background import masked_median_rgb
    from image_transformation_tpu.pipeline.fused import (
        fused_multi_ratio_render,
        make_fused_render,
    )

    bundle = load_bundle(REPO / "data" / "squarespace")
    root = {
        "type": "flex", "direction": "column",
        "children": [
            {"object_id": oid, "name": bundle.meta[oid].label}
            for oid in bundle.object_ids()
        ],
    }
    ratios = ["9:16", "1:1", "16:9", "4:1"]
    sizes_px = [
        compute_canvas_size(bundle.background.size, r, verbose=False) for r in ratios
    ]
    w_max = max(w for w, _ in sizes_px)
    h_max = max(h for _, h in sizes_px)
    arrays = bundle.to_arrays()
    prog = FlexProgram.from_dsl(root)
    size_map = bundle.sizes()
    n = prog.n_objects
    objs = np.zeros((n, *arrays.objects.shape[1:]), np.uint8)
    obj_wh = np.zeros((n, 2), np.int32)
    known = np.zeros((n,), bool)
    for k, oid in enumerate(prog.obj_ids):
        if int(oid) in size_map:
            idx = arrays.index_of(int(oid))
            objs[k] = arrays.objects[idx]
            obj_wh[k] = size_map[int(oid)]
            known[k] = True
    median = masked_median_rgb(jnp.asarray(np.asarray(bundle.background)))
    obj_pad = (arrays.objects.shape[1], arrays.objects.shape[2])
    args = (
        jnp.asarray(np.asarray(sizes_px, np.int32)),
        median.astype(jnp.uint8),
        jnp.asarray(objs),
        jnp.asarray(obj_wh),
        jnp.asarray(known),
    )
    # gen-3 fused-kernel compose inside the solve+render program (2.35 ->
    # 1.11 ms/pass on v5e); loud fallback to the XLA compose.
    compose_kernel = "pallas"
    try:
        step = make_fused_render(prog, (h_max, w_max), obj_pad, kernel="pallas")
        out, boxes, scales, luma = step(*args)
        fence(luma)
    except Exception as e:  # noqa: BLE001 - no Mosaic on this backend
        log(f"config3: pallas fused render failed ({e!r}); using XLA")
        compose_kernel = "xla"
        step = make_fused_render(prog, (h_max, w_max), obj_pad)
        out, boxes, scales, luma = step(*args)
        fence(luma)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out, boxes, scales, luma = step(*args)
    fence(luma)
    device_ms = (time.perf_counter() - t0) / reps * 1e3

    # fenced per-pass samples (include the dispatch round-trip)
    samples = []
    for _ in range(15):
        t0 = time.perf_counter()
        out, boxes, scales, luma = step(*args)
        fence(luma)
        samples.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    renders, _ = fused_multi_ratio_render(bundle, root, ratios)
    host_ms = (time.perf_counter() - t0) * 1e3
    return {
        "ratios": ratios,
        "compose_kernel": compose_kernel,
        "device_ms_per_4variant_pass": device_ms,
        "variants_per_sec_device": 4 / (device_ms / 1e3),
        "per_pass_incl_dispatch": _percentiles(samples),
        "host_roundtrip_ms": host_ms,
    }


def config4_iterate_loop(tmp_root: Path) -> dict:
    """Full mocked-VLM iterate loop incl. contact sheet generation."""
    from image_transformation_tpu.pipeline.run import run_macro_only
    from image_transformation_tpu.vlm.client import FakeClient, register_fake_client

    bundle_dir = REPO / "data" / "squarespace"
    items = json.loads((bundle_dir / "results.json").read_text())

    def layout(pad):
        children = [
            {"object_id": int(it["object_id"]), "name": str(it["label"])}
            for it in items
        ]
        children[-1] = dict(children[-1], padding_px=pad)
        return json.dumps(
            {"root": {"type": "flex", "direction": "column", "children": children}}
        )

    n_iters = 3
    script = [layout(0)]
    for i in range(n_iters):
        script += [f"Score {6 + i}/10: tighten spacing", layout(4 * (i + 1))]
    register_fake_client(lambda: FakeClient(script))
    try:
        t0 = time.perf_counter()
        run_macro_only(
            bundle_dir, "9:16", "center", 0.05, api_type="auto",
            refine_iters=n_iters, base_output_root=tmp_root,
        )
        dt = time.perf_counter() - t0
    finally:
        register_fake_client(None)
    return {"iterations": n_iters + 1, "seconds_total": dt,
            "seconds_per_iteration": dt / (n_iters + 1)}


def config5_throughput(quick: bool) -> dict:
    """64 bundles x 4 ratios at 4K pixel budget.

    Headline path uses superbatch=4 (four box-batches scanned inside one
    device program): at 4K the scan keeps ONE multi-GB output batch live
    instead of re-materializing it per dispatch — measured 2.1x over the
    per-batch dispatch path (2,183 -> 4,542 canvases/sec), which is also
    reported for reference.
    """
    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.parallel.sweep import throughput_sweep

    shipped = [
        load_bundle(REPO / "data" / "squarespace"),
        load_bundle(REPO / "data" / "audio_book"),
    ]
    bundles = [shipped[i % 2] for i in range(8 if quick else 64)]
    common = dict(
        ratios=["9:16", "1:1", "16:9", "4:1"],
        batch_per_ratio=len(bundles),
        pixel_budget_size=(3840, 2160),
        reps=2,
        kernel="pallas",  # gen-3 solid renderer (XLA fallback on failure)
    )
    plain = throughput_sweep(bundles, **common)
    piped = throughput_sweep(bundles, superbatch=4, **common)
    return {
        "bundles": len(bundles),
        "canvases_per_sec": piped["canvases_per_sec"],
        "superbatch": 4,
        "per_ratio": {
            r: {"canvas": v["canvas"], "canvases_per_sec": v["canvases_per_sec"]}
            for r, v in piped["ratios"].items()
        },
        "per_batch_dispatch_canvases_per_sec": plain["canvases_per_sec"],
    }


def config6_object_scaling() -> dict:
    """Canvases/sec vs per-canvas object count — the µs/object-step curve.

    Duplicates the squarespace cutouts to N ∈ {2, 4, 8, 16} objects per
    canvas and fits ms-per-batch vs N; the slope over the batch size is the
    marginal cost of one object-step on this host/kernel."""
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.parallel.sweep import (
        make_batched_compose,
        random_downscale_boxes,
    )

    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    pad_h, pad_w = arrays.objects.shape[1], arrays.objects.shape[2]
    H, W, B = 1080, 1920, 8
    rng = np.random.default_rng(3)
    base_n = arrays.objects.shape[0]
    curve = {}
    points = []
    for n_obj in (2, 4, 8, 16):
        idx = [i % base_n for i in range(n_obj)]
        objs = np.broadcast_to(
            arrays.objects[idx], (B, n_obj, pad_h, pad_w, 4)
        ).copy()
        hw = np.broadcast_to(arrays.obj_hw[idx], (B, n_obj, 2)).copy()
        boxes = np.stack([
            random_downscale_boxes(rng, arrays.obj_hw[idx], (H, W))
            for _ in range(B)
        ])
        canvases = np.zeros((B, H, W, 4), np.uint8)
        canvases[..., :3] = 128
        canvases[..., 3] = 255
        step = make_batched_compose((pad_h, pad_w), kernel="pallas")
        args = tuple(jnp.asarray(x) for x in (
            canvases, objs, hw.astype(np.int32), boxes.astype(np.int32)
        ))
        out, stat = step(*args)
        fence(stat)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out, stat = step(*args)
        fence(stat)
        ms = (time.perf_counter() - t0) / reps * 1e3
        curve[str(n_obj)] = {
            "ms_per_batch": ms,
            "canvases_per_sec": B / (ms / 1e3),
        }
        points.append((n_obj, ms))
    ns = np.array([p[0] for p in points], float)
    ys = np.array([p[1] for p in points], float)
    slope_ms_per_obj = float(np.polyfit(ns, ys, 1)[0])
    return {
        "batch": B,
        "canvas": [W, H],
        "curve": curve,
        "us_per_object_step": slope_ms_per_obj * 1e3 / B,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--out", default=str(REPO / "benchmarks" / "results.json"))
    args = parser.parse_args()

    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import tempfile

    # Run conditions up front (advisor r2): config3/4 host-side figures
    # regressed 2-4x between refresh batches while device throughput rose
    # in the same run — host/tunnel contention, not code. Recording the
    # conditions makes regression-vs-noise answerable from history.
    import datetime
    import os

    import jax

    results = {
        "run_conditions": {
            "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"
            ),
            "loadavg": [round(v, 2) for v in os.getloadavg()],
            "device": str(jax.devices()[0]),
            "note": (
                "host-side figures (host_roundtrip_ms, seconds_per_"
                "iteration) are sensitive to host/tunnel load; compare "
                "them only across runs with similar loadavg"
            ),
        }
    }
    with tempfile.TemporaryDirectory() as tmp:
        for name, fn in [
            ("config1_single_compose", config1_single_compose),
            ("config2_margin_conflict_relayout", config2_margin_conflict_relayout),
            ("config3_multi_ratio_fused", config3_multi_ratio),
            ("config4_iterate_loop_mocked_vlm", lambda: config4_iterate_loop(Path(tmp))),
            ("config5_throughput_sweep", lambda: config5_throughput(args.quick)),
            ("config6_object_scaling", config6_object_scaling),
        ]:
            log(f"=== {name} ===")
            t0 = time.perf_counter()
            results[name] = fn()
            log(f"{name}: {json.dumps(results[name])} "
                f"({time.perf_counter() - t0:.1f}s incl. compile)")

    Path(args.out).write_text(json.dumps(results, indent=2))
    log(f"wrote {args.out}")
    print(json.dumps({
        "metric": "4K-budget sweep canvases/sec/chip",
        "value": round(results["config5_throughput_sweep"]["canvases_per_sec"], 2),
        "unit": "canvases/sec",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
