"""Fleet runner: render a matrix of bundles x aspect ratios on device.

ROADMAP item: "multi-bundle CLI over the sharded sweep". The reference has
no batch mode at all — every canvas is one sequential CLI run
(/root/reference/macro_placement_test.py:1715-1745). Here a fleet of
bundles ingests through the native PNG loader, each bundle's layout solves
and composes for EVERY requested ratio in one fused device pass
(solve -> background -> compose -> stats, pipeline/fused.py), and the
ratio-variant batch can shard over a device mesh (``--mesh``).

Layout source per bundle, in priority order:
1. an explicit layout JSON (``--layout-json`` applied to all bundles, or a
   per-bundle ``fleet_layout.json`` inside the bundle directory);
2. a previous run's final layout under ``output_macro_placement/<stem>``;
3. the deterministic fallback: a single column of all objects in id order
   (the same canned layout the CLI's ``--api fake`` planner uses).

Usage:
    python -m image_transformation_tpu.pipeline.fleet \
        --bundles data/squarespace,data/audio_book \
        --ratios 9:16,1:1,16:9,4:1 --output-root fleet_out
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _fallback_layout(items: List[dict]) -> Dict:
    children = [
        {"object_id": int(it["object_id"]), "name": str(it.get("label", "")).strip()}
        for it in sorted(items, key=lambda it: int(it["object_id"]))
    ]
    return {"root": {"type": "flex", "direction": "column", "children": children}}


def _layout_from_previous_run(bundle_dir: Path) -> Optional[Dict]:
    base = Path.cwd() / "output_macro_placement" / bundle_dir.name
    if not base.exists():
        return None
    from .artifacts import latest_iteration

    last = latest_iteration(base)
    if last is None:
        return None
    for idx in range(last, -1, -1):
        state = base / f"iteration_{idx:02d}" / "layout_json" / "loop_state.json"
        if state.exists():
            flex = json.loads(state.read_text()).get("flex_raw") or {}
            if "root" in flex:
                return flex
    return None


def resolve_layout(bundle_dir: Path, items: List[dict], layout_json: Optional[Path]) -> Tuple[Dict, str]:
    """Pick the layout for one bundle; returns (flex dict, provenance tag)."""
    if layout_json is not None:
        return json.loads(Path(layout_json).read_text()), f"file:{layout_json}"
    local = bundle_dir / "fleet_layout.json"
    if local.exists():
        return json.loads(local.read_text()), "bundle:fleet_layout.json"
    prev = _layout_from_previous_run(bundle_dir)
    if prev is not None:
        return prev, "previous_run"
    return _fallback_layout(items), "fallback:column"


def run_fleet(
    bundle_dirs: Sequence[Path],
    ratios: Sequence[str],
    output_root: Optional[Path] = None,
    layout_json: Optional[Path] = None,
    mesh=None,
    method: str = "lanczos",
    save: bool = True,
    pixel_budget_size: Optional[Tuple[int, int]] = None,
    reps: int = 1,
) -> Dict:
    """Render every bundle at every ratio; returns a summary dict.

    One fused program per bundle (its layout structure is static); the
    ratio variants ride one vmap leg each and shard over ``mesh``'s
    ``data`` axis when a mesh is given. ``reps`` > 1 re-runs the device
    step for stable throughput numbers (amortizing dispatch).
    """
    import jax.numpy as jnp

    from ..core.bundle import load_bundle
    from ..core.native_io import save_png
    from ..layout.canvas import compute_canvas_size
    from ..layout.solve import FlexProgram
    from ..ops.background import masked_median_rgb
    from .fused import make_fused_render, make_sharded_fused_render

    output_root = Path(output_root) if output_root else Path.cwd() / "fleet_out"
    ratios = list(ratios)
    n_dev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1

    summary: Dict = {"bundles": {}, "ratios": ratios, "devices": n_dev}
    total_canvases = 0
    total_device_s = 0.0
    t_start = time.perf_counter()

    for bundle_dir in map(Path, bundle_dirs):
        bundle = load_bundle(bundle_dir)
        flex, layout_src = resolve_layout(bundle_dir, bundle.items, layout_json)
        if "root" not in flex:
            raise ValueError(f"layout for {bundle_dir} has no 'root'")

        base_size = pixel_budget_size or bundle.background.size
        sizes_wh = [compute_canvas_size(base_size, r, verbose=False) for r in ratios]
        w_max = max(w for w, _ in sizes_wh)
        h_max = max(h for _, h in sizes_wh)

        arrays = bundle.to_arrays()
        prog = FlexProgram.from_dsl(flex["root"])
        n = prog.n_objects
        obj_pad = (arrays.objects.shape[1], arrays.objects.shape[2])
        objs = np.zeros((n, *arrays.objects.shape[1:]), np.uint8)
        obj_wh = np.zeros((n, 2), np.int32)
        known = np.zeros((n,), bool)
        size_map = bundle.sizes()
        for k, oid in enumerate(prog.obj_ids):
            oid = int(oid)
            if oid in size_map:
                objs[k] = arrays.objects[arrays.index_of(oid)]
                obj_wh[k] = size_map[oid]
                known[k] = True

        median = masked_median_rgb(jnp.asarray(np.asarray(bundle.background)))

        # The variant batch must tile evenly over the mesh: repeat-pad it.
        canvas_wh = np.asarray(sizes_wh, np.int32)
        v_real = canvas_wh.shape[0]
        if mesh is not None and v_real % n_dev:
            pad = n_dev - v_real % n_dev
            filler = np.tile(canvas_wh, (pad // v_real + 1, 1))[:pad]
            canvas_wh = np.concatenate([canvas_wh, filler], axis=0)

        if mesh is not None:
            step = make_sharded_fused_render(mesh, prog, (h_max, w_max), obj_pad, method)
        else:
            step = make_fused_render(prog, (h_max, w_max), obj_pad, method)

        args = (
            jnp.asarray(canvas_wh),
            median.astype(jnp.uint8),
            jnp.asarray(objs),
            jnp.asarray(obj_wh),
            jnp.asarray(known),
        )
        result = step(*args)
        np.asarray(result[-1])  # execution fence (see bench.py)
        t0 = time.perf_counter()
        for _ in range(reps):
            result = step(*args)
        np.asarray(result[-1])
        device_s = (time.perf_counter() - t0) / reps
        out, boxes = result[0], result[1]

        out_np = np.asarray(out)
        boxes_np = np.asarray(boxes)
        bdir = output_root / bundle_dir.name
        renders = {}
        for i, r in enumerate(ratios):
            w, h = sizes_wh[i]
            renders[r] = out_np[i, :h, :w]
            if save:
                bdir.mkdir(parents=True, exist_ok=True)
                save_png(renders[r], bdir / f"variant_{r.replace(':', 'x')}.png")
        if save:
            bdir.mkdir(parents=True, exist_ok=True)
            (bdir / "fleet_layout_used.json").write_text(json.dumps(flex, indent=2))
            (bdir / "boxes.json").write_text(json.dumps(
                {r: boxes_np[i].tolist() for i, r in enumerate(ratios)}, indent=2
            ))

        total_canvases += v_real * reps
        total_device_s += device_s * reps
        summary["bundles"][bundle_dir.name] = {
            "layout_source": layout_src,
            "objects": int(arrays.n_valid),
            "canvas_sizes": {r: list(sizes_wh[i]) for i, r in enumerate(ratios)},
            "seconds_per_pass": device_s,
        }

    wall = time.perf_counter() - t_start
    summary["total_canvases"] = total_canvases
    summary["device_seconds"] = total_device_s
    summary["wall_seconds"] = wall
    summary["canvases_per_sec_device"] = (
        total_canvases / total_device_s if total_device_s else 0.0
    )
    if save:
        output_root.mkdir(parents=True, exist_ok=True)
        (output_root / "fleet_summary.json").write_text(json.dumps(summary, indent=2))
    return summary


def _discover_bundles(root: Path) -> List[Path]:
    found = []
    for child in sorted(root.iterdir()):
        if child.is_dir() and (child / "results.json").exists() and (
            child / "background.png"
        ).exists():
            found.append(child)
    if not found:
        raise FileNotFoundError(f"no bundles under {root}")
    return found


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Render a fleet of bundles at several aspect ratios on device."
    )
    parser.add_argument("--bundles", help="Comma-separated bundle directories")
    parser.add_argument("--bundles-root", help="Directory whose child dirs are bundles")
    parser.add_argument("--ratios", default="9:16,1:1,16:9,4:1")
    parser.add_argument("--output-root", default="fleet_out")
    parser.add_argument("--layout-json", default=None,
                        help="Flex-DSL JSON applied to every bundle")
    parser.add_argument("--pixel-budget", default=None,
                        help="WxH pixel budget (e.g. 3840x2160); default: each "
                             "bundle's original size")
    parser.add_argument("--mesh", action="store_true",
                        help="Shard ratio variants over all visible devices")
    parser.add_argument("--reps", type=int, default=1)
    parser.add_argument("--no-save", action="store_true")
    args = parser.parse_args(argv)

    from ..core.cache import enable_compile_cache

    enable_compile_cache()

    if args.bundles:
        bundle_dirs = [Path(p.strip()) for p in args.bundles.split(",") if p.strip()]
    elif args.bundles_root:
        bundle_dirs = _discover_bundles(Path(args.bundles_root))
    else:
        parser.error("one of --bundles or --bundles-root is required")

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()

    budget = None
    if args.pixel_budget:
        w, h = args.pixel_budget.lower().split("x")
        budget = (int(w), int(h))

    summary = run_fleet(
        bundle_dirs,
        [r.strip() for r in args.ratios.split(",") if r.strip()],
        output_root=Path(args.output_root),
        layout_json=Path(args.layout_json) if args.layout_json else None,
        mesh=mesh,
        save=not args.no_save,
        pixel_budget_size=budget,
        reps=args.reps,
    )
    print(json.dumps({
        "bundles": len(summary["bundles"]),
        "ratios": summary["ratios"],
        "total_canvases": summary["total_canvases"],
        "canvases_per_sec_device": round(summary["canvases_per_sec_device"], 2),
    }))


if __name__ == "__main__":
    main()
