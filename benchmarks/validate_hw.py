"""Hardware numerics validation: compose paths vs PIL on the real chip.

Validates, ON TPU (not the CPU interpreter):
  1. the bench path (clamped packed blend + traced hp tables) against the
     PIL reference composite — must stay within the traced-path budget;
  2. the host-exact path (engine tables + XLA windowed compose) — must be
     bit-exact (max err 0).

PIL references upload once; diffs reduce on device (full-frame readback
over the dev tunnel is ~15 MB/s — never read frames back). Prints one
JSON line with per-config max errors.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(m):
    print(m, file=sys.stderr, flush=True)


def pil_composite(bundle, boxes, canvas_hw, bg=(128, 128, 128, 255)):
    from PIL import Image

    H, W = canvas_hw
    canvas = Image.new("RGBA", (W, H), bg)
    for k, oid in enumerate(bundle.object_ids()):
        x1, y1, x2, y2 = (int(v) for v in boxes[k])
        if x1 < 0 or y1 < 0 or x1 >= W or y1 >= H:
            continue  # reference drop semantics (PIL raises on negatives)
        w, h = max(1, x2 - x1), max(1, y2 - y1)
        from PIL import Image as _I

        canvas.alpha_composite(
            bundle.objects[oid].resize((w, h), _I.LANCZOS), dest=(x1, y1)
        )
    return np.asarray(canvas)


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--random-trials", type=int, default=0,
        help="additional RANDOM canvas geometries validated through the "
             "fused gen-3 kernel vs PIL (traced envelope; v3 compiles in "
             "seconds per geometry)",
    )
    cli = parser.parse_args()

    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.ops.compose import composite_exact
    from image_transformation_tpu.ops.compose_pallas import (
        composite_batch_hybrid_packed,
    )
    from image_transformation_tpu.parallel.sweep import random_downscale_boxes

    log(f"devices: {jax.devices()}")

    @jax.jit
    def max_abs_diff(a_u8, b_u8):
        return jnp.max(
            jnp.abs(a_u8.astype(jnp.int32) - b_u8.astype(jnp.int32))
        )

    results = {}
    worst_traced = 0
    worst_exact = 0
    for bundle_name in ("squarespace", "audio_book"):
        bundle = load_bundle(REPO / "data" / bundle_name)
        arrays = bundle.to_arrays()
        for geom_i, (H, W) in enumerate([(512, 512), (1080, 1920), (960, 540)]):
            B = 4
            rng = np.random.default_rng(100 + geom_i)
            canvases = np.zeros((B, H, W, 4), np.uint8)
            canvases[..., :3] = 128
            canvases[..., 3] = 255
            objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
            hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
            boxes = np.stack(
                [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
            )
            # stress one edge case per batch
            oh0, ow0 = int(arrays.obj_hw[0, 0]), int(arrays.obj_hw[0, 1])
            boxes[0, 0] = [W - ow0 // 2, H - oh0 // 2, W + ow0 // 2, H + oh0 // 2]

            refs = np.stack([pil_composite(bundle, boxes[i], (H, W)) for i in range(B)])
            dev = tuple(
                jnp.asarray(x)
                for x in (canvases, objs, hw.astype(np.int32), boxes.astype(np.int32))
            )
            refs_dev = jnp.asarray(refs)

            out_traced = composite_batch_hybrid_packed(*dev, clamped=True)
            err_t = int(max_abs_diff(out_traced, refs_dev))
            worst_traced = max(worst_traced, err_t)

            from image_transformation_tpu.ops.compose_pallas import (
                composite_batch_fused_v2,
                composite_batch_fused_v3,
            )

            out_fused = composite_batch_fused_v2(*dev)
            err_f = int(max_abs_diff(out_fused, refs_dev))
            worst_traced = max(worst_traced, err_f)

            out_fused3 = composite_batch_fused_v3(*dev)
            err_f3 = int(max_abs_diff(out_fused3, refs_dev))
            worst_traced = max(worst_traced, err_f3)

            # host-exact path (one canvas is enough; it's per-canvas anyway)
            errs_e = []
            for i in range(B):
                out_e = composite_exact(
                    jnp.asarray(canvases[i]),
                    jnp.asarray(arrays.objects),
                    arrays.obj_hw,
                    boxes[i].tolist(),
                )
                errs_e.append(int(max_abs_diff(out_e, refs_dev[i])))
            err_e = max(errs_e)
            worst_exact = max(worst_exact, err_e)
            log(f"{bundle_name} {W}x{H}: traced max err {err_t}, "
                f"fused max err {err_f}, fused3 max err {err_f3}, "
                f"exact max err {err_e}")
            results[f"{bundle_name}_{W}x{H}"] = {
                "traced": err_t, "fused": err_f, "fused3": err_f3,
                "exact": err_e,
            }

    if cli.random_trials:
        from image_transformation_tpu.ops.compose_pallas import (
            composite_batch_fused_v3,
        )

        rng = np.random.default_rng(2024)
        bundles = {
            name: load_bundle(REPO / "data" / name)
            for name in ("squarespace", "audio_book")
        }
        worst_rand = 0
        rand = []
        for t in range(cli.random_trials):
            name = "squarespace" if t % 2 == 0 else "audio_book"
            bundle = bundles[name]
            arrays = bundle.to_arrays()
            H = int(rng.integers(64, 1400))
            W = int(rng.integers(200, 2100))
            B = 3
            canvases = np.zeros((B, H, W, 4), np.uint8)
            canvases[..., :3] = rng.integers(0, 256, 3, dtype=np.uint8)
            canvases[..., 3] = 255
            objs = np.broadcast_to(
                arrays.objects, (B, *arrays.objects.shape)
            ).copy()
            hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
            boxes = np.stack(
                [random_downscale_boxes(rng, arrays.obj_hw, (H, W))
                 for _ in range(B)]
            )
            # per-trial edge stress: identity at a corner + hanging off
            oh0, ow0 = int(arrays.obj_hw[0, 0]), int(arrays.obj_hw[0, 1])
            boxes[0, 0] = [W - ow0, H - oh0, W, H]
            boxes[1, 0] = [W - ow0 // 2, H - 3, W + ow0 // 2, H - 3 + oh0]
            refs = np.stack(
                [pil_composite(bundle, boxes[i], (H, W),
                               bg=tuple(int(v) for v in canvases[0, 0, 0]))
                 for i in range(B)]
            )
            dev = tuple(
                jnp.asarray(x)
                for x in (canvases, objs, hw.astype(np.int32),
                          boxes.astype(np.int32))
            )
            out = composite_batch_fused_v3(*dev)
            err = int(max_abs_diff(out, jnp.asarray(refs)))
            worst_rand = max(worst_rand, err)
            rand.append({"bundle": name, "canvas": [W, H], "fused3": err})
            log(f"random trial {t}: {name} {W}x{H} fused3 max err {err}")
        results["random_trials"] = rand
        results["worst_random_fused3"] = worst_rand

    results["worst_traced"] = worst_traced
    results["worst_exact"] = worst_exact
    print(json.dumps(results))


if __name__ == "__main__":
    main()
