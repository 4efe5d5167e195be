"""Library API end-to-end: bundle -> layout -> device compose -> PNG.

Loads a segmented ad bundle, computes the pixel-budget canvas for a new
aspect ratio, synthesizes the solid median-color background, solves a
small Flex-DSL layout into pixel boxes, and composites the cutouts on
device (bit-exact vs PIL's LANCZOS resize + alpha_composite).
"""
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

from image_transformation_tpu.core.cache import honor_platform_env

honor_platform_env()

import numpy as np

from image_transformation_tpu.core.bundle import load_bundle
from image_transformation_tpu.layout.canvas import compute_canvas_size
from image_transformation_tpu.layout.flex import solve_flex
from image_transformation_tpu.ops.background import masked_median_rgb, solid_canvas
from image_transformation_tpu.pipeline.engine import ComposeEngine


def main(out_path: str = "/tmp/example_compose.png") -> None:
    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()

    # 9:16 canvas preserving the original's pixel budget
    width, height = compute_canvas_size(bundle.background.size, "9:16")

    # solid background from the median color of the original's opaque pixels
    color = masked_median_rgb(np.asarray(bundle.background.convert("RGBA")))
    canvas = np.asarray(solid_canvas(color, height, width))

    # a single-column layout over every object, centered
    layout = {
        "type": "flex",
        "direction": "column",
        "justify": "space_around",
        "align": "center",
        "children": [
            {"object_id": int(oid), "name": meta.label}
            for oid, meta in sorted(bundle.meta.items())
        ],
    }
    placements = solve_flex(layout, (width, height), bundle.sizes())

    engine = ComposeEngine(arrays, canvas)
    composed = np.asarray(engine.compose(placements))

    from PIL import Image

    Image.fromarray(composed, "RGBA").save(out_path)
    print(f"composed {width}x{height} canvas with "
          f"{len(placements)} objects -> {out_path}")


if __name__ == "__main__":
    main()
