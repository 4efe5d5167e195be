"""Randomized end-to-end solve+compose vs the PIL oracle (bit-exact)."""

import numpy as np
from PIL import Image

from compositor import composite
from image_transformation_tpu.core.bundle import load_bundle
from image_transformation_tpu.layout.flex import solve_flex


def _random_dsl(rng, ids, labels):
    justs = ["start", "center", "end", "space_between", "space_around"]
    aligns = ["start", "center", "end"]
    order = list(ids)
    rng.shuffle(order)
    children = []
    nest = []
    for oid in order:
        node = {"object_id": int(oid), "name": labels[oid]}
        if rng.random() < 0.5:
            node["padding_px"] = int(rng.integers(0, 25))
        if rng.random() < 0.4:
            node["pin"] = {
                "horizontal": str(rng.choice(aligns)),
                "vertical": str(rng.choice(aligns)),
            }
        if rng.random() < 0.4:
            node["offset_px"] = {
                "x": int(rng.integers(-40, 40)), "y": int(rng.integers(-40, 40))
            }
        if rng.random() < 0.25:
            node["stick_to"] = {
                "edges": [str(rng.choice(["left", "right", "top", "bottom"]))],
                "margin_px": int(rng.integers(0, 15)),
            }
        (nest if (rng.random() < 0.35 and len(nest) < 2) else children).append(node)
    if nest:
        children.insert(int(rng.integers(0, len(children) + 1)), {
            "type": "flex",
            "direction": str(rng.choice(["row", "column"])),
            "justify": str(rng.choice(justs)),
            "align": str(rng.choice(aligns)),
            "gap_px": int(rng.integers(0, 18)),
            "padding_px": int(rng.integers(0, 12)),
            "children": nest,
        })
    return {
        "type": "flex",
        "direction": str(rng.choice(["row", "column"])),
        "justify": str(rng.choice(justs)),
        "align": str(rng.choice(aligns)),
        "gap_px": int(rng.integers(0, 10)),
        "children": children,
    }


def test_random_layouts_bit_exact_vs_pil_oracle():
    rng = np.random.default_rng(2026)
    for bundle_name in ("squarespace", "audio_book"):
        bundle = load_bundle(f"data/{bundle_name}")
        ids = bundle.object_ids()
        labels = bundle.id_to_label()
        for trial in range(4):
            W = int(rng.integers(150, 900))
            H = int(rng.integers(150, 900))
            root = _random_dsl(rng, ids, labels)
            placements = solve_flex(root, (W, H), bundle.sizes())
            canvas = Image.new("RGBA", (W, H), (40, 90, 140, 255))
            ours = np.asarray(composite(canvas, bundle.objects, placements))
            ref = canvas.copy()
            for p in placements:
                oid = int(p["object_id"])
                x1, y1, x2, y2 = p["box"]
                w, h = max(1, x2 - x1), max(1, y2 - y1)
                ref.alpha_composite(
                    bundle.objects[oid].resize((w, h), Image.LANCZOS), dest=(x1, y1)
                )
            diff = np.abs(ours.astype(int) - np.asarray(ref).astype(int))
            assert diff.max() == 0, (
                f"{bundle_name} trial {trial} canvas {W}x{H}: diff {diff.max()}"
            )
