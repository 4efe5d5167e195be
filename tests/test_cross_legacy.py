"""Direct cross-checks of secondary surfaces against the reference modules.

Imports the reference implementations from /root/reference (skipped when
unmounted) and compares outputs on real bundle data — no hand-derived
expectations involved.
"""

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "layout_constraints.py").exists(),
    reason="reference repo not mounted",
)


@pytest.fixture()
def ref_modules():
    sys.path.insert(0, str(REFERENCE))
    saved = {}
    names = ("layout_constraints", "background_resizing", "compositor",
             "macro_placement_test", "api_client", "utils", "utils.timing")
    for name in names:
        saved[name] = sys.modules.pop(name, None)
    mods = {
        "layout_constraints": importlib.import_module("layout_constraints"),
        "background_resizing": importlib.import_module("background_resizing"),
        "macro_placement_test": importlib.import_module("macro_placement_test"),
    }
    yield mods
    sys.path.remove(str(REFERENCE))
    for name in names:
        if saved[name] is not None:
            sys.modules[name] = saved[name]
        else:
            sys.modules.pop(name, None)


def test_grid_cells_and_canvas_size_match_reference(ref_modules):
    ref = ref_modules["layout_constraints"]
    import image_transformation_tpu.layout.canvas as ours

    rng = np.random.default_rng(0)
    for _ in range(25):
        ow = int(rng.integers(50, 4000))
        oh = int(rng.integers(50, 4000))
        ratio = f"{int(rng.integers(1, 30))}:{int(rng.integers(1, 30))}"
        assert ours.compute_canvas_size((ow, oh), ratio, verbose=False) == \
            ref.compute_canvas_size((ow, oh), ratio)
        margin = float(rng.uniform(0, 0.3))
        assert ours.grid_cells((ow, oh), margin) == ref.grid_cells((ow, oh), margin)


def test_baseline_assignments_and_finalize_match_reference(ref_modules):
    ref = ref_modules["layout_constraints"]
    import image_transformation_tpu.layout.legacy as ours

    for bundle in ("squarespace", "audio_book"):
        rj = f"data/{bundle}/results.json"
        ref_assign = ref.baseline_cell_assignments(rj)
        our_assign = ours.baseline_cell_assignments(rj)
        assert our_assign == ref_assign
        for align in ("center", "edge"):
            cells = ref.grid_cells((900, 700), 0.05)
            ref_fin = ref.finalize_layout(ref_assign, rj, (900, 700), cells, align)
            our_fin = ours.finalize_layout(our_assign, rj, (900, 700), cells, align)
            assert [(p.object_id, p.cell, tuple(p.box), p.scale) for p in our_fin] == \
                [(p.object_id, p.cell, tuple(p.box), p.scale) for p in ref_fin]


def test_pack_flow_matches_reference(ref_modules):
    ref = ref_modules["layout_constraints"]
    import image_transformation_tpu.layout.legacy as ours

    meta_ref = {1: ref.ObjectMeta(1, "a", "a", 200, 100), 2: ref.ObjectMeta(2, "b", "b", 120, 180)}
    meta_ours = {1: ours.ObjectMeta(1, "a", "a", 200, 100), 2: ours.ObjectMeta(2, "b", "b", 120, 180)}
    objs_ref = [meta_ref[1], meta_ref[2]]
    objs_ours = [meta_ours[1], meta_ours[2]]
    for params in ({"align": "center"}, {"align": "left", "orientation": "horizontal"},
                   {"orientation": "vertical", "global_spacing_px": 7}):
        pr, sr = ref.pack_flow(objs_ref, (600, 500), dict(params), meta_ref)
        po, so = ours.pack_flow(objs_ours, (600, 500), dict(params), meta_ours)
        assert sr == so
        assert [(p.object_id, p.cell, tuple(p.box), p.scale) for p in po] == \
            [(p.object_id, p.cell, tuple(p.box), p.scale) for p in pr]


def test_background_fills_match_reference(ref_modules):
    ref = ref_modules["background_resizing"]
    import background_resizing as ours  # our shim

    for bundle in ("squarespace", "audio_book"):
        bg = f"data/{bundle}/background.png"
        for size in ((64, 40), (257, 131)):
            rs = np.asarray(ref.fill_solid(bg, size))
            os_ = np.asarray(ours.fill_solid(bg, size))
            assert np.array_equal(rs, os_), (bundle, "solid", size)
            rg = np.asarray(ref.fill_gradient(bg, size))
            og = np.asarray(ours.fill_gradient(bg, size))
            diff = np.abs(rg.astype(int) - og.astype(int))
            # f32 lerp truncation boundaries may flip by 1 (documented)
            assert diff.max() <= 1, (bundle, "gradient", size, diff.max())


def test_nesting_conflicts_match_reference(ref_modules):
    ref_mpt = ref_modules["macro_placement_test"]
    from macro_placement_test import _compute_nesting_conflicts as ours_conflicts

    for bundle in ("squarespace", "audio_book"):
        rj = f"data/{bundle}/results.json"
        for canvas in ((369, 657), (985, 246), (492, 492)):
            for margin in (0.0, 0.05, 0.2):
                assert ours_conflicts(rj, canvas, margin) == \
                    ref_mpt._compute_nesting_conflicts(rj, canvas, margin)


def test_contact_sheet_matches_reference(ref_modules):
    ref_mpt = ref_modules["macro_placement_test"]
    from macro_placement_test import _build_labeled_contact_sheet as ours_sheet

    for bundle in ("squarespace", "audio_book"):
        rj = f"data/{bundle}/results.json"
        ref_img = np.asarray(ref_mpt._build_labeled_contact_sheet(f"data/{bundle}/objects", rj))
        our_img = np.asarray(ours_sheet(f"data/{bundle}/objects", rj))
        assert our_img.shape == ref_img.shape
        assert np.array_equal(our_img, ref_img), bundle
