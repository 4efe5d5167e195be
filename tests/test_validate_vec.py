"""Vectorized validator: device conflict masks + coverage bitsets.

Cross-checked against the host validator (layout/validate.py) — same
conflict arithmetic, same cross-child grouping semantics, same exact-once
coverage — and exercised under jit + vmap (margin sweeps as one program).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_transformation_tpu.core.bundle import load_bundle
from image_transformation_tpu.layout.solve import FlexProgram
from image_transformation_tpu.layout.validate import (
    compute_nesting_conflicts,
    validate_flex_dsl,
)
from image_transformation_tpu.layout.validate_vec import (
    conflict_masks,
    coverage_check,
    inner_extents,
    pair_structure,
    validate_program,
    validate_program_extents,
)
from image_transformation_tpu.layout.flex import FlexError


def _host_masks(labels, sizes, canvas, margin):
    """Index-space bool masks from the host label-pair lists."""
    row_bad, col_bad = compute_nesting_conflicts(labels, sizes, canvas, margin)
    n = len(labels)
    row = np.zeros((n, n), bool)
    col = np.zeros((n, n), bool)
    for pairs, mask in ((row_bad, row), (col_bad, col)):
        for a, b in pairs:
            i, j = labels.index(a), labels.index(b)
            mask[i, j] = mask[j, i] = True
    return row, col


def test_conflict_masks_match_host_on_bundles_and_random():
    rng = np.random.default_rng(11)
    cases = []
    for bundle_name in ("squarespace", "audio_book"):
        bundle = load_bundle(f"data/{bundle_name}")
        ids = bundle.object_ids()
        labels = [bundle.meta[oid].label for oid in ids]
        sizes = [tuple(bundle.sizes()[oid]) for oid in ids]
        cases.append((labels, sizes))
    for _ in range(6):
        n = int(rng.integers(2, 7))
        labels = [f"obj{i}" for i in range(n)]
        sizes = [(int(rng.integers(10, 900)), int(rng.integers(10, 900)))
                 for _ in range(n)]
        cases.append((labels, sizes))

    for labels, sizes in cases:
        for canvas in ((369, 657), (985, 246), (500, 500)):
            for margin in (0.0, 0.05, 0.2, float(rng.uniform(0, 0.3))):
                host_row, host_col = _host_masks(labels, sizes, canvas, margin)
                dev_row, dev_col = conflict_masks(
                    jnp.asarray(np.asarray(sizes, np.int32)), canvas, margin
                )
                assert np.array_equal(np.asarray(dev_row), host_row), (
                    labels, canvas, margin)
                assert np.array_equal(np.asarray(dev_col), host_col), (
                    labels, canvas, margin)


def test_conflict_masks_bit_exact_campaign():
    """Strict mask equality vs the host validator across 220 random
    canvas/margin/size draws INCLUDING engineered truncation boundaries
    (VERDICT r2 item 4: the old f32 path carried a <=1px envelope; the
    host-f64-extents + int32-mask split must carry none)."""
    rng = np.random.default_rng(7)
    trials = 0
    while trials < 220:
        n = int(rng.integers(2, 8))
        labels = [f"o{i}" for i in range(n)]
        canvas = (int(rng.integers(50, 4000)), int(rng.integers(50, 4000)))
        kind = trials % 3
        if kind == 0:
            margin = float(rng.uniform(0, 0.45))
        elif kind == 1:
            # decimal margins whose f64 products sit near integers
            margin = float(rng.choice([0.01, 0.05, 0.07, 0.1, 0.125, 0.2]))
        else:
            # engineered boundary: margin*W exactly representable-ish so
            # int() truncation direction is the whole story
            k = int(rng.integers(1, 20))
            margin = k / (2.0 * canvas[0])
        inner = inner_extents(canvas, margin)
        # half the draws sit sizes ON the single/pair-sum thresholds
        sizes = []
        for i in range(n):
            if rng.random() < 0.5:
                base = int(inner[0 if rng.random() < 0.5 else 1])
                sizes.append((
                    max(1, base + int(rng.integers(-1, 2))),
                    max(1, base // 2 + int(rng.integers(-1, 2))),
                ))
            else:
                sizes.append((int(rng.integers(1, 2000)),
                              int(rng.integers(1, 2000))))
        host_row, host_col = _host_masks(labels, sizes, canvas, margin)
        dev_row, dev_col = conflict_masks(
            jnp.asarray(np.asarray(sizes, np.int32)), canvas, margin
        )
        assert np.array_equal(np.asarray(dev_row), host_row), (
            sizes, canvas, margin)
        assert np.array_equal(np.asarray(dev_col), host_col), (
            sizes, canvas, margin)
        trials += 1


def test_inner_extents_requires_concrete_values():
    """Traced canvas/margin must fail loudly with the sweep guidance, not
    silently re-quantize in f32."""
    with pytest.raises(TypeError, match="concrete"):
        jax.jit(lambda m: inner_extents((100, 100), m))(0.05)


def test_pair_structure_governing_directions():
    """Leaves under different root entries are governed by the root's
    direction; leaves sharing a level-1 container by that container's."""
    root = {"type": "flex", "direction": "row", "children": [
        {"object_id": 1, "name": "a"},
        {"type": "flex", "direction": "column", "children": [
            {"object_id": 2, "name": "b"},
            {"object_id": 3, "name": "c"},
        ]},
    ]}
    prog = FlexProgram.from_dsl(root)
    gov_is_row, checked = pair_structure(prog)
    idx = {int(oid): k for k, oid in enumerate(prog.obj_ids)}
    a, b, c = idx[1], idx[2], idx[3]
    assert checked[a, b] and checked[b, c] and checked[a, c]
    assert gov_is_row[a, b] and gov_is_row[a, c]  # cross-entry -> root (row)
    assert not gov_is_row[b, c]  # shared column container


def test_validate_program_matches_host_validator():
    """The grouping case the host validator rejects is flagged with the
    same pair count; a clean layout passes both."""
    labels = {1: "logo", 2: "photo"}
    sizes = np.array([[300, 60], [340, 200]], np.int32)  # wide pair
    canvas, margin = (500, 500), 0.05
    root = {"type": "flex", "direction": "row", "children": [
        {"object_id": 1, "name": "logo"},
        {"type": "flex", "direction": "column",
         "children": [{"object_id": 2, "name": "photo"}]},
    ]}
    row_bad, col_bad = compute_nesting_conflicts(
        ["logo", "photo"], [tuple(s) for s in sizes], canvas, margin
    )
    assert ("logo", "photo") in row_bad  # 300+340+gap > 450

    with pytest.raises(FlexError, match="non-nestable pair via grouping"):
        validate_flex_dsl(
            {"root": root}, [1, 2], labels,
            row_bad_pairs={frozenset(p) for p in row_bad},
            col_bad_pairs={frozenset(p) for p in col_bad},
        )

    prog = FlexProgram.from_dsl(root)
    # row order in prog follows DSL order; obj_wh rows must match
    obj_wh = jnp.asarray(sizes)
    res = validate_program(prog, obj_wh, canvas, margin, jnp.asarray([1, 2]))
    assert bool(res["covered"])
    assert int(res["n_row_violations"]) == 1
    assert int(res["n_col_violations"]) == 0
    assert not bool(res["ok"])

    # a column root has no row constraint to violate here
    root_col = dict(root, direction="column")
    res2 = validate_program(
        FlexProgram.from_dsl(root_col), obj_wh, canvas, margin,
        jnp.asarray([1, 2]),
    )
    assert int(res2["n_row_violations"]) == 0
    assert bool(res2["ok"]) == (int(res2["n_col_violations"]) == 0)


def test_coverage_bitsets():
    ids = jnp.asarray([1, 2, 3])
    valid = jnp.asarray([True, True, True])
    ok = coverage_check(ids, valid, jnp.asarray([1, 2, 3]))
    assert bool(ok["covered"]) and int(ok["missing"]) == 0

    dup = coverage_check(jnp.asarray([1, 2, 2]), valid, jnp.asarray([1, 2, 3]))
    assert not bool(dup["covered"])
    assert int(dup["duplicates"]) == 1 and int(dup["missing"]) == 1

    unk = coverage_check(jnp.asarray([1, 2, 9]), valid, jnp.asarray([1, 2, 3]))
    assert not bool(unk["covered"]) and int(unk["unknown"]) == 1

    # padding rows (valid False) never count
    padded = coverage_check(
        jnp.asarray([1, 2, 3, 0]), jnp.asarray([True, True, True, False]),
        jnp.asarray([1, 2, 3]),
    )
    assert bool(padded["covered"])


def test_validate_program_vmaps_over_margin_sweep():
    """One compiled validator checks every margin variant; counts match the
    per-margin host conflict computation."""
    bundle = load_bundle("data/audio_book")
    ids = bundle.object_ids()
    labels = [bundle.meta[oid].label for oid in ids]
    root = {"type": "flex", "direction": "row", "children": [
        {"object_id": oid, "name": bundle.meta[oid].label} for oid in ids
    ]}
    prog = FlexProgram.from_dsl(root)
    sizes = [tuple(bundle.sizes()[oid]) for oid in ids]
    obj_wh = jnp.asarray(np.asarray(sizes, np.int32))
    canvas = (985, 246)
    margins = np.asarray([0.0, 0.05, 0.1, 0.2, 0.3], np.float32)
    required = jnp.asarray(ids)

    # quantization host-side (exact f64), int program vmapped over the table
    extents = inner_extents(canvas, margins)

    @jax.jit
    def sweep(ext):
        return jax.vmap(
            lambda e: validate_program_extents(prog, obj_wh, e, required)
        )(ext)

    res = sweep(jnp.asarray(extents))
    assert res["n_row_violations"].shape == (len(margins),)
    for k, margin in enumerate(margins):
        host_row, _ = _host_masks(labels, sizes, canvas, float(margin))
        # root is a row of distinct entries: every bad pair violates once
        expect = int(np.triu(host_row, k=1).sum())
        assert int(res["n_row_violations"][k]) == expect, margin
        assert bool(res["covered"][k])
