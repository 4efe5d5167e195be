"""Vectorized constraint validator: conflict masks + coverage bitsets.

Device-side replica of the host validator's *data* checks
(layout/validate.py; reference anchors macro_placement_test.py:388-634):
the structural walk (types, whitelists, sanitize stripping) stays host-side
where the DSL dict lives, but everything that depends on *sizes* — the
pairwise nesting-conflict precomputation and the cross-child conflict
check — plus the object-id coverage test is pure integer arithmetic here,
computable under jit and vmappable over canvas/margin/size variants
(SURVEY.md §2.7 "vectorized constraint validator" row; pairs with
layout/solve.solve_program which vmaps the same FlexProgram).

Layout structure is static per program, so the pair topology (which
container direction governs each leaf pair) is precomputed once on host
(`pair_structure`); object sizes stay traced. The margin->inner-extent
quantization is BIT-EXACT vs the host validator by construction: the
host computes it in Python float64 with trailing `int()` truncation
(validate.py:346-349), so :func:`inner_extents` replicates exactly that
in host numpy f64 — sweep margins are concrete host values anyway — and
the device side (:func:`conflict_masks_from_extents`) is pure int32
arithmetic with no float rounding to diverge. A margin sweep
precomputes its extents table once and vmaps the int program over it.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax.numpy as jnp

from .solve import DIR_ROW, FlexProgram


def inner_extents(canvas_wh, margin_pct) -> np.ndarray:
    """Margin-inset extents `[inner_w, inner_h, min_gap]`, int32 — the
    EXACT host quantization of validate.compute_nesting_conflicts
    (reference macro_placement_test.py:587-634): IEEE-double products with
    trailing truncation toward zero, so device masks built from these are
    bit-identical to the host validator's, boundary cases included.

    Host-side numpy (requires concrete values). Broadcasts: pass a margin
    array of shape [K] to get a [K, 3] table for a sweep, then vmap
    :func:`conflict_masks_from_extents` / :func:`validate_program_extents`
    over its rows.
    """
    try:
        w = np.asarray(canvas_wh[0], np.float64)
        h = np.asarray(canvas_wh[1], np.float64)
        m = np.asarray(margin_pct, np.float64)
    except Exception as e:  # jax tracers refuse np conversion
        raise TypeError(
            "inner_extents needs concrete canvas/margin values (the "
            "quantization contract is host float64); for traced sweeps "
            "precompute the extents table host-side and vmap "
            "conflict_masks_from_extents / validate_program_extents over it"
        ) from e
    inner_w = np.maximum(1, (w - 2.0 * (m * w)).astype(np.int64))
    inner_h = np.maximum(1, (h - 2.0 * (m * h)).astype(np.int64))
    min_gap = np.maximum(8, (np.minimum(w, h) * 0.01).astype(np.int64))
    return np.stack(
        np.broadcast_arrays(inner_w, inner_h, min_gap), axis=-1
    ).astype(np.int32)


def conflict_masks_from_extents(
    obj_wh: jnp.ndarray,
    extents: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise nesting-conflict masks from sizes + precomputed extents
    (traced, pure int32 — bit-exact vs the host validator).

    Pair (i, j) cannot share a row when either width fills the
    margin-inset canvas or their sum plus the minimum gap overflows it;
    heights dual for columns (reference macro_placement_test.py:587-634).

    obj_wh: int32 [N, 2] (w, h); extents: int32 [3] from
    :func:`inner_extents` (traced or concrete — the arithmetic is
    integer-only either way). Returns (row_bad, col_bad) bool [N, N]
    (symmetric, diagonal False).
    """
    extents = jnp.asarray(extents, jnp.int32)
    inner_w, inner_h, min_gap = extents[0], extents[1], extents[2]
    w = obj_wh[:, 0].astype(jnp.int32)
    h = obj_wh[:, 1].astype(jnp.int32)

    def axis_bad(extent, inner):
        single = extent >= inner
        pair_sum = extent[:, None] + extent[None, :] + min_gap
        bad = single[:, None] | single[None, :] | (pair_sum > inner)
        n = extent.shape[0]
        return bad & ~jnp.eye(n, dtype=bool)

    return axis_bad(w, inner_w), axis_bad(h, inner_h)


def conflict_masks(
    obj_wh: jnp.ndarray,
    canvas_wh,
    margin_pct,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper: host-exact extents + the traced int masks.

    canvas_wh / margin_pct must be concrete (see :func:`inner_extents`);
    obj_wh may be traced.
    """
    return conflict_masks_from_extents(
        obj_wh, inner_extents(canvas_wh, margin_pct)
    )


def pair_structure(prog: FlexProgram) -> Tuple[np.ndarray, np.ndarray]:
    """Static pair topology of a program: (pair_is_row [N, N] bool,
    pair_checked [N, N] bool).

    For two distinct leaves the governing container is the root when they
    sit under different root entries (a bad pair split across groups still
    violates — the reference's cross-child cartesian check), or their
    shared level-1 container otherwise; ``pair_is_row`` holds that
    container's direction. Host numpy — the structure is static per
    program, only sizes are traced.
    """
    pe = np.asarray(prog.obj_parent_entry)
    pc = np.asarray(prog.obj_parent_cont)
    valid = (pe >= 0) | (pc >= 0)
    n = len(pe)

    # entry index of each object (its own entry, or its container's entry)
    ent_of_cont = np.zeros(len(prog.cont_dir), np.int64)
    for e, (is_c, ref) in enumerate(zip(prog.entry_is_container, prog.entry_ref)):
        if is_c and ref >= 0:
            ent_of_cont[ref] = e
    entry = np.where(pe >= 0, pe, ent_of_cont[np.maximum(pc, 0)])

    same_entry = entry[:, None] == entry[None, :]
    same_cont = (pc[:, None] == pc[None, :]) & (pc[:, None] >= 0)
    gov_is_row = np.where(
        same_entry & same_cont,
        (np.asarray(prog.cont_dir)[np.maximum(pc, 0)] == DIR_ROW)[:, None],
        prog.root_dir == DIR_ROW,
    )
    checked = (
        valid[:, None] & valid[None, :] & ~np.eye(n, dtype=bool)
    )
    return gov_is_row, checked


def coverage_check(
    obj_ids: jnp.ndarray,
    obj_valid: jnp.ndarray,
    required_ids: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Exact-once coverage as bitset arithmetic (traced).

    obj_ids: int32 [N] (program rows; padding rows have valid False);
    required_ids: int32 [M]. Returns scalars: ``covered`` (every required
    id appears exactly once), ``duplicates``, ``missing``, ``unknown``
    (valid rows whose id is not required).
    """
    obj_ids = jnp.asarray(obj_ids, jnp.int32)
    required = jnp.asarray(required_ids, jnp.int32)
    valid = jnp.asarray(obj_valid, bool)
    hits = (obj_ids[:, None] == required[None, :]) & valid[:, None]  # [N, M]
    counts = jnp.sum(hits, axis=0)  # per required id
    missing = jnp.sum(counts == 0)
    duplicates = jnp.sum(jnp.maximum(counts - 1, 0))
    unknown = jnp.sum(valid & ~jnp.any(hits, axis=1))
    covered = (missing == 0) & (duplicates == 0) & (unknown == 0)
    return {
        "covered": covered,
        "missing": missing,
        "duplicates": duplicates,
        "unknown": unknown,
    }


def validate_program_extents(
    prog: FlexProgram,
    obj_wh: jnp.ndarray,
    extents: jnp.ndarray,
    required_ids: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Full device-side validation of one program variant (traced).

    Combines the traced conflict masks with the program's static pair
    topology and the coverage bitset. Returns scalar device values:
    ``ok``, ``covered``, ``n_row_violations``, ``n_col_violations`` (each
    unordered violating pair counted once, as the host validator reports
    them). vmap over extents rows for canvas/margin sweeps, or over
    obj_wh for size variants — bit-exact vs the host validator either way
    (the masks are integer-only; see :func:`inner_extents`).
    """
    row_bad, col_bad = conflict_masks_from_extents(obj_wh, extents)
    gov_is_row, checked = pair_structure(prog)
    gov_is_row = jnp.asarray(gov_is_row)
    upper = jnp.asarray(np.triu(checked, k=1))
    row_viol = upper & gov_is_row & row_bad
    col_viol = upper & ~gov_is_row & col_bad
    valid = jnp.asarray(
        (np.asarray(prog.obj_parent_entry) >= 0)
        | (np.asarray(prog.obj_parent_cont) >= 0)
    )
    cov = coverage_check(jnp.asarray(prog.obj_ids), valid, required_ids)
    n_row = jnp.sum(row_viol)
    n_col = jnp.sum(col_viol)
    return {
        "ok": cov["covered"] & (n_row == 0) & (n_col == 0),
        "covered": cov["covered"],
        "missing": cov["missing"],
        "duplicates": cov["duplicates"],
        "unknown": cov["unknown"],
        "n_row_violations": n_row,
        "n_col_violations": n_col,
    }


def validate_program(
    prog: FlexProgram,
    obj_wh: jnp.ndarray,
    canvas_wh,
    margin_pct,
    required_ids: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Convenience wrapper of :func:`validate_program_extents` for one
    concrete canvas/margin (the quantization happens host-side; see
    :func:`inner_extents` for the traced-sweep form)."""
    return validate_program_extents(
        prog, obj_wh, inner_extents(canvas_wh, margin_pct), required_ids
    )
