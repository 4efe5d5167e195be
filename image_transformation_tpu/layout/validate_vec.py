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
(`pair_structure`), while canvas size, margin, and object sizes stay
traced (`conflict_masks`, `validate_program`) — one compiled validator
re-checks a layout for any variant, and a margin sweep is one vmap.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax.numpy as jnp

from .solve import DIR_ROW, FlexProgram


def conflict_masks(
    obj_wh: jnp.ndarray,
    canvas_wh,
    margin_pct,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise nesting-conflict masks from sizes (traced).

    Device replica of validate.compute_nesting_conflicts
    (reference macro_placement_test.py:587-634): pair (i, j) cannot share a
    row when either width fills the margin-inset canvas or their sum plus
    the minimum gap overflows it; heights dual for columns.

    obj_wh: int32 [N, 2] (w, h); canvas_wh: (W, H) traced ints;
    margin_pct: traced float. Returns (row_bad, col_bad) bool [N, N]
    (symmetric, diagonal False).
    """
    # Precision note: the host computes margin*w and 0.01*min(w,h) in
    # float64; this traced replica uses float32 (x64 stays off on TPU).
    # When the true product lies within ~1e-5 of an integer the trailing
    # truncation can land one pixel apart between the two (and the host's
    # own f64 representation of decimals like 0.07 already truncates
    # "intended" integers down) — so the inner extents carry a documented
    # <=1px boundary envelope vs compute_nesting_conflicts. Away from
    # exact boundaries the masks are identical (pinned by tests).
    W = jnp.asarray(canvas_wh[0], jnp.int32)
    H = jnp.asarray(canvas_wh[1], jnp.int32)
    m = jnp.asarray(margin_pct, jnp.float32)
    inner_w = jnp.maximum(
        1, (W.astype(jnp.float32) - 2.0 * (m * W.astype(jnp.float32)))
        .astype(jnp.int32)
    )
    inner_h = jnp.maximum(
        1, (H.astype(jnp.float32) - 2.0 * (m * H.astype(jnp.float32)))
        .astype(jnp.int32)
    )
    min_gap = jnp.maximum(
        8,
        (jnp.minimum(W, H).astype(jnp.float32) * 0.01).astype(jnp.int32),
    )

    w = obj_wh[:, 0].astype(jnp.int32)
    h = obj_wh[:, 1].astype(jnp.int32)

    def axis_bad(extent, inner):
        single = extent >= inner
        pair_sum = extent[:, None] + extent[None, :] + min_gap
        bad = single[:, None] | single[None, :] | (pair_sum > inner)
        n = extent.shape[0]
        return bad & ~jnp.eye(n, dtype=bool)

    return axis_bad(w, inner_w), axis_bad(h, inner_h)


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


def validate_program(
    prog: FlexProgram,
    obj_wh: jnp.ndarray,
    canvas_wh,
    margin_pct,
    required_ids: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Full device-side validation of one program variant (traced).

    Combines the traced conflict masks with the program's static pair
    topology and the coverage bitset. Returns scalar device values:
    ``ok``, ``covered``, ``n_row_violations``, ``n_col_violations`` (each
    unordered violating pair counted once, as the host validator reports
    them). vmap over (canvas_wh, margin_pct) for sweep validation, or over
    obj_wh for size variants.
    """
    row_bad, col_bad = conflict_masks(obj_wh, canvas_wh, margin_pct)
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
