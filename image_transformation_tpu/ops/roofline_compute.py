"""Compute-side roofline (the MFU analogue) for the solid-render pass.

Round 3 anchored the HBM side (:mod:`.roofline`: model bytes / measured
wall vs the chip's public bandwidth peak — 18.9% on the r3 headline, so
the pass is NOT bandwidth bound). This module anchors the other two
units so the kernel-compute floor is falsifiable too (VERDICT r3 item
2): it models per-object-step **MXU MACs** (the s8 limb dots) and **VPU
ops** (the coeff-table scaffold, resample epilogues, and the packed
blend) and reports achieved-vs-peak for both next to
``hbm_utilization`` in ``bench.py``'s JSON.

The op counts are NOT hand-maintained constants: each kernel stage is
mirrored as a small PURE function built from the kernel's own helpers
(``_coeff_table_in_kernel``, ``_limb_dot_i8``, ``_alpha_over_packed``,
``_premultiply2d`` — compose_pallas.py), traced with
``jax.make_jaxpr``, and the jaxpr primitives are counted by category.
When the kernel changes, the traced counts follow; only the two pure
mirrors of ref-writing bodies (the V-tile epilogue and the blend row
scaffold) can drift and each cites the kernel lines it mirrors.

Counting conventions (documented, deliberately simple):

* ``dot_general`` -> MXU MACs = out_elements x contraction length.
* reductions -> input elements (one pass).
* data movement (broadcast/reshape/slice/pad/concat/transpose/roll)
  -> output elements, tallied SEPARATELY as ``move_ops`` (lane
  moves/copies occupy VPU issue slots but aren't arithmetic; both the
  split and the total are reported so the model can't hide in the
  definition).
* everything else (elementwise arithmetic, compares, selects, converts,
  iota) -> output elements into ``vpu_ops``.

Peaks: MXU from the public per-chip TOPS (Google Cloud TPU docs — v5e
197 bf16 TFLOPs / 394 int8 TOPS => 98.7e12 / 197.3e12 MACs/s). The VPU
has no headline public number; its peak here is derived as
``cores x (8 x 128) lanes x 4 ALUs x clock`` with the clock recovered
from the bf16 MXU peak (cores x 4 MXUs x 128x128 x 2 FLOPs x clock =
public TFLOPs: v5e 1 core -> 1.50 GHz, v4 2 cores -> 1.05 GHz, v5p 2
cores -> 1.75 GHz — the latter two match the published clocks, which
is the sanity check on the derivation). The VPU/MXU shape model
follows the public "How to Scale Your Model" hardware chapter.

Utilization semantics: ``t_unit = model_work / unit_peak`` is the time
that unit would need at speed-of-light; ``utilization = t_unit /
measured_wall``. If every utilization is far below 1 the kernel is
issue/latency bound, not unit bound — that conclusion (not a bigger
number) is what re-ranks the remaining kernel levers (ROADMAP b/c/d).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------- counting


_MOVE_PRIMS = frozenset({
    "broadcast_in_dim", "reshape", "slice", "squeeze", "expand_dims",
    "pad", "concatenate", "transpose", "dynamic_slice",
    "dynamic_update_slice", "copy", "rev", "gather", "roll",
})
_REDUCE_PRIMS = frozenset({
    "reduce_sum", "reduce_max", "reduce_min", "reduce_and", "reduce_or",
    "reduce_prod", "argmax", "argmin",
})
_FREE_PRIMS = frozenset({
    "stop_gradient", "convert_element_type_p__noop",  # placeholder
})


def _size(aval) -> float:
    return float(np.prod(aval.shape)) if aval.shape else 1.0


def count_jaxpr_ops(closed_jaxpr) -> Dict[str, float]:
    """Categorized op counts for a closed jaxpr (recurses into pjit and
    custom-call wrappers; control-flow prims are rejected — trace loop
    BODIES and multiply by host-computed trip counts instead, which is
    exactly how the per-chunk aggregation below works)."""
    counts = {"mxu_macs": 0.0, "vpu_ops": 0.0, "move_ops": 0.0}

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            if name in ("scan", "while", "cond"):
                raise ValueError(
                    f"control-flow primitive {name!r} in a stage mirror — "
                    "trace the body and multiply by the trip count instead"
                )
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:  # jit/pjit/closed_call/custom_* wrappers
                walk(inner.jaxpr if hasattr(inner, "jaxpr") else inner)
                continue
            if name in _FREE_PRIMS:
                continue
            out_elems = sum(_size(v.aval) for v in eqn.outvars)
            if name == "dot_general":
                dims = eqn.params["dimension_numbers"]
                (lc, _), _ = dims
                lhs = eqn.invars[0].aval.shape
                k = float(np.prod([lhs[d] for d in lc])) if lc else 1.0
                counts["mxu_macs"] += out_elems * k
            elif name in _REDUCE_PRIMS:
                counts["vpu_ops"] += sum(_size(v.aval) for v in eqn.invars)
            elif name in _MOVE_PRIMS:
                counts["move_ops"] += out_elems
            else:
                counts["vpu_ops"] += out_elems
        return counts

    return walk(closed_jaxpr.jaxpr)


def _trace_counts(fn, *avals) -> Dict[str, float]:
    import jax

    return count_jaxpr_ops(jax.make_jaxpr(fn)(*avals))


# ------------------------------------------------------- kernel stage mirrors


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=128)
def _stage_counts(
    ph_k: int, pw_k: int, mh_a: int, mw_a: int, MW: int,
    method: str, int8: bool, blend_rows: int,
) -> Dict[str, Dict[str, float]]:
    """Traced op counts for every per-step stage at one static-shape key.

    Stages mirror the gen-3 pipelined kernel
    (compose_pallas._make_fused_kernel_v3_pipelined and the helpers it
    calls); each entry names the kernel code it counts.
    """
    import jax
    import jax.numpy as jnp

    from . import compose_pallas as cp

    f32 = jnp.float32
    i32 = jnp.int32
    s = jax.ShapeDtypeStruct
    img_dt = jnp.int8 if int8 else jnp.bfloat16
    scalar = s((), i32)

    def dot(img, kc, ci, ck, k_first, colsum=None, k_limbs=None):
        if int8:
            return cp._limb_dot_i8(img, kc, ci, ck, k_first=k_first,
                                   img_colsum=colsum, k_limbs=k_limbs)
        return cp._limb_dot(img, kc, ci, ck, k_first=k_first)

    # H pass, one 128-wide output chunk (_resample_chunked_into.h_chunk):
    # in-kernel table over (128, pw_k) + 3 limb dots + quantize epilogue
    # (the s8 path stores the intermediate already centered — item 29)
    def h_chunk(prem, cs, in_w, out_w, off):
        kh_c = cp._coeff_table_in_kernel(
            in_w, out_w, 128, pw_k, method, False, o_offset=off,
        )
        ss = dot(prem, kh_c, 1, 1, False, cs if int8 else None) + cp._HALF
        if int8:
            return (cp._clip8(ss) - 128).astype(jnp.int8)
        return cp._clip8(ss).astype(jnp.bfloat16)

    h = _trace_counts(
        h_chunk,
        s((4 * ph_k, pw_k), img_dt), s((4 * ph_k,), i32),
        scalar, scalar, scalar,
    )

    # per-step colsum over the contracted axis (shared by all H chunks)
    colsum = (
        _trace_counts(
            lambda p: jnp.sum(p.astype(i32), axis=1),
            s((4 * ph_k, pw_k), img_dt),
        )
        if int8
        else {"mxu_macs": 0.0, "vpu_ops": 0.0, "move_ops": 0.0}
    )

    # V pass coefficient table, one 128-tall chunk — plus, on the s8
    # path, the hoisted per-chunk limb split + table rowsum (STATUS
    # item 31: computed once per v_chunk, shared by every (channel,
    # tile) dot; item 34 folded the three limb rowsums into one)
    def v_table_stage(in_h, out_h, off):
        kv_c = cp._coeff_table_in_kernel(
            in_h, out_h, 128, ph_k, method, True, o_offset=off
        )
        return cp._split_limbs_i8(kv_c, 0) if int8 else kv_c

    v_table = _trace_counts(v_table_stage, scalar, scalar, scalar)

    # V pass, one 128x128 tile: 4 channels x 3 limb dots + the
    # unpremultiply/pack epilogue — pure mirror of
    # _resample_chunked_into.v_chunk.v_tile (the s8 intermediate arrives
    # pre-centered from the H pass, item 29; the table's limbs arrive
    # pre-split from the v_table stage, item 31)
    def v_tile(tmp4, kv_c, hi8, mid8, lo8, rs_k):
        limbs = (hi8, mid8, lo8, rs_k) if int8 else None
        chans = []
        for c4 in range(4):
            t = tmp4[c4]
            chans.append(
                cp._clip8(dot(t, kv_c, 0, 0, True, k_limbs=limbs) + cp._HALF)
            )
        resized_p = jnp.stack(chans, axis=0)
        ra = resized_p[3]
        rgb = jnp.minimum(
            255,
            cp._exact_div_i32(255 * resized_p[:3], jnp.maximum(ra, 1)[None]),
        )
        rgb = jnp.where((ra == 0)[None], resized_p[:3], rgb)
        return rgb[0] | (rgb[1] << 8) | (rgb[2] << 16) | (ra << 24)

    i8 = jnp.int8
    vt = _trace_counts(
        v_tile, s((4, ph_k, 128), img_dt), s((ph_k, 128), i32),
        s((ph_k, 128), i8), s((ph_k, 128), i8), s((ph_k, 128), i8),
        s((128,), i32),
    )

    # blend: masked source write over (mh_a, mw_a)
    # (_blend_window_rows src_shift store, compose_pallas.py:2756-2760)
    def blend_mask(pk, out_h, out_w):
        row_i = jax.lax.broadcasted_iota(i32, (mh_a, mw_a), 0)
        col_i = jax.lax.broadcasted_iota(i32, (mh_a, mw_a), 1)
        return jnp.where((row_i < out_h) & (col_i < out_w), pk, 0)

    bm = _trace_counts(blend_mask, s((mh_a, mw_a), i32), scalar, scalar)

    # blend: one row chunk — shift-slice + roll + lane mask + packed
    # alpha-over (_blend_window_rows.blend_rows, compose_pallas.py:2767-2786;
    # jnp.roll stands in for pltpu.roll, same category/size)
    C = blend_rows

    def blend_chunk(tall, win_rows, dx, d):
        rows = jax.lax.dynamic_slice_in_dim(tall, d, C, 0)
        rolled = jnp.roll(
            jnp.pad(rows, ((0, 0), (0, MW - mw_a))), dx, axis=1
        )
        lane = jax.lax.broadcasted_iota(i32, (C, MW), 1)
        src_c = jnp.where(lane >= dx, rolled, 0)
        return cp._alpha_over_packed(win_rows, src_c)

    bc = _trace_counts(
        blend_chunk, s((C + 8, mw_a), i32), s((C, MW), i32), scalar, scalar
    )

    # identity fast path: pad + pack into the blend source
    # (_identity_pack_into, compose_pallas.py)
    ch = min(ph_k, mh_a)
    cw = min(pw_k, mw_a)

    def identity(obj):
        ident = jnp.pad(
            obj.astype(i32)[:, :ch, :cw],
            ((0, 0), (0, mh_a - ch), (0, mw_a - cw)),
        )
        return ident[0] | (ident[1] << 8) | (ident[2] << 16) | (ident[3] << 24)

    ident_c = _trace_counts(identity, s((4, ph_k, pw_k), jnp.uint8))

    # shared-object premultiply, once per grid step (STATUS items 25/28)
    prem_c = _trace_counts(
        lambda o: cp._premultiply2d(o.astype(i32), ph_k, pw_k,
                                    centered_s8=int8),
        s((4, ph_k, pw_k), jnp.uint8),
    )

    return {
        "h_chunk": h, "colsum": colsum, "v_table": v_table, "v_tile": vt,
        "blend_mask": bm, "blend_chunk": bc, "identity": ident_c,
        "prem": prem_c,
    }


def _add(into: Dict[str, float], counts: Dict[str, float], times: float):
    for key in ("mxu_macs", "vpu_ops", "move_ops"):
        into[key] += counts[key] * times


def solid_render_compute_per_batch(
    obj_hw: np.ndarray,  # [N, 2] true asset sizes
    boxes: np.ndarray,  # [B, N, 4] the realized placement boxes
    canvas_hw: Tuple[int, int],
    obj_pad_hw: Tuple[int, int],
    static_obj_hw: Optional[Sequence[Tuple[int, int]]] = None,
    method: str = "lanczos",
    int8: Optional[bool] = None,
) -> Dict[str, float]:
    """Model MXU MACs / VPU ops / move ops one batched solid-render
    dispatch performs, aggregated from the realized per-(b, k) geometry
    (host mirror of ``_fused_v3_meta``'s size clamps — the chunk counts
    are data dependent, so the model consumes the same boxes the bench
    dispatches)."""
    from . import compose_pallas as cp

    if int8 is None:
        int8 = cp.INT8_DOTS
    B, N = boxes.shape[0], boxes.shape[1]
    ph_a = _round_up(int(obj_pad_hw[0]), 8)
    pw_a = _round_up(int(obj_pad_hw[1]), 128)
    mh_a, mw_a = ph_a, pw_a  # bench convention: out_max = padded asset env
    MH, MW = cp.window_extents((mh_a, mw_a))
    C = cp._BLEND_CHUNK_ROWS
    h_c, w_c = canvas_hw

    boxes = np.asarray(boxes)
    x1, y1 = boxes[..., 0], boxes[..., 1]
    out_w = np.minimum(np.maximum(1, boxes[..., 2] - x1), MW - 128)
    out_h = np.minimum(np.maximum(1, boxes[..., 3] - y1), MH - 8)
    in_h = np.broadcast_to(np.asarray(obj_hw)[None, :, 0], (B, N))
    in_w = np.broadcast_to(np.asarray(obj_hw)[None, :, 1], (B, N))
    same = (out_w == in_w) & (out_h == in_h)
    valid = ~((x1 < 0) | (y1 < 0) | (x1 >= w_c) | (y1 >= h_c))
    dy = np.clip(y1, 0, h_c) % 8  # in-window row offset (origin quantize)

    total = {"mxu_macs": 0.0, "vpu_ops": 0.0, "move_ops": 0.0}
    stages: Dict[str, Dict[str, float]] = {}

    def add(stage: str, counts: Dict[str, float], times: float) -> None:
        _add(total, counts, times)
        bucket = stages.setdefault(
            stage, {"mxu_macs": 0.0, "vpu_ops": 0.0, "move_ops": 0.0}
        )
        _add(bucket, counts, times)

    for k in range(N):
        if static_obj_hw is not None:
            hk, wk = static_obj_hw[k]
            ph_k = min(_round_up(max(int(hk), 1), 8), ph_a)
            pw_k = min(_round_up(max(int(wk), 1), 128), pw_a)
        else:
            ph_k, pw_k = ph_a, pw_a
        st = _stage_counts(ph_k, pw_k, mh_a, mw_a, MW, method, int8, C)

        v = valid[:, k]
        sm = same[:, k] & v
        ns = v & ~sm
        ch_w = np.ceil(out_w[:, k] / 128.0)
        ch_h = np.ceil(out_h[:, k] / 128.0)
        # resample (non-identity steps only)
        add("h_chunk", st["h_chunk"], float(np.sum(ch_w[ns])))
        add("colsum", st["colsum"], float(np.sum(ns)))
        add("v_table", st["v_table"], float(np.sum(ch_h[ns])))
        add("v_tile", st["v_tile"], float(np.sum((ch_h * ch_w)[ns])))
        # identity packs
        add("identity", st["identity"], float(np.sum(sm)))
        # blend: every valid step masks the source and walks the occupied
        # row chunks (tail chunk counted as a full one — upper bound)
        rows_end = np.minimum(dy[:, k] + out_h[:, k], MH)
        chunks = np.ceil(rows_end / C) - np.floor(dy[:, k] / C)
        add("blend_mask", st["blend_mask"], float(np.sum(v)))
        add("blend_chunk", st["blend_chunk"], float(np.sum(chunks[v])))
        # shared-object premultiply: once per grid step (= per object)
        add("prem", st["prem"], 1.0)

    total["total_ops"] = total["vpu_ops"] + total["move_ops"]
    total["stages"] = stages  # per-stage breakdown for lever ranking
    return total


# ------------------------------------------------------------------- peaks

# Public per-chip MXU peaks in MACs/s by (device_kind, dtype), from the
# Google Cloud TPU system-architecture pages (TFLOPs/TOPS are 2 x MACs):
# v4 275 bf16 / 275 int8; v5e 197 / 394; v5p 459 / 918; v6e 918 / 1836.
MXU_PEAK_MACS = {
    "TPU v4": {"bf16": 137.5e12, "int8": 137.5e12},
    "TPU v5 lite": {"bf16": 98.65e12, "int8": 197.3e12},
    "TPU v5e": {"bf16": 98.65e12, "int8": 197.3e12},
    "TPU v5": {"bf16": 229.5e12, "int8": 459.0e12},
    "TPU v5p": {"bf16": 229.5e12, "int8": 459.0e12},
    "TPU v6 lite": {"bf16": 459.0e12, "int8": 918.0e12},
    "TPU v6e": {"bf16": 459.0e12, "int8": 918.0e12},
}

# VPU peak ops/s: cores x (8 x 128) lanes x 4 ALUs x clock, with the
# clock recovered from the bf16 MXU peak (cores x 4 MXUs x 128 x 128 x 2
# x clock) — v4 -> 1.05 GHz and v5p -> 1.75 GHz match the published
# clocks, validating the derivation; v5e (1 core) -> 1.50 GHz.
VPU_PEAK_OPS = {
    "TPU v4": 2 * 4096 * 1.05e9,
    "TPU v5 lite": 4096 * 1.50e9,
    "TPU v5e": 4096 * 1.50e9,
    "TPU v5": 2 * 4096 * 1.75e9,
    "TPU v5p": 2 * 4096 * 1.75e9,
}


def _lookup(table: dict, device_kind: str):
    kind = (device_kind or "").strip()
    if kind in table:
        return table[kind]
    for name, val in table.items():
        if kind.lower().startswith(name.lower()):
            return val
    return None


def summarize_compute(
    work: Dict[str, float],
    batches_per_sec: float,
    device_kind: str,
    int8: bool = True,
    hbm_bytes_per_batch: Optional[float] = None,
) -> Dict[str, object]:
    """Fold the work model into bench JSON fields: speed-of-light time
    per unit, utilization vs the measured wall, and the binding unit.

    ``compute_sol_fraction`` is the SERIAL sum of the unit times over the
    wall — an upper bound on how much of the wall the modeled compute
    can explain even with zero unit overlap; the remainder is issue
    latency, DMA waits, and scalar-core sequencing the model does not
    see."""
    wall_s = 1.0 / batches_per_sec
    mxu_peak = _lookup(MXU_PEAK_MACS, device_kind)
    mxu_peak = mxu_peak["int8" if int8 else "bf16"] if mxu_peak else None
    vpu_peak = _lookup(VPU_PEAK_OPS, device_kind)

    t_mxu = work["mxu_macs"] / mxu_peak if mxu_peak else None
    # moves occupy VPU issue slots too; count them at full weight so the
    # VPU bound is the conservative (larger) one
    t_vpu = (
        (work["vpu_ops"] + work["move_ops"]) / vpu_peak if vpu_peak else None
    )
    out: Dict[str, object] = {
        "model_work_per_batch": {
            "mxu_macs": round(work["mxu_macs"]),
            "vpu_ops": round(work["vpu_ops"]),
            "move_ops": round(work["move_ops"]),
        },
        "mxu_peak_macs_per_s": mxu_peak,
        "vpu_peak_ops_per_s": vpu_peak,
        "wall_ms_per_batch": round(wall_s * 1e3, 3),
        "mxu_sol_ms": round(t_mxu * 1e3, 3) if t_mxu is not None else None,
        "vpu_sol_ms": round(t_vpu * 1e3, 3) if t_vpu is not None else None,
        "mxu_utilization": (
            round(t_mxu / wall_s, 4) if t_mxu is not None else None
        ),
        "vpu_utilization": (
            round(t_vpu / wall_s, 4) if t_vpu is not None else None
        ),
        "device_kind": device_kind,
        "dots": "int8" if int8 else "bf16",
    }
    if "stages" in work and mxu_peak and vpu_peak:
        out["stage_sol_ms"] = {
            name: {
                "mxu": round(b["mxu_macs"] / mxu_peak * 1e3, 3),
                "vpu": round(
                    (b["vpu_ops"] + b["move_ops"]) / vpu_peak * 1e3, 3
                ),
            }
            for name, b in work["stages"].items()
        }
    parts = [("mxu", t_mxu), ("vpu", t_vpu)]
    if hbm_bytes_per_batch is not None:
        from .roofline import hbm_peak_gbps

        peak_bw = hbm_peak_gbps(device_kind)
        if peak_bw:
            t_hbm = hbm_bytes_per_batch / (peak_bw * 1e9)
            out["hbm_sol_ms"] = round(t_hbm * 1e3, 3)
            parts.append(("hbm", t_hbm))
    known = [(n, t) for n, t in parts if t is not None]
    if known:
        out["binding_unit"] = max(known, key=lambda p: p[1])[0]
        out["compute_sol_fraction"] = round(
            sum(t for _, t in known) / wall_s, 4
        )
    if not math.isfinite(wall_s):
        raise ValueError("batches_per_sec must be positive and finite")
    return out


__all__ = [
    "count_jaxpr_ops",
    "solid_render_compute_per_batch",
    "summarize_compute",
    "MXU_PEAK_MACS",
    "VPU_PEAK_OPS",
]
