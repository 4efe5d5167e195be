"""Batched / multi-chip rendering: vmapped compose and throughput sweeps.

Implements BASELINE.json configs #3 and #5: a batch of canvases renders in
one jitted pass (vmap over the scan-based compose), and the batch shards
over a device mesh (``data`` axis = canvases, optional ``spatial`` axis =
canvas rows). Per-canvas mean-luminance stats ride along as the run-level
reduction (an actual cross-device collective when sharded).

Static-shape discipline: each aspect ratio in a sweep is its own compiled
program (canvas dims are static); bundles pad to a common (N, Hm, Wm)
envelope so one program serves the whole fleet of bundles.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.compose import composite_canvas


def make_batched_compose(
    out_max_hw: Tuple[int, int], method: str = "lanczos", kernel: str = "xla",
    static_obj_hw: Optional[Tuple[Tuple[int, int], ...]] = None,
):
    """jitted step: (canvases [B,H,W,4], objs [B,N,Hm,Wm,4], hw, boxes)
    -> (composed [B,H,W,4], mean luminance [B]).

    kernel="pallas" routes the blend through the clamped-window packed-u32
    Pallas kernel (the bench.py headline path — fastest measured, identical
    numerics); "xla" is the pure-XLA windowed path (also the fallback
    whenever the Pallas call fails, e.g. on the CPU interpreter-less
    backend)."""

    @jax.jit
    def luma_stat(out):
        from ..ops.compose_pallas import REC709

        chan = jnp.mean(out[..., :3].astype(jnp.float32), axis=(1, 2))
        return chan @ jnp.array(REC709, jnp.float32)

    def one(canvas, objs, hw, boxes):
        return composite_canvas(canvas, objs, hw, boxes, out_max_hw, method)

    @jax.jit
    def xla_step(canvases, objs, obj_hw, boxes):
        out = jax.vmap(one)(canvases, objs, obj_hw, boxes)
        return out, luma_stat(out)

    if kernel != "pallas":
        return xla_step

    from ..ops.compose_pallas import (
        composite_batch_fused_v2,
        composite_batch_fused_v3,
        composite_batch_hybrid_packed,
    )

    # 0 = fused gen-3 (in-kernel tables), 1 = fused gen-2, 2 = clamped
    # two-program, 3 = XLA (latched)
    tier = [0]

    def _demote(e, name):
        import sys
        import traceback

        tier[0] += 1
        # Loud fallback: a real kernel regression must not silently
        # mislabel slower-path throughput as the Pallas path in benchmarks.
        print(
            f"[sweep] {name} compose path failed; latching the next "
            f"fallback tier: {e!r}",
            file=sys.stderr,
        )
        traceback.print_exc(limit=3, file=sys.stderr)

    def pallas_step(canvases, objs, obj_hw, boxes):
        if tier[0] == 0:
            try:
                out = composite_batch_fused_v3(
                    canvases, objs, obj_hw, boxes, out_max_hw, method,
                    static_obj_hw=static_obj_hw,
                )
                return out, luma_stat(out)
            except Exception as e:  # noqa: BLE001 - no Mosaic on this backend
                _demote(e, "fused gen-3")
        if tier[0] == 1:
            try:
                out = composite_batch_fused_v2(
                    canvases, objs, obj_hw, boxes, out_max_hw, method
                )
                return out, luma_stat(out)
            except Exception as e:  # noqa: BLE001
                _demote(e, "fused gen-2")
        if tier[0] == 2:
            try:
                out = composite_batch_hybrid_packed(
                    canvases, objs, obj_hw, boxes, out_max_hw, method, clamped=True
                )
                return out, luma_stat(out)
            except Exception as e:  # noqa: BLE001
                _demote(e, "clamped packed")
        return xla_step(canvases, objs, obj_hw, boxes)

    pallas_step.tier = tier  # introspectable for tests/benchmarks
    return pallas_step


batched_compose_step = make_batched_compose
"""Alias kept for the public parallel API."""


def make_solid_render_step(
    canvas_hw: Tuple[int, int],
    out_max_hw: Tuple[int, int],
    bg_rgba: Tuple[int, int, int, int] = (128, 128, 128, 255),
    method: str = "lanczos",
    static_obj_hw: Optional[Tuple[Tuple[int, int], ...]] = None,
    reuse: bool = True,
    stat: str = "luma",
    fallback_mode: str = "generic",
):
    """ONE-program solid-background render step (the fastest path for
    workloads whose canvases are solid fills — the sweep and the bench):
    background fill + gen-3 fused kernel + run stat in a single dispatch.

    Signature matches :func:`make_batched_compose` steps —
    ``step(canvases, objs, obj_hw, boxes) -> (out, stat)`` — but the
    canvases argument is ignored on EVERY path (the background is
    synthesized on device; ``out`` is the padded packed-u32 plane whose
    host bytes view-crop to RGBA). ``objs`` may carry a leading dim of 1
    against a B-batch ``boxes`` (the shared-object convention, STATUS
    item 24); the fallback tiers broadcast it to per-canvas rows
    themselves. Latched loud fallback on kernel failure.

    This factory is the SINGLE owner of the solid-render step — bench.py
    and the sweep both build from it (round-2 consolidation debt,
    ROADMAP "Known consolidation debt"); their historical divergences
    are the two mode parameters:

    ``stat``
        ``"luma"`` (sweep): per-canvas mean luminance of the crop —
        the run-level reduction the sweep reports. ``"fence"`` (bench):
        ``sum(out[:, 0, :128])`` — a 512-byte/canvas execution fence
        that doesn't spend HBM bandwidth re-reading the whole crop just
        to prove the kernel ran.
    ``fallback_mode``
        ``"generic"`` (sweep): latch :func:`make_batched_compose`
        (kernel="pallas", its own tier chain) and fold its u8 output to
        the packed plane convention. ``"tiered"`` (bench): explicit
        gen-2 -> clamped -> XLA tiers, each with ``packed_out=True``
        where supported, so a demoted benchmark still measures a
        packed-output path rather than paying an unpack it would never
        ship with.

    With ``reuse=True`` (default) consecutive calls reuse the previous
    output plane (framebuffer-reuse mode, compose_pallas STATUS item 20):
    only the windows the previous render touched are restored instead of
    re-writing the full plane. The previous ``out`` is DONATED on the next
    call — a caller that reads a prior step's ``out`` after a subsequent
    step gets a deleted-buffer error. Callers that hold onto outputs must
    pass ``reuse=False`` (every call renders a fresh plane) or copy the
    plane off device before stepping again; ``step.release()`` drops the
    retained plane when the caller is done stepping. The sweep and bench
    consume only the per-step stat, so they keep the default.

    ``step.precompile(objs, obj_hw, boxes, on_phase=...)`` AOT-splits the
    fast path's first dispatch into trace / compile stages (calling
    ``on_phase("trace"|"compile")`` before each) and installs the
    compiled executables, so a phase watchdog can tell a compile stall
    from an allocation/execution hang (the round-2 batch-512 silent-loss
    mode). Returns True on success; on failure the step simply compiles
    lazily on first call as before.
    """
    from ..ops.compose_pallas import (
        _round_up,
        fused_canvas_pad_hw,
        pack_rgba_scalar,
        packed_luma,
        planarize_objects,
        render_solid_fused_v3_program,
        render_solid_fused_v3_reuse_program,
    )

    if stat not in ("luma", "fence"):
        raise ValueError(f"stat must be 'luma' or 'fence', got {stat!r}")
    if fallback_mode not in ("generic", "tiered"):
        raise ValueError(
            f"fallback_mode must be 'generic' or 'tiered', got {fallback_mode!r}"
        )

    H, W = canvas_hw
    bg = pack_rgba_scalar(bg_rgba)
    hp, wp = fused_canvas_pad_hw(
        (H, W), (_round_up(out_max_hw[0], 8), _round_up(out_max_hw[1], 128))
    )

    def run_stat(out_packed):
        if stat == "fence":
            return jnp.sum(out_packed[:, 0, :128], axis=1)
        return packed_luma(out_packed[:, :H, :W])

    @jax.jit
    def render(objs, obj_hw, boxes):
        objs_p = objs if objs.shape[4] != 4 else planarize_objects(objs)
        out = render_solid_fused_v3_program(
            objs_p, obj_hw, boxes, (H, W), bg, out_max_hw, method,
            static_obj_hw=static_obj_hw, pipelined=True,
        )
        return out, run_stat(out)

    @partial(jax.jit, donate_argnums=(0,))
    def render_reuse(prev, objs, obj_hw, prev_boxes, boxes):
        objs_p = objs if objs.shape[4] != 4 else planarize_objects(objs)
        out = render_solid_fused_v3_reuse_program(
            prev, prev_boxes, objs_p, obj_hw, boxes, (H, W), bg, out_max_hw,
            method, static_obj_hw=static_obj_hw, pipelined=True,
        )
        return out, run_stat(out)

    @jax.jit
    def to_packed(out_u8):
        # fold the fallback's u8 NHWC into the SAME padded packed-i32 plane
        # the fast path returns, so callers see one output convention
        # regardless of which tier latched
        plane = jax.lax.bitcast_convert_type(out_u8, jnp.int32)
        return jnp.pad(plane, ((0, 0), (0, hp - H), (0, wp - W)))

    @jax.jit
    def pad_plane(out_v):
        # a demoted packed-out tier may pad to its own (smaller) envelope;
        # grow it to this factory's plane so the output contract holds
        return jnp.pad(
            out_v,
            ((0, 0), (0, hp - out_v.shape[1]), (0, wp - out_v.shape[2])),
        )

    @jax.jit
    def packed_stat(out_v):
        return run_stat(out_v)

    def _demote(e, name, nxt):
        import sys
        import traceback

        print(
            f"[sweep] {name} failed; latching {nxt}: {e!r}",
            file=sys.stderr,
        )
        traceback.print_exc(limit=3, file=sys.stderr)

    # fallback tier: None = fast path; "gen2"/"clamped"/"xla" (tiered) or
    # a make_batched_compose step (generic)
    fallback = [None]
    reuse_state = [None]  # (prev_plane, prev_boxes) between calls
    aot = {"render": None, "reuse": None}

    def precompile(objs, obj_hw, boxes, on_phase=None):
        note = on_phase or (lambda name: None)
        try:
            specs = tuple(
                jax.ShapeDtypeStruct(a.shape, a.dtype)
                for a in (objs, obj_hw, boxes)
            )
            plane = jax.ShapeDtypeStruct((boxes.shape[0], hp, wp), jnp.int32)
            note("trace")
            low_r = render.lower(*specs)
            low_rr = render_reuse.lower(plane, *specs[:2], specs[2], specs[2])
            note("compile")
            aot["render"] = low_r.compile()
            aot["reuse"] = low_rr.compile()
            return True
        except Exception as e:  # noqa: BLE001 - lazily compile instead
            _demote(e, "solid render precompile", "lazy first-call compile")
            aot["render"] = aot["reuse"] = None
            return False

    def fallback_args(objs, obj_hw, boxes):
        # u8 NHWC objects, per-canvas rows, device-synthesized bg canvases
        # (every path composites over the SAME solid background, so the
        # caller's canvases are never consulted)
        B = boxes.shape[0]
        objs_u8 = (
            objs if objs.shape[4] == 4 else jnp.transpose(objs, (0, 1, 3, 4, 2))
        )
        if objs_u8.shape[0] == 1 and B > 1:
            objs_u8 = jnp.broadcast_to(objs_u8, (B, *objs_u8.shape[1:]))
            obj_hw = jnp.broadcast_to(obj_hw, (B, *obj_hw.shape[1:]))
        rgba = jnp.array(bg_rgba, jnp.uint8)
        bg_canvases = jnp.broadcast_to(rgba, (B, H, W, 4))
        return bg_canvases, objs_u8, obj_hw, boxes

    xla_terminal = [None]  # latched XLA step for the tiered chain's end

    def tiered_fallback(objs, obj_hw, boxes):
        from ..ops.compose_pallas import (
            composite_batch_fused_v2,
            composite_batch_hybrid_packed,
        )

        cu8, ou8, hw_, b = fallback_args(objs, obj_hw, boxes)
        if fallback[0] == "gen2":
            try:
                out_v = pad_plane(composite_batch_fused_v2(
                    cu8, ou8, hw_, b, out_max_hw, method, packed_out=True
                ))
                return out_v, packed_stat(out_v)
            except Exception as e:  # noqa: BLE001
                fallback[0] = "clamped"
                _demote(e, "fused_v2", "the clamped path")
        if fallback[0] == "clamped":
            try:
                out_v = pad_plane(composite_batch_hybrid_packed(
                    cu8, ou8, hw_, b, out_max_hw, method, clamped=True,
                    packed_out=True,
                ))
                return out_v, packed_stat(out_v)
            except Exception as e:  # noqa: BLE001
                fallback[0] = "xla"
                _demote(e, "clamped packed", "the XLA path")
        if xla_terminal[0] is None:
            xla_terminal[0] = make_batched_compose(out_max_hw, method=method)
        out, _ = xla_terminal[0](cu8, ou8, hw_, b)
        out_v = to_packed(out)
        return out_v, packed_stat(out_v)

    def step(canvases, objs, obj_hw, boxes):
        del canvases  # background comes from bg_rgba on EVERY path
        if fallback[0] is None:
            try:
                r = aot["render"] or render
                rr = aot["reuse"] or render_reuse
                if reuse_state[0] is None:
                    out, st = r(objs, obj_hw, boxes)
                else:
                    prev, pb = reuse_state[0]
                    out, st = rr(prev, objs, obj_hw, pb, boxes)
                if reuse:
                    reuse_state[0] = (out, boxes)
                return out, st
            except Exception as e:  # noqa: BLE001 - no Mosaic on this backend
                reuse_state[0] = None
                if aot["render"] is not None or aot["reuse"] is not None:
                    # AOT executables are specialized to precompile()'s
                    # input shapes; a later call with different shapes
                    # raises INSIDE the executable. That is a stale-AOT
                    # problem, not a backend one — drop the executables
                    # and retrace via jit once before latching any
                    # permanent fallback tier (ADVICE r3).
                    aot["render"] = aot["reuse"] = None
                    _demote(e, "AOT executable (input shapes changed?)",
                            "retracing jit")
                    try:
                        out, st = render(objs, obj_hw, boxes)
                        if reuse:
                            reuse_state[0] = (out, boxes)
                        return out, st
                    except Exception as e2:  # noqa: BLE001 - fall through
                        e = e2
                if fallback_mode == "tiered":
                    fallback[0] = "gen2"
                    _demote(e, "solid render path", "fused_v2")
                else:
                    _demote(e, "solid render path", "the generic step")
                    fallback[0] = make_batched_compose(
                        out_max_hw, method=method, kernel="pallas",
                        static_obj_hw=static_obj_hw,
                    )
        if callable(fallback[0]):
            out, st = fallback[0](*fallback_args(objs, obj_hw, boxes))
            out_v = to_packed(out)
            return out_v, (packed_stat(out_v) if stat == "fence" else st)
        return tiered_fallback(objs, obj_hw, boxes)

    step.fallback = fallback  # introspectable for tests
    step.release = lambda: reuse_state.__setitem__(0, None)
    step.precompile = precompile
    return step


def sharded_compose_step(
    mesh,
    out_max_hw: Tuple[int, int],
    method: str = "lanczos",
    spatial: bool = False,
):
    """Multi-chip variant: canvases shard over the mesh ``data`` axis (and
    optionally rows over ``spatial``); objects/boxes shard with their batch
    dim; the luminance stat is a cross-device reduction XLA lowers onto ICI.
    """

    canvas_spec = P("data", "spatial") if spatial else P("data")
    batch = NamedSharding(mesh, P("data"))
    canvases_s = NamedSharding(mesh, canvas_spec)

    def one(canvas, objs, hw, boxes):
        return composite_canvas(canvas, objs, hw, boxes, out_max_hw, method)

    @partial(
        jax.jit,
        in_shardings=(canvases_s, batch, batch, batch),
        out_shardings=(canvases_s, NamedSharding(mesh, P())),
    )
    def step(canvases, objs, obj_hw, boxes):
        from ..ops.compose_pallas import REC709

        out = jax.vmap(one)(canvases, objs, obj_hw, boxes)
        chan = jnp.mean(out[..., :3].astype(jnp.float32), axis=(1, 2))
        luma = chan @ jnp.array(REC709, jnp.float32)
        # Global batch-mean: a real cross-device all-reduce when sharded.
        return out, jnp.mean(luma, keepdims=True)

    return step


def make_sharded_solid_render(
    mesh,
    canvas_hw: Tuple[int, int],
    out_max_hw: Tuple[int, int],
    bg_rgba: Tuple[int, int, int, int] = (128, 128, 128, 255),
    method: str = "lanczos",
    interpret: bool = False,
    static_obj_hw: Optional[Tuple[Tuple[int, int], ...]] = None,
):
    """Multi-chip variant of the one-program solid render: the gen-3 fused
    Pallas kernel runs PER DEVICE under shard_map (canvases shard over the
    mesh ``data`` axis), and the run-level mean luminance is a cross-device
    ``pmean`` — an actual ICI collective on hardware.

    ``interpret=True`` runs the kernel in the Pallas interpreter (the
    multi-chip path is validated on a virtual CPU mesh this way; on TPU
    meshes leave it False).

    step(objs_p [B,N,4,ph_a,pw_a], obj_hw [B,N,2], boxes [B,N,4])
      -> (padded packed planes [B,hp,wp] sharded over data, global luma [1])
    """
    from ..ops.compose_pallas import (
        pack_rgba_scalar,
        packed_luma,
        render_solid_fused_v3_program,
    )

    H, W = canvas_hw
    bg = pack_rgba_scalar(bg_rgba)
    data_spec = P("data")

    def local_step(objs_p, obj_hw, boxes):
        out = render_solid_fused_v3_program(
            objs_p, obj_hw, boxes, (H, W), bg, out_max_hw, method,
            interpret=interpret, static_obj_hw=static_obj_hw,
        )
        luma = packed_luma(out[:, :H, :W])
        # global batch-mean: a cross-device all-reduce over the data axis
        return out, jax.lax.pmean(jnp.mean(luma, keepdims=True), "data")

    return jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(data_spec, data_spec, data_spec),
            out_specs=(data_spec, P()),
            # pallas_call cannot declare varying-mesh-axes metadata on its
            # out_shape; skip the varying-manual-axes checker for this body
            check_vma=False,
        )
    )


def random_downscale_boxes(
    rng: np.random.Generator,
    obj_hw: np.ndarray,
    canvas_hw: Tuple[int, int],
) -> np.ndarray:
    """Solver-realistic random placements (downscale-only, inside canvas)."""
    n = obj_hw.shape[0]
    H, W = canvas_hw
    boxes = np.zeros((n, 4), np.int32)
    for k in range(n):
        oh, ow = int(obj_hw[k, 0]), int(obj_hw[k, 1])
        if oh == 0 or ow == 0:
            continue
        s = float(rng.uniform(0.3, 1.0))
        s = min(s, H / oh, W / ow, 1.0)
        w, h = max(1, int(ow * s)), max(1, int(oh * s))
        x1 = int(rng.integers(0, max(1, W - w)))
        y1 = int(rng.integers(0, max(1, H - h)))
        boxes[k] = (x1, y1, x1 + w, y1 + h)
    return boxes


def throughput_sweep(
    bundles,
    ratios: List[str],
    batch_per_ratio: int,
    pixel_budget_size: Optional[Tuple[int, int]] = None,
    mesh=None,
    spatial: bool = False,
    warmup: int = 1,
    reps: int = 3,
    seed: int = 0,
    kernel: str = "xla",
    superbatch: int = 0,
) -> Dict:
    """BASELINE config #5: bundles x ratios end-to-end composites/sec.

    ``bundles`` is a list of core.bundle.Bundle. Each ratio compiles one
    program; bundles pad to a shared envelope. Returns timing + throughput.

    ``superbatch=K`` (pallas solid-render path only) scans K box-batches
    inside ONE device program per rep — cross-dispatch pipelining that
    amortizes the per-dispatch host/tunnel gap K-fold (same lever as
    ``bench.py --superbatch``).
    """
    from ..layout.canvas import compute_canvas_size

    rng = np.random.default_rng(seed)
    n_max = max(len(b.meta) for b in bundles)
    pad_h = max(m.height for b in bundles for m in b.meta.values())
    pad_w = max(m.width for b in bundles for m in b.meta.values())
    arrays = [b.to_arrays(n_max=n_max, pad_hw=(pad_h, pad_w)) for b in bundles]
    # per-object-index static size COVER across bundles: an upper bound on
    # every batch element's asset size at that index, so the kernel's
    # static resample branches stay correct with interleaved bundles
    # (STATUS item 19; exact sizes when len(bundles) == 1)
    hw_cover = np.maximum.reduce([a.obj_hw for a in arrays])
    static_hw = tuple(tuple(int(v) for v in row) for row in hw_cover)

    results = {"ratios": {}, "total_canvases": 0, "total_seconds": 0.0}
    for ratio in ratios:
        if pixel_budget_size is not None:
            W, H = compute_canvas_size(pixel_budget_size, ratio, verbose=False)
        else:
            W, H = compute_canvas_size(bundles[0].background.size, ratio, verbose=False)
        B = batch_per_ratio
        # the solid-render (pallas) step ignores its canvases argument
        # entirely (backgrounds synthesize on device): build/upload the
        # ~2 GB host tensor lazily, only for the xla/mesh/fallback paths
        _canvases_cell: list = []

        def canvases_np() -> np.ndarray:
            if not _canvases_cell:
                c = np.zeros((B, H, W, 4), np.uint8)
                c[..., :3] = 128
                c[..., 3] = 255
                _canvases_cell.append(c)
            return _canvases_cell[0]
        objs = np.zeros((B, n_max, pad_h, pad_w, 4), np.uint8)
        hw = np.zeros((B, n_max, 2), np.int32)
        boxes = np.zeros((B, n_max, 4), np.int32)
        for i in range(B):
            arr = arrays[i % len(arrays)]
            objs[i] = arr.objects
            hw[i] = arr.obj_hw
            boxes[i] = random_downscale_boxes(rng, arr.obj_hw, (H, W))

        if mesh is not None:
            step = sharded_compose_step(mesh, (pad_h, pad_w), spatial=spatial)
        elif kernel == "pallas":
            # sweep canvases are solid fills: one-program render path
            step = make_solid_render_step(
                (H, W), (pad_h, pad_w), static_obj_hw=static_hw
            )
        else:
            step = make_batched_compose((pad_h, pad_w), kernel=kernel)

        k_scan = superbatch if (superbatch > 1 and kernel == "pallas"
                                and mesh is None) else 0
        if k_scan:
            try:
                from ..ops.compose_pallas import (
                    fused_canvas_pad_hw,
                    pack_rgba_scalar,
                    planarize_objects,
                    render_solid_fused_v3_reuse_program,
                )

                bg_packed = pack_rgba_scalar((128, 128, 128, 255))
                boxes_k = np.stack([
                    np.stack([
                        random_downscale_boxes(rng, hw[i], (H, W))
                        for i in range(B)
                    ])
                    for _ in range(k_scan)
                ])

                @partial(jax.jit, donate_argnums=(0,))
                def scan_step(plane, objs_p, hw_d, bk):
                    # framebuffer reuse across scan steps and dispatches
                    # (STATUS item 20): restoring a solid plane with any
                    # window set is a no-op, so the init boxes are free
                    def body(carry, b_):
                        prev, pb = carry
                        out = render_solid_fused_v3_reuse_program(
                            prev, pb, objs_p, hw_d, b_, (H, W), bg_packed,
                            (pad_h, pad_w), static_obj_hw=static_hw,
                            pipelined=True,
                        )
                        return (out, b_), jnp.sum(out[:, 0, :128], axis=1)
                    (plane, _), stats = jax.lax.scan(
                        body, (plane, bk[-1]), bk
                    )
                    return plane, stats

                hp_s, wp_s = fused_canvas_pad_hw((H, W), (pad_h, pad_w))
                plane_cell = [jnp.full(
                    (B, hp_s, wp_s), jnp.int32(bg_packed), jnp.int32
                )]
                scan_args = (
                    planarize_objects(jnp.asarray(objs)),
                    jnp.asarray(hw),
                    jnp.asarray(boxes_k),
                )

                def step(*a):  # noqa: ARG001 - scan consumes scan_args
                    plane_cell[0], stats = scan_step(
                        plane_cell[0], *scan_args
                    )
                    return None, stats

                args = scan_args
                np.asarray(step(*args)[1])  # probe: latch loudly on failure
                per_rep = B * k_scan
            except Exception as e:  # noqa: BLE001 - no Mosaic here
                import sys

                print(f"[sweep] superbatch scan failed ({e!r}); "
                      "using per-batch dispatches", file=sys.stderr)
                k_scan = 0
                step = make_solid_render_step(
                    (H, W), (pad_h, pad_w), static_obj_hw=static_hw
                )
        if not k_scan:
            # solid-render steps never read their canvases argument; pass a
            # 1-element dummy there instead of uploading the ~GB tensor
            lazy_ok = kernel == "pallas" and mesh is None
            c = np.zeros((1, 1, 1, 4), np.uint8) if lazy_ok else canvases_np()
            if lazy_ok:
                # planarize ONCE here instead of inside every jitted step
                # call (the full object tensor's pad+transpose would
                # otherwise re-execute per timed rep — the production
                # paths all hoist it)
                from ..ops.compose_pallas import planarize_objects

                objs_in = planarize_objects(jnp.asarray(objs))
            else:
                objs_in = jnp.asarray(objs)
            args = (jnp.asarray(c), objs_in, jnp.asarray(hw),
                    jnp.asarray(boxes))
            per_rep = B
        # the pallas per-batch path switches to the framebuffer-reuse
        # program on its SECOND call — ALWAYS warm both programs there
        # (even at warmup=0) so neither compile lands in the timed region
        extra_warm = (
            1 if (kernel == "pallas" and mesh is None and not k_scan) else 0
        )
        for w_i in range(max(1, warmup) + extra_warm):
            try:
                out, stat = step(*args)
                np.asarray(stat)  # true execution fence (see bench.py)
            except Exception as e:  # noqa: BLE001 - runtime (async) kernel
                # failure surfaces at the FENCE, after step()'s own except
                # already returned: latch the generic fallback here instead
                # of crashing the sweep
                import sys

                print(f"[sweep] fenced warmup failed ({e!r}); latching "
                      "the generic step", file=sys.stderr)
                step = make_batched_compose(
                    (pad_h, pad_w), method="lanczos", kernel="xla"
                )
                args = tuple(
                    jnp.asarray(x) for x in (canvases_np(), objs, hw, boxes)
                )
                k_scan = 0
                per_rep = B
                out, stat = step(*args)
                np.asarray(stat)
        t0 = time.perf_counter()
        for _ in range(reps):
            out, stat = step(*args)
        np.asarray(stat)
        dt = time.perf_counter() - t0
        results["ratios"][ratio] = {
            "canvas": [W, H],
            "batch": B,
            "superbatch": k_scan,
            "seconds_per_batch": dt / reps / max(1, k_scan or 1),
            "canvases_per_sec": per_rep * reps / dt,
        }
        results["total_canvases"] += per_rep * reps
        results["total_seconds"] += dt
    results["canvases_per_sec"] = (
        results["total_canvases"] / results["total_seconds"]
        if results["total_seconds"]
        else 0.0
    )
    return results
