"""Benchmark: composited 1080p canvases/sec/chip vs the PIL reference.

Headline metric (BASELINE.md): 1080p canvases composited per second on one
TPU chip, batched compose path (fused gen-3 Pallas kernel: exact 3-limb
resample + clamped-window packed blend in one grid-(B,N) program, with
coefficient tables built in-kernel from per-object size scalars and the
packed-u32 canvas convention on input and output; --kernel xla selects the
pure-XLA windowed path), squarespace bundle workload with solver-realistic
downscale-only placements. ``vs_baseline``
is the speedup over the PIL reference pipeline (per-placement LANCZOS
resize + alpha_composite, measured here on this host since the reference
publishes no numbers — BASELINE.json ``published: {}``).

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.
Usage: python bench.py [--batch 64] [--reps 5] [--sweep]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.resolve()
sys.path.insert(0, str(REPO))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def pil_baseline_canvases_per_sec(bundle, boxes_per_canvas, canvas_hw, n_canvases=8):
    """Best-of-3 PIL reference throughput (conservative for vs_baseline)."""
    from PIL import Image

    H, W = canvas_hw
    bg = Image.new("RGBA", (W, H), (128, 128, 128, 255))
    ids = bundle.object_ids()

    def one_round() -> float:
        t0 = time.perf_counter()
        for i in range(n_canvases):
            canvas = bg.copy()
            boxes = boxes_per_canvas[i % len(boxes_per_canvas)]
            for k, oid in enumerate(ids):
                x1, y1, x2, y2 = (int(v) for v in boxes[k])
                w, h = max(1, x2 - x1), max(1, y2 - y1)
                canvas.alpha_composite(
                    bundle.objects[oid].resize((w, h), Image.LANCZOS), dest=(x1, y1)
                )
        return n_canvases / (time.perf_counter() - t0)

    one_round()  # warm caches
    return max(one_round() for _ in range(3))


def main() -> None:
    parser = argparse.ArgumentParser()
    # Batch sweep on v5e with the framebuffer-reuse pipelined kernel
    # (round-2 continuation): 26.1k @ 256 -> 27,993 @ 384 -> 28,402 @ 448
    # canvases/sec; 512 stalls before first dispatch (resource wall — the
    # round-1 OOM point, now a silent hang over the tunnel). 448 adopted:
    # amortizes the ~1.7 ms/dispatch tunnel turnaround with two ~3.7 GB
    # packed planes (donated reuse) still comfortably inside HBM.
    parser.add_argument("--batch", type=int, default=448)
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--pil-canvases", type=int, default=8)
    parser.add_argument("--sweep", action="store_true", help="also run the 4-ratio sweep")
    parser.add_argument(
        "--profile", default=None, metavar="DIR",
        help=(
            "capture a jax.profiler trace of the timed reps into DIR "
            "(works over the dev tunnel; analyze with "
            "benchmarks/analyze_trace.py DIR)"
        ),
    )
    parser.add_argument(
        "--superbatch", type=int, default=0, metavar="K",
        help=(
            "also measure the cross-dispatch-pipelined path: K box-batches "
            "scanned inside ONE device program (amortizes the per-dispatch "
            "host/tunnel gap K-fold; per-batch stats prove execution)"
        ),
    )
    parser.add_argument(
        "--kernel", choices=["xla", "pallas"], default="pallas",
        help=(
            "compose path: packed-u32 Pallas blend (default; ~15%% faster, "
            "falls back to XLA automatically on kernel failure) or the XLA "
            "windowed path"
        ),
    )
    args = parser.parse_args()

    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.parallel.sweep import (
        make_batched_compose,
        random_downscale_boxes,
        throughput_sweep,
    )

    # Bounded backend init: a wedged device tunnel hangs jax.devices()
    # FOREVER (observed: the remote server died mid-round and every
    # backend init blocked in make_c_api_client). Probe in a daemon
    # thread so an unreachable device yields one honest JSON error line
    # instead of a silent hang the driver can only kill. 900 s default
    # comfortably covers the observed 151 s cold-process warmup.
    import os as _os
    import threading

    _ready = threading.Event()
    _dev_cell: list = []

    _probe_err: list = []

    def _probe_devices() -> None:
        # _ready must be set on BOTH outcomes: a fast-failing backend init
        # (connection refused) otherwise leaves the main thread waiting the
        # full timeout and reporting a misleading "did not complete".
        try:
            _dev_cell.append(jax.devices())
        except BaseException as e:  # noqa: BLE001 - reported below
            _probe_err.append(f"{type(e).__name__}: {e}")
        finally:
            _ready.set()

    threading.Thread(target=_probe_devices, daemon=True).start()
    timeout_s = float(_os.environ.get("ITPU_BACKEND_INIT_TIMEOUT_S", "900"))
    if not _ready.wait(timeout=timeout_s) or not _dev_cell:
        reason = (
            _probe_err[0]
            if _probe_err
            else (
                f"device backend init did not complete within "
                f"{timeout_s:.0f}s (unreachable tunnel?)"
            )
        )
        # flush: os._exit skips atexit/stdio flushing, and stdout is block-
        # buffered when redirected to a file (the hw_refresh.sh case) — an
        # unflushed buffer would lose the one honest JSON error line.
        print(json.dumps({
            "metric": "composited 1080p canvases/sec/chip",
            "value": 0.0,
            "unit": "canvases/sec",
            "vs_baseline": 0.0,
            "error": reason,
        }), flush=True)
        _os._exit(2)

    log(f"devices: {_dev_cell[0]}")
    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W = 1080, 1920
    B = args.batch
    pad_h, pad_w = arrays.objects.shape[1], arrays.objects.shape[2]

    rng = np.random.default_rng(0)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 128
    canvases[..., 3] = 255
    # per-batch object copies exist ONLY for the XLA path and the loud
    # fallback tiers; the primary gen-3 path shares one copy (STATUS item
    # 24), so the B-fold host tensor (~3.7 GB at batch 448) is built lazily
    _objs_bcast_cell: list = []

    def objs_broadcast() -> np.ndarray:
        if not _objs_bcast_cell:
            _objs_bcast_cell.append(
                np.broadcast_to(
                    arrays.objects, (B, *arrays.objects.shape)
                ).copy()
            )
        return _objs_bcast_cell[0]

    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    # per-object static asset sizes: specializes the kernel's resample dots
    # to each object's real padded extents (STATUS item 19). Derived ONCE so
    # the headline and superbatch paths always compile against the same
    # static upper-bound contract.
    static_hw = tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)

    def make_pallas_step():
        import functools

        import jax as _jax

        from image_transformation_tpu.ops.compose_pallas import (
            composite_batch_fused_v2,
            composite_batch_hybrid_packed,
            pack_rgba_scalar,
            render_solid_fused_v3_program,
            render_solid_fused_v3_reuse_program,
        )

        @_jax.jit
        def fence_stat(out):
            # tiny fence stat; jitted so the slice+sum never forces an
            # eager relayout of the kernel's aliased output buffer
            return jnp.sum(out[:, 0, :128].astype(jnp.int32), axis=1)

        @functools.partial(_jax.jit, static_argnames=("canvas_hw", "bg"))
        def render_step(o, h_, b, canvas_hw, bg):
            # ONE program: background fill + gen-3 fused kernel + fence
            # stat (each extra dispatch cost ~1 ms of host gap per batch)
            out = render_solid_fused_v3_program(
                o, h_, b, canvas_hw, bg, static_obj_hw=static_hw,
                pipelined=True,
            )
            return out, jnp.sum(out[:, 0, :128], axis=1)

        @functools.partial(
            _jax.jit, static_argnames=("canvas_hw", "bg"), donate_argnums=(0,)
        )
        def reuse_step(prev, o, h_, pb, b, canvas_hw, bg):
            # framebuffer reuse (STATUS item 20): restore only the windows
            # the previous render touched on the donated plane instead of
            # re-writing the full 2.1 GB background (14.25 -> 12.10
            # ms/batch at 1080p/256)
            out = render_solid_fused_v3_reuse_program(
                prev, pb, o, h_, b, canvas_hw, bg, static_obj_hw=static_hw,
                pipelined=True,
            )
            return out, jnp.sum(out[:, 0, :128], axis=1)

        tier = [0]
        reuse_state = [None]  # (prev_plane, prev_boxes) between dispatches

        def step(c_thunk, o, h_, b, bg_rgba, canvas_hw):
            # fused gen-3 kernel (resample + blend in one grid-(B,N)
            # program, coefficient tables built IN-KERNEL from per-object
            # scalars) with the full engine convention: solid background
            # synthesized on device into the padded packed plane (no
            # canvas upload/pad copy), pre-planarized object assets,
            # padded packed-u32 output whose host bytes view-crop to the
            # RGBA image for free, and the fill+kernel+stat in a single
            # program. 6007 (gen-2) -> 8312 (gen-3 packed) -> 9388
            # (single-program render) canvases/sec at batch 64.
            # Tiered loud fallback: gen-2 -> clamped two-program path.
            if tier[0] == 0:
                try:
                    bg = pack_rgba_scalar(bg_rgba)
                    if reuse_state[0] is None:
                        out, luma = render_step(o, h_, b, canvas_hw, bg)
                    else:
                        prev, pb = reuse_state[0]
                        out, luma = reuse_step(
                            prev, o, h_, pb, b, canvas_hw, bg
                        )
                    reuse_state[0] = (out, b)
                    return out, luma
                except Exception as e:  # noqa: BLE001
                    tier[0] = 1
                    reuse_state[0] = None
                    log(f"fused_v3 failed ({e}); using fused_v2")
            # fallback tiers are the only consumers of the packed canvas
            # batch (~2 GB at batch 256): upload it lazily on first demote
            c = c_thunk() if callable(c_thunk) else c_thunk
            cu8 = c if c.dtype == jnp.uint8 else _jax.lax.bitcast_convert_type(
                c, jnp.uint8
            )
            ou8 = o if o.shape[4] == 4 else jnp.transpose(o, (0, 1, 3, 4, 2))
            if ou8.shape[0] == 1 and cu8.shape[0] > 1:
                # primary path shares one object copy (STATUS item 24);
                # the fallback kernels want per-canvas rows
                ou8 = jnp.broadcast_to(ou8, (cu8.shape[0], *ou8.shape[1:]))
            if tier[0] == 1:
                try:
                    out = composite_batch_fused_v2(cu8, ou8, h_, b, packed_out=True)
                    return out, fence_stat(out)
                except Exception as e:  # noqa: BLE001
                    tier[0] = 2
                    log(f"fused_v2 failed ({e}); using the clamped path")
            out = composite_batch_hybrid_packed(
                cu8, ou8, h_, b, clamped=True, packed_out=True
            )
            return out, fence_stat(out)

        # let the caller drop the retained reuse plane (~4 GB at batch 448)
        # once the timed loop is done, so later phases (superbatch, sweep)
        # don't carry it as dead HBM
        step.release = lambda: reuse_state.__setitem__(0, None)
        return step

    bg_rgba = (128, 128, 128, 255)
    if args.kernel == "pallas":
        # engine conventions: packed-u32 canvas bytes (free host view; only
        # used by the fallback tiers — the primary path synthesizes the
        # background on device, so the ~2 GB canvas batch stays on host
        # until a fallback tier actually latches), pre-planarized assets
        from image_transformation_tpu.ops.compose_pallas import planarize_objects

        _canvases_cell: list = []

        def canvases_thunk():
            if not _canvases_cell:
                log("uploading packed canvas batch for the fallback tier ...")
                # the astype copy (~3.5 GB at batch 448) is deferred here
                # too: the happy path must not pay a second host canvas
                # buffer that only the fallback tiers ever read
                packed = (
                    canvases.view(np.uint32).reshape(B, H, W).astype(np.int32)
                )
                _canvases_cell.append(jnp.asarray(packed))
            return _canvases_cell[0]

        # ONE shared planar copy: the kernel reads object row 0 for every
        # canvas (STATUS item 24) — B-fold duplication dropped from both
        # host RAM and HBM (~3.7 GB at batch 448)
        objs_dev = np.asarray(
            planarize_objects(jnp.asarray(arrays.objects[None]))
        )
        pallas_step = make_pallas_step()

        def step(c, o, h_, b):
            return pallas_step(c, o, h_, b, bg_rgba, (H, W))

        release_reuse = pallas_step.release
        dev_args = (
            canvases_thunk,
            jnp.asarray(objs_dev),
            jnp.asarray(hw),
            jnp.asarray(boxes),
        )
    else:
        step = make_batched_compose((pad_h, pad_w))
        release_reuse = lambda: None  # noqa: E731 - XLA path retains no plane
        dev_args = tuple(
            jnp.asarray(x) for x in (canvases, objs_broadcast(), hw, boxes)
        )

    def fence(x):
        # block_until_ready does not reliably synchronize on the tunneled
        # platform; a tiny host readback is a true execution fence (the
        # device stream is in-order, so fencing the last call fences all).
        np.asarray(x)

    log("compiling + warmup ...")
    t0 = time.perf_counter()
    try:
        out, luma = step(*dev_args)
        fence(luma)
    except Exception as e:  # noqa: BLE001 - robust headline metric
        if args.kernel != "pallas":
            raise
        log(f"pallas path failed ({e}); falling back to the XLA path")
        step = make_batched_compose((pad_h, pad_w))
        # u8 NHWC canvases/objects again
        dev_args = (
            jnp.asarray(canvases), jnp.asarray(objs_broadcast()), *dev_args[2:]
        )
        out, luma = step(*dev_args)
        fence(luma)
    log(f"first call (incl. compile): {time.perf_counter() - t0:.1f}s")
    # second warmup: compiles the framebuffer-reuse program (the steady
    # state of the timed loop on the pallas path)
    out, luma = step(*dev_args)
    fence(luma)

    import contextlib

    profile_cm = (
        jax.profiler.trace(args.profile) if args.profile else contextlib.nullcontext()
    )
    with profile_cm:
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, luma = step(*dev_args)
        fence(luma)
        dt = time.perf_counter() - t0
    ours = B * args.reps / dt
    log(f"tpu: {ours:.1f} canvases/sec ({dt / args.reps * 1e3:.1f} ms/batch of {B})")

    # Drop the retained framebuffer-reuse plane (~4 GB at batch 448) before
    # the superbatch/sweep phases allocate their own planes — otherwise it
    # rides along as dead HBM and pushes peak usage toward the batch-512
    # resource wall.
    out = luma = None
    release_reuse()

    pipelined = None
    if args.superbatch > 1 and args.kernel == "pallas":
        # Cross-dispatch pipelining: scan K box-batches inside ONE program.
        # The per-batch data is only the boxes ([K, B, N, 4] int32 — a few
        # KB); the object tensor is shared and the background synthesizes
        # on device, so one dispatch composes K*B canvases and the
        # ~1.7 ms/dispatch tunnel gap amortizes K-fold. Each scan step
        # returns a per-batch stat, so every batch provably executed; the
        # composed frames are consumed on device (same consumption
        # semantics as the headline loop, which never reads frames back).
        import functools

        import jax as _jax

        from image_transformation_tpu.ops.compose_pallas import (
            fused_canvas_pad_hw,
            pack_rgba_scalar,
            render_solid_fused_v3_reuse_program,
        )

        K = args.superbatch
        bg_packed = pack_rgba_scalar(bg_rgba)
        boxes_k = np.stack([
            np.stack([
                random_downscale_boxes(rng, arrays.obj_hw, (H, W))
                for _ in range(B)
            ])
            for _ in range(K)
        ])

        @functools.partial(_jax.jit, donate_argnums=(0,))
        def super_step(plane, o, h_, bk):
            # framebuffer reuse across scan steps AND dispatches: one live
            # plane, window-restore between steps (restoring a solid plane
            # with any window set is a no-op, so the init boxes are free)
            def body(carry, b):
                prev, pb = carry
                out = render_solid_fused_v3_reuse_program(
                    prev, pb, o, h_, b, (H, W), bg_packed,
                    static_obj_hw=static_hw, pipelined=True,
                )
                return (out, b), jnp.sum(out[:, 0, :128], axis=1)
            (plane, _), stats = _jax.lax.scan(body, (plane, bk[-1]), bk)
            return plane, stats

        try:
            hp, wp = fused_canvas_pad_hw((H, W), (pad_h, pad_w))
            plane = jnp.full((B, hp, wp), jnp.int32(bg_packed), jnp.int32)
            sb_args = (dev_args[1], dev_args[2], jnp.asarray(boxes_k))
            t0 = time.perf_counter()
            plane, stats = super_step(plane, *sb_args)
            fence(stats)
            log(f"superbatch first call (incl. compile): "
                f"{time.perf_counter() - t0:.1f}s")
            sb_reps = max(1, args.reps // K)
            t0 = time.perf_counter()
            for _ in range(sb_reps):
                plane, stats = super_step(plane, *sb_args)
            fence(stats)
            dt_sb = time.perf_counter() - t0
            pipelined = K * B * sb_reps / dt_sb
            log(
                f"tpu pipelined (K={K} batches/dispatch): "
                f"{pipelined:.1f} canvases/sec "
                f"({dt_sb / sb_reps * 1e3:.1f} ms per {K}-batch dispatch)"
            )
            # drop the scan's retained plane (~4 GB at batch 448) before
            # the PIL-baseline and sweep phases — same dead-HBM concern
            # the headline path's step.release() addresses
            plane = stats = sb_args = None
        except Exception as e:  # noqa: BLE001 - diagnostic path only
            log(f"superbatch path failed ({e!r}); skipping")

    log("measuring PIL reference baseline ...")
    pil = pil_baseline_canvases_per_sec(
        bundle, boxes, (H, W), n_canvases=args.pil_canvases
    )
    log(f"pil reference: {pil:.2f} canvases/sec")

    if args.sweep:
        sweep = throughput_sweep(
            [bundle, load_bundle(REPO / "data" / "audio_book")],
            ["9:16", "1:1", "16:9", "4:1"],
            batch_per_ratio=8,
            pixel_budget_size=(3840, 2160),
            kernel=args.kernel,
            superbatch=args.superbatch,  # 2.1x at 4K (see ROADMAP item 2)
        )
        log(f"sweep: {json.dumps(sweep['ratios'])}")

    payload = {
        "metric": "composited 1080p canvases/sec/chip",
        "value": round(ours, 2),
        "unit": "canvases/sec",
        "vs_baseline": round(ours / pil, 2),
    }
    if pipelined:
        payload["pipelined_canvases_per_sec"] = round(pipelined, 2)
        payload["pipelined_vs_baseline"] = round(pipelined / pil, 2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
