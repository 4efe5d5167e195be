"""Wall-clock bisection of the compose hot path on real TPU.

Times each sub-stage of composite_batch_hybrid_packed as its own jitted
dispatch (scalar fences — see bench.py for why block_until_ready is not a
fence on the tunnel):
  A. coefficient-table construction only (traced f32 -> quantized i32)
  B. producer resize (tables + limb matmuls + unpremultiply + pack)
  C. packed Pallas blend kernel only
  D. full path (producer + blend)
Diagnostics to stderr, one JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(m):
    print(m, file=sys.stderr, flush=True)


def fence(x):
    np.asarray(x)


def timeit(fn, args, reps=20):
    """fn must return a SCALAR (or tiny) array -- it is the execution fence.
    The device stream is in-order, so fencing the last op fences all."""
    out = fn(*args)
    fence(out[-1] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(out[-1] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.parallel.sweep import random_downscale_boxes
    from image_transformation_tpu.ops import compose_pallas as cp
    from image_transformation_tpu.ops.resize import (
        build_coeffs_traced,
        resize_f32,
    )

    log(f"devices: {jax.devices()}")
    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W = 1080, 1920
    B = 16
    pad_h, pad_w = arrays.objects.shape[1], arrays.objects.shape[2]
    log(f"object pad: {pad_h}x{pad_w}, N={arrays.objects.shape[0]}")

    rng = np.random.default_rng(0)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 128
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    jc, jo, jh, jb = (jnp.asarray(x) for x in (canvases, objs, hw, boxes))

    mh_a = cp._round_up(pad_h, 8)
    mw_a = cp._round_up(pad_w, 128)

    # --- A: tables only ---
    @jax.jit
    def tables_only(obj_hw, boxes):
        def one(hw_, box):
            w = jnp.maximum(1, box[2] - box[0])
            h = jnp.maximum(1, box[3] - box[1])
            kh = build_coeffs_traced(hw_[1], w, pad_w, mw_a)
            kv = build_coeffs_traced(hw_[0], h, pad_h, mh_a)
            return jnp.sum(kh) + jnp.sum(kv)

        return jnp.sum(jax.vmap(jax.vmap(one))(obj_hw, boxes))

    ms_a = timeit(tables_only, (jh, jb))
    log(f"A tables only:      {ms_a:7.2f} ms/batch")

    # --- B: producer resize (includes tables) ---
    @jax.jit
    def _producer_fence(sv, meta):
        return jnp.sum(sv[:, :, 0, 0]) + jnp.sum(meta)

    def producer(c, o, h_, b):
        cv, sv, meta = cp._hybrid_producer(c, o, h_, b, (mh_a, mw_a), "lanczos")
        return sv, _producer_fence(sv, meta)

    ms_b = timeit(producer, (jc, jo, jh, jb))
    log(f"B producer (all):   {ms_b:7.2f} ms/batch")

    # --- B2: resize matmuls only, tables held constant ---
    @jax.jit
    def resize_only(o, h_, b):
        def one(obj, hw_, box):
            w = jnp.maximum(1, box[2] - box[0])
            h = jnp.maximum(1, box[3] - box[1])
            return resize_f32(
                obj.astype(jnp.float32), (hw_[0], hw_[1]), (h, w), (mh_a, mw_a)
            )

        out = jax.vmap(jax.vmap(one))(o, h_, b)
        return jnp.sum(out[:, :, 0, 0].astype(jnp.int32))

    ms_b2 = timeit(resize_only, (jo, jh, jb))
    log(f"B2 resize_f32 only: {ms_b2:7.2f} ms/batch")

    # --- C: blend kernel only (producer outputs precomputed) ---
    cv, sv, meta = cp._hybrid_producer(jc, jo, jh, jb, (mh_a, mw_a), "lanczos")
    fence(meta)

    @jax.jit
    def _blend_fence(out):
        return jnp.sum(out[:, 0, :128], axis=1)

    def blend(c, s, m):
        out = cp._pallas_blend_packed(c, s, m)
        return out, _blend_fence(out)

    ms_c = timeit(blend, (cv, sv, meta))
    log(f"C blend kernel:     {ms_c:7.2f} ms/batch")

    # --- D: full ---
    @jax.jit
    def _full_fence(out):
        return jnp.sum(out[:, 0, :128].astype(jnp.int32), axis=(1, 2))

    def full(c, o, h_, b):
        out = cp.composite_batch_hybrid_packed(c, o, h_, b)
        return out, _full_fence(out)

    ms_d = timeit(full, (jc, jo, jh, jb))
    log(f"D full path:        {ms_d:7.2f} ms/batch")

    print(json.dumps({
        "tables_ms": round(ms_a, 2),
        "producer_ms": round(ms_b, 2),
        "resize_f32_ms": round(ms_b2, 2),
        "blend_ms": round(ms_c, 2),
        "full_ms": round(ms_d, 2),
    }))


if __name__ == "__main__" and "--clamped" not in sys.argv and "--anatomy" not in sys.argv:
    main()


def clamped_vs_default():
    """Compare the clamped-window kernel path vs the default on hardware."""
    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.parallel.sweep import random_downscale_boxes
    from image_transformation_tpu.ops import compose_pallas as cp

    log(f"devices: {jax.devices()}")
    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W, B = 1080, 1920, 16
    rng = np.random.default_rng(0)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., :3] = 128
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    jc, jo, jh, jb = (jnp.asarray(x) for x in (canvases, objs, hw, boxes))

    @jax.jit
    def fence_sum(out):
        return jnp.sum(out[:, 0, :128].astype(jnp.int32))

    variants = (
        ("clamped", {"clamped": True}),
        ("resident", {"resident": True}),
    )

    def make_full(kw):
        def full(c, o, h_, b):
            out = cp.composite_batch_hybrid_packed(c, o, h_, b, **kw)
            return out, fence_sum(out)

        return full

    fns = {name: make_full(kw) for name, kw in variants}
    outs = {
        name: np.asarray(fn(jc, jo, jh, jb)[0][:2, ::3, ::7])
        for name, fn in fns.items()
    }
    # interleaved rounds, min per variant (tunnel noise is ~±0.7 ms/run)
    best = {name: float("inf") for name, _ in variants}
    for rnd in range(5):
        for name, fn in fns.items():
            ms = timeit(fn, (jc, jo, jh, jb), reps=20)
            best[name] = min(best[name], ms)
            log(f"round {rnd} {name:8s}: {ms:6.2f} ms/batch")
    results = {k: round(v, 2) for k, v in best.items()}
    eq = all(np.array_equal(list(outs.values())[0], o) for o in outs.values())
    log(f"outputs equal (subsample): {eq}")
    print(json.dumps(results))


if __name__ == "__main__" and "--clamped" in sys.argv:
    clamped_vs_default()
    sys.exit(0)


def blend_step_anatomy():
    """Isolate per-step costs inside the clamped blend kernel by timing
    crippled variants (DMA-only, no-roll, no-blend). Wrong outputs — timing
    only."""
    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.parallel.sweep import random_downscale_boxes
    from image_transformation_tpu.ops import compose_pallas as cp

    log(f"devices: {jax.devices()}")
    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W, B = 1080, 1920, 16
    pad_h, pad_w = arrays.objects.shape[1], arrays.objects.shape[2]
    mh_a = cp._round_up(pad_h, 8)
    mw_a = cp._round_up(pad_w, 128)
    MH, MW = cp.window_extents((mh_a, mw_a))
    rng = np.random.default_rng(0)
    canvases = np.zeros((B, H, W, 4), np.uint8)
    canvases[..., 3] = 255
    objs = np.broadcast_to(arrays.objects, (B, *arrays.objects.shape)).copy()
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )
    jc, jo, jh, jb = (jnp.asarray(x) for x in (canvases, objs, hw, boxes))
    cv, sv, meta = cp._hybrid_producer_clamped(jc, jo, jh, jb, (mh_a, mw_a), "lanczos")
    fence(meta)
    N = sv.shape[1]

    def make_variant(do_roll, do_blend, do_shift):
        def kernel(meta_ref, canvas_ref, src_all_ref, out_ref,
                   band_ref, src_vmem, src_shift, sem_in, sem_src, sem_out):
            del canvas_ref
            b = pl.program_id(0)

            @pl.when(b == 0)
            def _():
                src_shift[...] = jnp.zeros(src_shift.shape, src_shift.dtype)

            for k in range(N):
                valid = meta_ref[b, k, 5] > 0

                @pl.when(valid)
                def _():
                    ws_x = pl.multiple_of(meta_ref[b, k, 0], 128)
                    ws_y = pl.multiple_of(meta_ref[b, k, 1], 8)
                    dx = meta_ref[b, k, 2]
                    dy = meta_ref[b, k, 3]
                    window_slice = out_ref.at[b, pl.ds(ws_y, MH), pl.ds(ws_x, MW)]
                    dma_in = pltpu.make_async_copy(window_slice, band_ref, sem_in)
                    dma_in.start()
                    dma_src = pltpu.make_async_copy(src_all_ref.at[b, k], src_vmem, sem_src)
                    dma_src.start()
                    dma_src.wait()

                    if do_shift:
                        src_shift[MH:MH + mh_a, :] = src_vmem[...]
                        fine = jax.lax.rem(dy, 8)
                        coarse8 = dy - fine
                        start8 = pl.multiple_of(MH - 8 - coarse8, 8)
                        tall = src_shift[pl.ds(start8, MH + 8), :]
                        rows = jax.lax.switch(
                            fine,
                            [(lambda d: lambda: tall[8 - d: 8 - d + MH, :])(d)
                             for d in range(8)],
                        )
                    else:
                        rows = jnp.pad(src_vmem[...], ((0, MH - mh_a), (0, 0)))
                    padded = jnp.pad(rows, ((0, 0), (0, MW - mw_a)))
                    if do_roll:
                        lane = jax.lax.broadcasted_iota(jnp.int32, (MH, MW), 1)
                        src = jnp.where(lane >= dx, pltpu.roll(padded, dx, axis=1), 0)
                    else:
                        src = padded
                    dma_in.wait()
                    if do_blend:
                        band_ref[...] = cp._alpha_over_packed(band_ref[...], src)
                    else:
                        band_ref[...] = band_ref[...] | (src & 0)
                    dma_out = pltpu.make_async_copy(band_ref, window_slice, sem_out)
                    dma_out.start()
                    dma_out.wait()

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((MH, MW), jnp.int32),
                pltpu.VMEM((mh_a, mw_a), jnp.int32),
                pltpu.VMEM((2 * MH, mw_a), jnp.int32),
                pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )

        @functools.partial(jax.jit)
        def run(canvas_v, src_v, m):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(canvas_v.shape, jnp.int32),
                grid_spec=grid_spec,
                input_output_aliases={1: 0},
            )(m, canvas_v, src_v)

        return run

    @jax.jit
    def fence_sum(out):
        return jnp.sum(out[:, 0, :128])

    for name, kw in (
        ("full", dict(do_roll=True, do_blend=True, do_shift=True)),
        ("no_roll", dict(do_roll=False, do_blend=True, do_shift=True)),
        ("no_shift", dict(do_roll=True, do_blend=True, do_shift=False)),
        ("no_blend", dict(do_roll=True, do_blend=False, do_shift=True)),
        ("dma_only", dict(do_roll=False, do_blend=False, do_shift=False)),
    ):
        run = make_variant(**kw)
        best = float("inf")
        def f(c, s, m):
            out = run(c, s, m)
            return out, fence_sum(out)
        for _ in range(3):
            best = min(best, timeit(f, (cv, sv, meta), reps=20))
        log(f"{name:9s}: {best:6.2f} ms/batch ({best / (B * N) * 1e3:5.1f} us/step)")


if __name__ == "__main__" and "--anatomy" in sys.argv:
    blend_step_anatomy()
    sys.exit(0)
