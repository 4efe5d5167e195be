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


if __name__ == "__main__" and "--clamped" not in sys.argv:
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
        ("clamped_pipe", {"clamped": True, "pipelined": True}),
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
