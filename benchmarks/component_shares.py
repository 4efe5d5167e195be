"""Per-component timing shares of the gen-3 pipelined render kernel.

Methodology (STATUS item 26, ops/compose_pallas.py): monkey-patch ONE
kernel component to a cheap, numerically WRONG stub of the same shape,
rebuild the bench fast path, and time it — the delta vs the unpatched
run is that component's share of the wall. Each mode must run in a
FRESH process (the jit cache keys on function identity), so drive it as

    for m in base consttable cheapfilter onelimb noblend noepilogue; do
        python benchmarks/component_shares.py $m
    done

Round-3 measured shares of the 23.1 ms 1080p/768 batch (v5e, dev
tunnel, items 15-25 kernel):

    mode          ms/batch   isolates
    base            23.1     —
    consttable      16.7     coeff tables: 6.4 ms (28%)
    cheapfilter     21.5     ...of which Horner filter eval: 1.6 ms
    onelimb         18.9     limb dots: ~6.3 ms (2 of 3 limbs = 4.2)
    noblend         20.8     packed alpha_over: 2.3 ms
    noepilogue      21.2     unpremultiply epilogue: 1.9 ms

(The restore program adds 1.1 ms — visible in a jax.profiler trace via
benchmarks/analyze_trace.py, not stubbable from here.) The stubs are
NOT render-correct; this tool is for attribution only and never runs in
CI or writes results files.

Round-4 additions for the s8/static-windows kernel (items 27-31 made
``onelimb`` a dead stub — it patches the bf16 ``_limb_dot`` the default
path no longer calls):

    mode          isolates
    onelimb_i8    2 of 3 s8 MXU dots + ALL re-center fixup arithmetic
    nodots_i8     the full s8 dot + fixup stage (VPU broadcast stand-in)
    nosplit_i8    the v-table limb split + rowsums (STATUS item 31)
    noblendall    the whole blend stage (window read/alpha_over/masked
                  src write) — ``noblend`` only stubs the alpha_over math
    nowindowdma   ALL per-step window DMAs, in AND back (patches
                  _PerObjectCopy.start/wait to no-ops; requires the
                  static-windows default) — the DMA bytes + issue share
                  the item 31-33 wall-neutral results point at

Round-4 measured shares of the 21.2 ms 1080p/768 batch (v5e, dev
tunnel, items 27-31 kernel, /tmp/shares_r04.log):

    mode          ms/batch   isolates
    base            21.20    —
    consttable      15.63    coeff tables: 5.57 ms (26%)
    cheapfilter     19.79    ...of which Horner filter eval: 1.41 ms
    onelimb_i8      16.69    2/3 s8 dots + all fixups: 4.51 ms (21%)
    nosplit_i8      19.21    v-table limb split + rowsums: 1.99 ms
    noblend         19.28    packed alpha_over math: 1.92 ms
    noblendall      16.00*   whole blend stage: ~5.2 ms (staging ~3.3)
    noepilogue      19.23*   unpremultiply epilogue: ~1.96 ms
    nowindowdma     19.54    per-step window DMAs: 1.66 ms (8%)
    nodots_i8       (does not lower on Mosaic at 900 s — share bounded
                     by onelimb_i8)

(* = measured on the item-34 folded-fixup kernel the same day; its base
is within noise of 21.20.) The shares SUM to ~20.9 of the 21.2 ms wall:
the pipelined kernel is essentially compute-serialized — window DMAs
are well overlapped (1.66 ms exposed), and the binding resource is the
serial VPU/MXU stage chain, NOT DMA issue/bytes as the item-31-33
wall-neutral folds suggested (those folds were simply below the ~0.3 ms
A/B noise floor).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_transformation_tpu.ops.compose_pallas as cp  # noqa: E402
import image_transformation_tpu.ops.resize as rz  # noqa: E402

MODES = (
    "base", "consttable", "cheapfilter", "onelimb", "noblend", "noepilogue",
    "onelimb_i8", "nodots_i8", "nosplit_i8", "noblendall", "nowindowdma",
)


def apply_stub(mode: str) -> None:
    if mode == "base":
        return
    if mode == "consttable":
        def cheap_table(in_s, out_s, n_out, n_in, method, transposed,
                        o_offset=None):
            shape = (n_in, n_out) if transposed else (n_out, n_in)
            v = (in_s + out_s).astype(jnp.int32)  # keep traced deps alive
            return jnp.full(shape, 1, jnp.int32) + v * 0

        cp._coeff_table_in_kernel = cheap_table
    elif mode == "cheapfilter":
        rz._FILTERS["lanczos"] = rz._filter_bilinear
    elif mode == "onelimb":
        def one_limb(img_bf16, k_i32, contract_img, contract_k, k_first):
            hi, _mid, _lo = cp._split_limbs_bf16(k_i32)

            def dot(limb):
                if k_first:
                    lhs, rhs = limb, img_bf16
                    dims = (((contract_k,), (contract_img,)), ((), ()))
                else:
                    lhs, rhs = img_bf16, limb
                    dims = (((contract_img,), (contract_k,)), ((), ()))
                return jax.lax.dot_general(
                    lhs, rhs, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)

            return dot(hi) << 16

        cp._limb_dot = one_limb
    elif mode == "noblend":
        cp._alpha_over_packed = lambda dst, src: dst ^ src
    elif mode == "noepilogue":
        cp._exact_div_i32 = lambda num, den: num >> 8
    elif mode == "onelimb_i8":
        def hi_only(img_i8, k_i32, contract_img, contract_k, k_first,
                    img_colsum=None, k_limbs=None):
            if k_limbs is not None:
                hi8 = k_limbs[0]
            else:
                hi8 = (k_i32 >> 16).astype(jnp.int8)
            if k_first:
                lhs, rhs = hi8, img_i8
                dims = (((contract_k,), (contract_img,)), ((), ()))
            else:
                lhs, rhs = img_i8, hi8
                dims = (((contract_img,), (contract_k,)), ((), ()))
            return jax.lax.dot_general(
                lhs, rhs, dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            ) << 16

        cp._limb_dot_i8 = hi_only
    elif mode == "nodots_i8":
        def no_dots(img_i8, k_i32, contract_img, contract_k, k_first,
                    img_colsum=None, k_limbs=None):
            # VPU-only stand-in of the right shape that keeps both
            # operands live: rowsum(k) [+] colsum(img) broadcast
            if k_limbs is not None:
                rs_k = k_limbs[3]
            else:
                rs_k = jnp.sum(k_i32, axis=contract_k)
            if img_colsum is None:
                img_colsum = jnp.sum(
                    img_i8.astype(jnp.int32), axis=contract_img
                )
            if k_first:
                return rs_k[:, None] + img_colsum[None, :]
            return img_colsum[:, None] + rs_k[None, :]

        cp._limb_dot_i8 = no_dots
    elif mode == "nosplit_i8":
        def cheap_split(k_i32, contract_k):
            k8 = k_i32.astype(jnp.int8)
            rs = jnp.sum(k_i32, axis=contract_k) * 0
            return k8, k8, k8, rs

        cp._split_limbs_i8 = cheap_split
    elif mode == "noblendall":
        cp._blend_window_rows = lambda *a, **k: None
    elif mode == "nowindowdma":
        if not cp.STATIC_WINDOWS:
            raise SystemExit("nowindowdma requires ITPU_STATIC_WINDOWS=1")
        cp._PerObjectCopy.start = lambda self: None
        cp._PerObjectCopy.wait = lambda self: None
    else:
        raise SystemExit(f"unknown mode {mode!r}; pick from {MODES}")


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", nargs="?", default="base", choices=MODES)
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--batch", type=int, default=768)
    args = parser.parse_args()
    mode, reps, batch = args.mode, args.reps, args.batch
    apply_stub(mode)

    from image_transformation_tpu.core.bundle import load_bundle
    from image_transformation_tpu.ops.compose_pallas import (
        planarize_objects,
    )
    from image_transformation_tpu.parallel.sweep import (
        make_solid_render_step,
        random_downscale_boxes,
    )

    bundle = load_bundle(REPO / "data" / "squarespace")
    arrays = bundle.to_arrays()
    H, W = 1080, 1920
    B = batch
    pad_h, pad_w = arrays.objects.shape[1], arrays.objects.shape[2]
    static_hw = tuple(tuple(int(v) for v in row) for row in arrays.obj_hw)
    rng = np.random.default_rng(0)
    hw = np.broadcast_to(arrays.obj_hw, (B, *arrays.obj_hw.shape)).copy()
    boxes = np.stack(
        [random_downscale_boxes(rng, arrays.obj_hw, (H, W)) for _ in range(B)]
    )

    objs_dev = jnp.asarray(
        np.asarray(planarize_objects(jnp.asarray(arrays.objects[None])))
    )
    step = make_solid_render_step(
        (H, W), (pad_h, pad_w), bg_rgba=(128, 128, 128, 255),
        static_obj_hw=static_hw, stat="fence", fallback_mode="tiered",
    )
    dev_args = (None, objs_dev, jnp.asarray(hw), jnp.asarray(boxes))

    for _ in range(2):  # compile + reuse-program warmup
        out, stat = step(*dev_args)
        np.asarray(stat)

    t0 = time.perf_counter()
    for _ in range(reps):
        out, stat = step(*dev_args)
    np.asarray(stat)
    dt = time.perf_counter() - t0
    ms = dt / reps * 1e3
    print(
        f"RESULT mode={mode} ms_per_batch={ms:.3f} "
        f"canv_per_sec={B * reps / dt:.0f} "
        f"us_per_step={ms * 1e3 / (B * arrays.objects.shape[0]):.3f} "
        f"fallback={getattr(step, 'fallback', [None])[0]}"
    )


if __name__ == "__main__":
    main()
