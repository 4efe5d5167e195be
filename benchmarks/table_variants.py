"""Prototype faster lanczos3 filter evaluations for coefficient tables.

Variants:
  base      — current: 2x jnp.sin per entry
  triple    — 1x sin via sin(pi x) = s(3-4s^2), s = sin(pi x / 3)
  cheb      — sin-free even polynomial in u = x^2 on [0, 9]

Reports max |coeff diff| vs the host float64 tables (quantized int32 units)
and per-batch build time for the bench workload shapes.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    # ---- fit an even Chebyshev polynomial to lanczos3 on x in [0, 3] ----
    def lanczos3_f64(x):
        x = np.asarray(x, np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(np.abs(x) < 3.0, np.sinc(x) * np.sinc(x / 3.0), 0.0)
        return np.where(np.abs(x) < 1e-12, 1.0, out)

    # fit f(u) with u = x^2 in [0, 9]
    deg = 18
    u_nodes = (np.cos((2 * np.arange(400) + 1) / 800 * np.pi) + 1) / 2 * 9.0
    x_nodes = np.sqrt(u_nodes)
    vals = lanczos3_f64(x_nodes)
    # least squares in Chebyshev basis on u/4.5 - 1
    t = u_nodes / 4.5 - 1.0
    V = np.polynomial.chebyshev.chebvander(t, deg)
    coef, *_ = np.linalg.lstsq(V, vals, rcond=None)
    # convert to plain power basis for Horner eval
    pow_coef = np.polynomial.chebyshev.cheb2poly(coef)
    xs = np.linspace(0, 3, 200001)
    approx = np.polynomial.polynomial.polyval(xs**2 / 4.5 - 1.0, pow_coef)
    fit_err = np.max(np.abs(approx - lanczos3_f64(xs)))
    log(f"cheb deg {deg}: max fit err {fit_err:.3e}")
    POW = [float(c) for c in pow_coef.astype(np.float32)]

    def filt_base(x):
        ax = jnp.abs(x)
        safe = jnp.where(ax < 1e-7, 1.0, ax)
        px = jnp.pi * safe
        val = 3.0 * jnp.sin(px) * jnp.sin(px / 3.0) / (px * px)
        val = jnp.where(ax < 1e-7, 1.0, val)
        return jnp.where(ax < 3.0, val, 0.0)

    def filt_triple(x):
        ax = jnp.abs(x)
        safe = jnp.where(ax < 1e-7, 1.0, ax)
        px = jnp.pi * safe
        s = jnp.sin(px / 3.0)
        val = 3.0 * (s * s) * (3.0 - 4.0 * s * s) / (px * px)
        val = jnp.where(ax < 1e-7, 1.0, val)
        return jnp.where(ax < 3.0, val, 0.0)

    def filt_cheb(x):
        t = x * x * (1.0 / 4.5) - 1.0
        acc = jnp.full_like(t, POW[-1])
        for c in reversed(POW[:-1]):
            acc = acc * t + c
        return jnp.where(jnp.abs(x) < 3.0, acc, 0.0)

    FILTS = {"base": filt_base, "triple": filt_triple, "cheb": filt_cheb}

    # ---- correctness: build traced tables for bench-like sizes, compare ----
    from image_transformation_tpu.ops import resize as rz

    rng = np.random.default_rng(0)
    in_w, pad_w, mw_a = 357, 357, 384
    in_h, pad_h, mh_a = 207, 207, 208
    cases = []
    for _ in range(64):
        w = int(rng.integers(1, 358))
        h = int(rng.integers(1, 208))
        cases.append((h, w))

    def build(filt, in_size, out_size, in_max, out_max):
        # clone of resample_coeff_matrix + quantize with pluggable filter
        support0 = 3.0
        in_f = jnp.asarray(in_size).astype(jnp.float32)
        out_f = jnp.maximum(jnp.asarray(out_size).astype(jnp.float32), 1.0)
        scale = in_f / out_f
        filterscale = jnp.maximum(scale, 1.0)
        support = support0 * filterscale
        inv_fs = 1.0 / filterscale
        o = jnp.arange(out_max, dtype=jnp.float32)[:, None]
        i = jnp.arange(in_max, dtype=jnp.float32)[None, :]
        center = (o + 0.5) * scale
        xmin = jnp.clip(jnp.trunc(center - support + 0.5), 0.0, in_f)
        xmax = jnp.clip(jnp.trunc(center + support + 0.5), 0.0, in_f)
        window = (i >= xmin) & (i < xmax)
        w = filt((i - center + 0.5) * inv_fs) * window.astype(jnp.float32)
        wsum = jnp.sum(w, axis=1, keepdims=True)
        w = w / jnp.where(wsum != 0.0, wsum, 1.0)
        w = w * ((o >= 0) & (o < out_f)).astype(jnp.float32)
        scaled = w * float(1 << 22)
        return jnp.trunc(scaled + jnp.where(w < 0, -0.5, 0.5)).astype(jnp.int32)

    def make_pair(filt):
        @jax.jit
        def diff(h, w, ref_h, ref_v):
            kt_h = build(filt, in_w, w, pad_w, mw_a)
            kt_v = build(filt, in_h, h, pad_h, mh_a)
            return jnp.maximum(
                jnp.max(jnp.abs(kt_h - ref_h)), jnp.max(jnp.abs(kt_v - ref_v))
            )

        return diff

    for name, filt in FILTS.items():
        diff = make_pair(filt)
        worst = 0
        for h, w in cases[:16]:
            kh = jnp.asarray(rz.build_coeffs_host(in_w, w, pad_w, mw_a))
            kv = jnp.asarray(rz.build_coeffs_host(in_h, h, pad_h, mh_a))
            worst = max(worst, int(diff(jnp.asarray(h), jnp.asarray(w), kh, kv)))
        log(f"{name:7s} max |coeff - host_exact| = {worst} / {1 << 22}")

    # ---- speed: vmapped build of the bench batch (64 objects, H+V) ----
    hw = jnp.asarray(np.array([[h, w] for h, w in cases], np.int32))

    def make_tables(filt):
        @jax.jit
        def tables(hw_):
            def one(pair):
                kh = build(filt, in_w, pair[1], pad_w, mw_a)
                kv = build(filt, in_h, pair[0], pad_h, mh_a)
                return jnp.sum(kh) + jnp.sum(kv)

            return jnp.sum(jax.vmap(one)(hw_))

        return tables

    for name, filt in FILTS.items():
        tables = make_tables(filt)
        out = tables(hw)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(30):
            out = tables(hw)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / 30 * 1e3
        log(f"{name:7s} build: {ms:6.2f} ms / 64-object batch (H+V)")


def staged():
    """Stage-by-stage cost of the traced table build (poly filter)."""
    import time

    from image_transformation_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from image_transformation_tpu.ops import resize as rz

    in_w, pad_w, mw_a = 357, 357, 384
    in_h, pad_h, mh_a = 207, 207, 208
    rng = np.random.default_rng(0)
    hw = jnp.asarray(
        np.stack([rng.integers(1, 208, 64), rng.integers(1, 358, 64)], axis=1
                 ).astype(np.int32)
    )

    def build_staged(stage, in_size, out_size, in_max, out_max):
        in_f = jnp.asarray(in_size).astype(jnp.float32)
        out_f = jnp.maximum(jnp.asarray(out_size).astype(jnp.float32), 1.0)
        scale = in_f / out_f
        filterscale = jnp.maximum(scale, 1.0)
        support = 3.0 * filterscale
        inv_fs = 1.0 / filterscale
        o = jnp.arange(out_max, dtype=jnp.float32)[:, None]
        i = jnp.arange(in_max, dtype=jnp.float32)[None, :]
        center = (o + 0.5) * scale
        w = rz._filter_lanczos3((i - center + 0.5) * inv_fs)
        if stage == "filter":
            return w
        xmin = jnp.clip(jnp.trunc(center - support + 0.5), 0.0, in_f)
        xmax = jnp.clip(jnp.trunc(center + support + 0.5), 0.0, in_f)
        w = w * ((i >= xmin) & (i < xmax)).astype(jnp.float32)
        if stage == "window":
            return w
        wsum = jnp.sum(w, axis=1, keepdims=True)
        w = w / jnp.where(wsum != 0.0, wsum, 1.0)
        w = w * ((o >= 0) & (o < out_f)).astype(jnp.float32)
        if stage == "normalize":
            return w
        scaled = w * float(1 << 22)
        return jnp.trunc(scaled + jnp.where(w < 0, -0.5, 0.5)).astype(jnp.int32)

    for stage in ("filter", "window", "normalize", "quantize"):
        @jax.jit
        def tables(hw_, _s=stage):
            def one(pair):
                kh = build_staged(_s, in_w, pair[1], pad_w, mw_a)
                kv = build_staged(_s, in_h, pair[0], pad_h, mh_a)
                return jnp.sum(kh.astype(jnp.float32)) + jnp.sum(kv.astype(jnp.float32))
            return jnp.sum(jax.vmap(one)(hw_))

        out = tables(hw)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(30):
                out = tables(hw)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / 30 * 1e3)
        log(f"stage {stage:9s}: {best:6.2f} ms / 64-object batch (H+V)")


if __name__ == "__main__":
    import sys as _sys
    if "--staged" in _sys.argv:
        staged()
    else:
        main()
