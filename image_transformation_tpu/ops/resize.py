"""PIL-parity separable resampling expressed as MXU matmuls.

The reference's hot pixel op is ``Image.resize(..., Image.LANCZOS)``
(/root/reference/compositor.py:20). On TPU we recast separable resampling as
matrix multiplies against per-axis coefficient tables:

    out = clip8( KV @ clip8( img @ KH^T ) )        (fixed-point int32)

Pillow's 8-bit path is fixed-point: coefficients are quantized to
int32 * 2^22 and accumulated in int32 with a +2^21 rounding bias
(Resample.c, PRECISION_BITS = 22). We replicate that arithmetic EXACTLY —
but keep the MXU busy — by bit-splitting each int32 coefficient into three
limbs (hi<<16 | mid<<8 | lo): each limb-matmul accumulates integers < 2^24,
which float32 represents exactly, so three f32 MXU matmuls reconstruct the
exact int32 sum. Result: bit-identical output to PIL at full matmul speed.

Coefficient tables come from two builders:
- host (numpy, float64): bit-exact vs Pillow's precompute_coeffs — used
  whenever sizes are concrete (the orchestrator path: boxes are host data);
- in-graph (float32): for traced sizes inside fully-fused batched programs;
  ~1e-7 coefficient error can flip a final rounding ±1 (rare), still well
  inside the 1/255 budget.

RGBA handling matches PIL bit-for-bit: premultiply to "RGBa" (MULDIV255
rounding), resample each channel, unpremultiply (floor(255*c/a), alpha==0
passthrough), with PIL's plain-copy shortcut when sizes are unchanged.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PRECISION_BITS = 22  # Pillow: 32 - 8 - 2
_HALF = 1 << (PRECISION_BITS - 1)

_SUPPORT = {"lanczos": 3.0, "bilinear": 1.0}


# ------------------------- filters (f32, in-graph) -------------------------

# lanczos3(x) = 3 sin(pi x) sin(pi x/3) / (pi x)^2 is an even analytic
# function; a polynomial in u = x^2 (Chebyshev fit on u in [0, 9], converted
# to the power basis for Horner) replaces two transcendental sin()
# expansions per entry. Degree 12 already reaches the f32-evaluation floor
# (max err 5.4e-7 ~ 2 quantized-table units — same as degree 18, same order
# as f32 sin() error) and measured IDENTICAL max quantized-table deviation
# vs the host-exact builder (213/2^22 on the bench size sweep). Table
# construction measured 2.27 (sin) -> 1.21 (deg-18) -> ~1.0 ms (deg-12) per
# 64-object batch on v5e (benchmarks/table_variants.py, --staged: the
# Horner eval dominates the build).
_LANCZOS3_POLY_U = (
    0.019992724061012268, 0.12934572994709015, -0.43056443333625793,
    0.2683068513870239, 0.3336562514305115, -0.6404303312301636,
    0.4925920069217682, -0.2359950840473175, 0.08007098734378815,
    -0.020507415756583214, 0.004155285656452179, -0.0007197138038463891,
    9.71919289440848e-05,
)


def _filter_lanczos3(x: jnp.ndarray) -> jnp.ndarray:
    # t clamps to the fit domain: out-of-support entries are masked to zero
    # below, but unclamped t^18 would overflow to inf first.
    t = jnp.minimum(x * x * (1.0 / 4.5) - 1.0, 1.0)
    acc = jnp.full_like(t, _LANCZOS3_POLY_U[-1])
    for c in reversed(_LANCZOS3_POLY_U[:-1]):
        acc = acc * t + c
    return jnp.where(jnp.abs(x) < 3.0, acc, 0.0)


def _filter_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


_FILTERS = {"lanczos": _filter_lanczos3, "bilinear": _filter_bilinear}


# -------------------- host coefficient builder (exact) --------------------

def _np_lanczos3(x: np.ndarray) -> np.ndarray:
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(np.abs(x) < 3.0, np.sinc(x) * np.sinc(x / 3.0), 0.0)
    return out


def _np_bilinear(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


_NP_FILTERS = {"lanczos": _np_lanczos3, "bilinear": _np_bilinear}


@functools.lru_cache(maxsize=4096)
def build_coeffs_host(
    in_size: int,
    out_size: int,
    in_max: int,
    out_max: int,
    method: str = "lanczos",
    box: Tuple[float, float] = (0.0, -1.0),
) -> np.ndarray:
    """Bit-exact Pillow coefficient table, int32 [out_max, in_max].

    Float64 window/normalization and the C-cast half-away-from-zero
    quantization reproduce precompute_coeffs + normalize_coeffs_8bpc.
    ``box`` = (in0, in1) supports PIL's fractional source boxes (used by
    the reduce() pre-pass of thumbnail); in1 < 0 means the full extent.
    """
    filt = _NP_FILTERS[method]
    out_size = max(1, out_size)
    in0, in1 = box
    if in1 < 0:
        in1 = float(in_size)
    scale = (in1 - in0) / out_size
    filterscale = max(scale, 1.0)
    support = _SUPPORT[method] * filterscale
    ss = 1.0 / filterscale

    table = np.zeros((out_max, in_max), np.int32)
    for o in range(min(out_size, out_max)):
        center = in0 + (o + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        i = np.arange(xmin, xmax, dtype=np.float64)
        k = filt((i - center + 0.5) * ss)
        s = k.sum()
        if s != 0.0:
            k = k / s
        q = np.trunc(
            k * (1 << PRECISION_BITS) + np.where(k < 0, -0.5, 0.5)
        ).astype(np.int32)
        table[o, xmin:xmax] = q
    return table


# ------------------- in-graph coefficient builder (f32) -------------------

def resample_coeff_matrix(
    in_size,
    out_size,
    in_max: int,
    out_max: int,
    method: str = "lanczos",
    out_offset=0,
) -> jnp.ndarray:
    """Float32 [out_max, in_max] normalized coefficient matrix for traced
    sizes. Rows outside [out_offset, out_offset + out_size) and taps >=
    in_size are zero — a nonzero (traced) ``out_offset`` bakes a
    destination shift into the table for free (used to emit window-aligned
    sources for the Pallas blend kernels)."""
    filt = _FILTERS[method]
    support0 = _SUPPORT[method]

    in_f = jnp.asarray(in_size).astype(jnp.float32)
    out_f = jnp.maximum(jnp.asarray(out_size).astype(jnp.float32), 1.0)
    off = jnp.asarray(out_offset).astype(jnp.float32)
    scale = in_f / out_f
    filterscale = jnp.maximum(scale, 1.0)
    support = support0 * filterscale
    inv_fs = 1.0 / filterscale

    o = jnp.arange(out_max, dtype=jnp.float32)[:, None] - off
    i = jnp.arange(in_max, dtype=jnp.float32)[None, :]
    center = (o + 0.5) * scale

    xmin = jnp.clip(jnp.trunc(center - support + 0.5), 0.0, in_f)
    xmax = jnp.clip(jnp.trunc(center + support + 0.5), 0.0, in_f)
    window = (i >= xmin) & (i < xmax)

    w = filt((i - center + 0.5) * inv_fs) * window.astype(jnp.float32)
    # (Measured: an optimization_barrier here to stop XLA re-computing the
    # Horner filter in both consumer fusions was NET NEUTRAL — the 35 MB
    # materialization round-trip costs what the recompute does.)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    w = w / jnp.where(wsum != 0.0, wsum, 1.0)
    return w * ((o >= 0) & (o < out_f)).astype(jnp.float32)


def quantize_coeffs(w_f32: jnp.ndarray) -> jnp.ndarray:
    """Quantize normalized f32 coefficients to Pillow's int32 fixed point."""
    scaled = w_f32 * float(1 << PRECISION_BITS)
    return jnp.trunc(scaled + jnp.where(w_f32 < 0, -0.5, 0.5)).astype(jnp.int32)


def build_coeffs_traced(in_size, out_size, in_max, out_max, method="lanczos",
                        out_offset=0):
    return quantize_coeffs(
        resample_coeff_matrix(in_size, out_size, in_max, out_max, method, out_offset)
    )


def resize_f32_shifted(
    img_f32: jnp.ndarray,
    in_hw,
    out_hw,
    out_offset_hw,
    out_max_hw: Tuple[int, int],
    method: str = "lanczos",
) -> jnp.ndarray:
    """Like :func:`resize_f32` but the live output region starts at
    ``out_offset_hw`` (traced) inside the static buffer — the shift is
    baked into the coefficient tables at zero extra cost. The PIL
    identity-size shortcut is handled by the caller (it needs a shifted
    copy, not a resample)."""
    in_h, in_w = in_hw
    out_h, out_w = out_hw
    off_y, off_x = out_offset_hw
    out_max_h, out_max_w = out_max_hw
    in_max_h, in_max_w = img_f32.shape[0], img_f32.shape[1]
    channels = img_f32.shape[2]

    src = premultiply_rgba(img_f32).astype(jnp.float32) if channels == 4 else img_f32
    kh = build_coeffs_traced(in_w, out_w, in_max_w, out_max_w, method, off_x)
    kv = build_coeffs_traced(in_h, out_h, in_max_h, out_max_h, method, off_y)
    out = resample_fixed_traced(src, kh, kv)
    if channels == 4:
        out = unpremultiply_rgba(out).astype(jnp.float32)
    return out


# ----------------------- exact fixed-point resample -----------------------

def _split_limbs(k_i32: jnp.ndarray):
    """kk = (hi << 16) + (mid << 8) + lo with mid, lo in [0, 255].

    Arithmetic right-shift keeps the identity for negative coefficients.
    Every limb fits bfloat16 exactly (8 significand bits cover [-64, 255]),
    and the MXU multiplies bf16 operands into f32 accumulators, so the
    limb matmuls are EXACT integer arithmetic at native bf16 speed.
    """
    hi = k_i32 >> 16
    rem = k_i32 - (hi << 16)
    mid = rem >> 8
    lo = rem - (mid << 8)
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


#: Max live taps per coefficient row the f32 limb accumulators can sum
#: EXACTLY: limb products reach 255 (pixel) x 255 (mid/lo limb), so a row
#: sum stays under 2^24 (f32's exact-integer range) only up to
#: 2^24 / 65025 = 258 terms. Beyond that the caller must select the
#: chunked wide path.
_EXACT_TAP_LIMIT = 256


def needs_wide_accumulation(
    in_size: int, out_size: int, method: str = "lanczos"
) -> bool:
    """True when a downscale is extreme enough that one output pixel's
    coefficient row has more live taps than the single-dot limb path can
    accumulate exactly (taps = 2*ceil(support*scale) + 2 — e.g. a
    2048-px object into a <=15-px box for lanczos). Callers with concrete
    sizes use this to pick ``wide=True`` on the exact resample entry
    points; the flag is static, so common workloads keep today's single
    fused dot."""
    scale = max(1.0, float(in_size) / max(1, int(out_size)))
    taps = 2 * int(np.ceil(_SUPPORT[method] * scale)) + 2
    return taps > _EXACT_TAP_LIMIT


def _limb_matmul(
    img_f32: jnp.ndarray, k_i32: jnp.ndarray, spec: str, wide: bool = False
) -> jnp.ndarray:
    """Exact int32 matmul Σ kk*p via exact bf16 MXU matmuls.

    The three limb tables concatenate along the output dim into ONE dot so
    the image operand streams from HBM once instead of three times.

    ``wide=True`` (static): chunk the contraction into _EXACT_TAP_LIMIT
    pieces, convert each f32 partial (exact: < 2^24) to int32, and sum the
    chunks in int32 — exact for ANY tap count (row totals are bounded by
    255*255*in_max < 2^31, and the final limb recombination is correct
    modulo 2^32 because the true Σ k*p is normalization-bounded under
    2^30). Needed only for extreme downscales; see
    :func:`needs_wide_accumulation`."""
    hi, mid, lo = _split_limbs(k_i32)
    img_bf = img_f32.astype(jnp.bfloat16)  # uint8 values: exact in bf16
    k3 = jnp.concatenate([hi, mid, lo], axis=0)  # [3*out_max, in_max]
    n_out = k_i32.shape[0]
    if not wide:
        s3 = jnp.einsum(spec, img_bf, k3, preferred_element_type=jnp.float32)
        # the contraction output axis ('o') is the last axis for
        # "hic,oi->hoc" and the first for "hwc,oh->owc"
        out_axis = 1 if spec == "hic,oi->hoc" else 0
        s_hi, s_mid, s_lo = (
            jax.lax.slice_in_dim(
                s3, j * n_out, (j + 1) * n_out, axis=out_axis
            ).astype(jnp.int32)
            for j in range(3)
        )
        return (s_hi << 16) + (s_mid << 8) + s_lo

    q = _EXACT_TAP_LIMIT
    in_max = k_i32.shape[1]
    pad = (-in_max) % q
    nc = (in_max + pad) // q
    k3c = jnp.pad(k3, ((0, 0), (0, pad))).reshape(3 * n_out, nc, q)
    if spec == "hic,oi->hoc":
        imgc = jnp.pad(img_bf, ((0, 0), (0, pad), (0, 0))).reshape(
            img_bf.shape[0], nc, q, img_bf.shape[2]
        )
        s3 = jnp.sum(
            jnp.einsum(
                "hnqc,onq->hocn", imgc, k3c,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32),
            axis=-1,
        )
        out_axis = 1
    else:  # "hwc,oh->owc": contraction over the leading image axis
        imgc = jnp.pad(img_bf, ((0, pad), (0, 0), (0, 0))).reshape(
            nc, q, img_bf.shape[1], img_bf.shape[2]
        )
        s3 = jnp.sum(
            jnp.einsum(
                "nqwc,onq->owcn", imgc, k3c,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32),
            axis=-1,
        )
        out_axis = 0
    s_hi, s_mid, s_lo = (
        jax.lax.slice_in_dim(s3, j * n_out, (j + 1) * n_out, axis=out_axis)
        for j in range(3)
    )
    return (s_hi << 16) + (s_mid << 8) + s_lo


def _clip8(ss: jnp.ndarray) -> jnp.ndarray:
    """Pillow clip8: (ss >> 22) clamped to [0, 255] (ss carries +2^21)."""
    shifted = ss >> PRECISION_BITS
    return jnp.clip(shifted, 0, 255)


def resample_fixed(
    img_u8f: jnp.ndarray, kh_i32: jnp.ndarray, kv_i32: jnp.ndarray,
    wide: bool = False,
) -> jnp.ndarray:
    """Two-pass fixed-point resample, bit-exact vs Pillow given its tables.

    img_u8f: float32 [Hin_max, Win_max, C] holding uint8 values.
    kh_i32: [Wout_max, Win_max]; kv_i32: [Hout_max, Hin_max].
    Returns float32 [Hout_max, Wout_max, C] of uint8 values.
    ``wide`` (static): chunked-exact accumulation for extreme downscales
    (see :func:`needs_wide_accumulation`).
    """
    # Horizontal pass first (PIL order): tmp[h,o,c] = clip8(half + Σ_i kk[o,i] p[h,i,c])
    ss_h = _limb_matmul(img_u8f, kh_i32, "hic,oi->hoc", wide=wide) + _HALF
    tmp = _clip8(ss_h).astype(jnp.bfloat16)  # uint8 values: exact, half the traffic
    ss_v = _limb_matmul(tmp, kv_i32, "hwc,oh->owc", wide=wide) + _HALF
    return _clip8(ss_v).astype(jnp.float32)


def resample_fixed_traced(
    img_u8f: jnp.ndarray, kh_i32: jnp.ndarray, kv_i32: jnp.ndarray
) -> jnp.ndarray:
    """Traced-path resample: ONE f32 dot per pass at HIGHEST precision.

    The exact 3-limb formulation materializes 3x-wide f32 intermediates
    (2x ~245 MB per 64-object 1080p batch, HLO-verified the dominant HBM
    traffic); a single f32xf32 dot at Precision.HIGHEST (bf16_6x on the
    MXU) is ~1e-5-of-a-rounding-step accurate — far below the traced
    coefficient-table deviation — and measured 4.96 -> 4.08 ms/batch
    (benchmarks/resample_precision.py).

    NOT a substitute for :func:`resample_fixed` on the host-exact path:
    the f32 sum of the true int32 accumulator (<= 2^30) carries up to ~64
    absolute error, and uniform-color regions sit exactly on >>22 rounding
    boundaries, so the exact path would flip there. Traced tables already
    deviate by far more than 1.5e-5 of a step, so here the dot error is
    invisible.

    Arithmetic notes: multiplying by 2^-22 is exponent-exact, floor ==
    Pillow's arithmetic >> for negatives, and the inter-pass clip keeps
    uint8-exact f32 values.
    """
    inv = 1.0 / (1 << PRECISION_BITS)

    def one_pass(img, k_i32, spec):
        ss = jnp.einsum(
            spec, img, k_i32.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) + float(_HALF)
        return jnp.clip(jnp.floor(ss * inv), 0, 255)

    tmp = one_pass(img_u8f, kh_i32, "hic,oi->hoc")
    return one_pass(tmp, kv_i32, "hwc,oh->owc")


# ----------------------- RGBA premultiplied handling -----------------------

def premultiply_rgba(img: jnp.ndarray) -> jnp.ndarray:
    """RGBA -> RGBa, bit-exact vs Pillow's MULDIV255 (round(c*a/255))."""
    rgba = img.astype(jnp.int32)
    a = rgba[..., 3:4]
    tmp = rgba[..., :3] * a + 128
    rgb = ((tmp >> 8) + tmp) >> 8
    return jnp.concatenate([rgb, a], axis=-1)


def unpremultiply_rgba(img: jnp.ndarray) -> jnp.ndarray:
    """RGBa -> RGBA, bit-exact vs Pillow: floor(255*c/a), passthrough at a=0.

    The division uses an f32 reciprocal multiply + one exact correction
    step instead of s32 ``//`` (which XLA expands into a long multi-op
    sequence on the VPU — profile-attributed as the producer's single
    largest fusion). Exact: num <= 65025 is f32-exact, the reciprocal
    quotient is within 1 of truth, and the remainder check fixes it.
    """
    rgba = img.astype(jnp.int32)
    a = rgba[..., 3:4]
    num = 255 * rgba[..., :3]
    den = jnp.maximum(a, 1)
    q = jnp.floor(
        num.astype(jnp.float32) * (1.0 / den.astype(jnp.float32))
    ).astype(jnp.int32)
    r = num - q * den
    q = q + (r >= den).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    rgb = jnp.minimum(255, q)
    rgb = jnp.where(a == 0, rgba[..., :3], rgb)
    return jnp.concatenate([rgb, a], axis=-1)


# ------------------------------ public entry ------------------------------

def resize_with_tables(
    img_f32: jnp.ndarray,
    kh_i32: jnp.ndarray,
    kv_i32: jnp.ndarray,
    same_size,
    traced: bool = False,
    wide: bool = False,
) -> jnp.ndarray:
    """Resample uint8-valued f32 [Hm,Wm,C] with given tables; RGBA inputs
    take the premultiplied path. ``same_size`` (bool scalar, may be traced)
    selects PIL's plain-copy shortcut. ``traced=True`` uses the faster
    HIGHEST-precision f32 resample (traced-table callers only — see
    resample_fixed_traced); the default limb path is bit-exact. ``wide``
    (static, exact path only) selects chunked-exact accumulation for
    extreme downscales (see :func:`needs_wide_accumulation`)."""
    channels = img_f32.shape[2]
    out_max_h, out_max_w = kv_i32.shape[0], kh_i32.shape[0]

    src = premultiply_rgba(img_f32).astype(jnp.float32) if channels == 4 else img_f32
    if traced:
        out = resample_fixed_traced(src, kh_i32, kv_i32)
    else:
        out = resample_fixed(src, kh_i32, kv_i32, wide=wide)
    if channels == 4:
        out = unpremultiply_rgba(out).astype(jnp.float32)

    copy_h = min(img_f32.shape[0], out_max_h)
    copy_w = min(img_f32.shape[1], out_max_w)
    passthrough = jnp.zeros((out_max_h, out_max_w, channels), jnp.float32)
    passthrough = passthrough.at[:copy_h, :copy_w].set(img_f32[:copy_h, :copy_w])
    return jnp.where(same_size, passthrough, out)


def resize_f32(
    img_f32: jnp.ndarray,
    in_hw,
    out_hw,
    out_max_hw: Tuple[int, int],
    method: str = "lanczos",
) -> jnp.ndarray:
    """Traced-size resample (in-graph f32 coefficient tables).

    Returns float32 [out_max_h, out_max_w, C]; live region [out_h, out_w],
    zeros beyond. Used inside fully-fused batched programs where sizes are
    data; concrete-size callers should prefer host tables (bit-exact).
    """
    in_h, in_w = in_hw
    out_h, out_w = out_hw
    out_max_h, out_max_w = out_max_hw
    in_max_h, in_max_w = img_f32.shape[0], img_f32.shape[1]
    kh = build_coeffs_traced(in_w, out_w, in_max_w, out_max_w, method)
    kv = build_coeffs_traced(in_h, out_h, in_max_h, out_max_h, method)
    same = (jnp.asarray(out_h) == jnp.asarray(in_h)) & (
        jnp.asarray(out_w) == jnp.asarray(in_w)
    )
    return resize_with_tables(img_f32, kh, kv, same, traced=True)


@functools.partial(jax.jit, static_argnames=("out_max_hw", "method"))
def resize_u8(
    img_u8: jnp.ndarray,
    in_hw,
    out_hw,
    out_max_hw: Tuple[int, int],
    method: str = "lanczos",
) -> jnp.ndarray:
    """uint8 wrapper over :func:`resize_f32` (traced sizes)."""
    out = resize_f32(img_u8.astype(jnp.float32), in_hw, out_hw, out_max_hw, method)
    return out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("method", "wide"))
def _resize_exact_jit(img_u8, kh, kv, same, method="lanczos", wide=False):
    del method
    return resize_with_tables(
        img_u8.astype(jnp.float32), kh, kv, same, wide=wide
    ).astype(jnp.uint8)


def resize_exact_u8(
    img_u8: jnp.ndarray,
    in_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
    out_max_hw: Tuple[int, int],
    method: str = "lanczos",
) -> jnp.ndarray:
    """Concrete-size resample with host-built tables — bit-exact vs PIL."""
    in_h, in_w = int(in_hw[0]), int(in_hw[1])
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    kh = build_coeffs_host(in_w, out_w, img_u8.shape[1], out_max_hw[1], method)
    kv = build_coeffs_host(in_h, out_h, img_u8.shape[0], out_max_hw[0], method)
    same = (out_h == in_h) and (out_w == in_w)
    wide = needs_wide_accumulation(in_w, out_w, method) or (
        needs_wide_accumulation(in_h, out_h, method)
    )
    return _resize_exact_jit(
        img_u8, jnp.asarray(kh), jnp.asarray(kv), same, method, wide
    )
