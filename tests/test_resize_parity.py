"""PIL-parity tests for the MXU matmul resampler (PIL itself is the oracle)."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from image_transformation_tpu.ops.resize import (
    premultiply_rgba,
    resize_exact_u8,
    resize_u8,
    unpremultiply_rgba,
)


def _ours(img, oh, ow, out_max=None, method="lanczos"):
    ih, iw = img.shape[:2]
    out_max = out_max or (max(oh, ih), max(ow, iw))
    out = resize_u8(
        jnp.asarray(img),
        (jnp.int32(ih), jnp.int32(iw)),
        (jnp.int32(oh), jnp.int32(ow)),
        out_max,
        method,
    )
    return np.asarray(out)[:oh, :ow]


CASES = [
    (207, 357, 100, 180),  # squarespace photo downscale
    (62, 230, 62, 230),  # identity (PIL copies without resampling)
    (32, 131, 64, 262),  # 2x upscale
    (137, 257, 50, 90),
    (250, 970, 137, 534),  # background-scale downscale
    (10, 7, 33, 21),
    (5, 5, 1, 1),
]


@pytest.mark.parametrize("ih,iw,oh,ow", CASES)
def test_rgba_lanczos_matches_pil_premultiplied(ih, iw, oh, ow):
    """Compare in premultiplied space, where PIL actually resamples.

    The traced path builds coefficient tables in f32, which can land +-1
    fixed-point unit off PIL's f64 tables; a flipped horizontal-pass pixel
    then propagates through the vertical pass, so the premultiplied budget
    is +-2. (The exact path below is bit-exact; unpremultiplied RGB can
    additionally differ at near-transparent pixels, which cancels at
    composite time — the compose-level goldens pin that.)
    """
    rng = np.random.default_rng(ih * 1000 + ow)
    img = rng.integers(0, 256, (ih, iw, 4), dtype=np.uint8)
    pil = np.asarray(Image.fromarray(img, "RGBA").resize((ow, oh), Image.LANCZOS))
    got = _ours(img, oh, ow)
    pil_p = np.asarray(premultiply_rgba(jnp.asarray(pil)))
    got_p = np.asarray(premultiply_rgba(jnp.asarray(got)))
    diff = np.abs(pil_p.astype(int) - got_p.astype(int))
    assert diff.max() <= 2, f"premultiplied diff {diff.max()}"
    # alpha channel itself must match within 2 directly
    da = np.abs(pil[..., 3].astype(int) - got[..., 3].astype(int))
    assert da.max() <= 2


@pytest.mark.parametrize("ih,iw,oh,ow", CASES)
def test_opaque_rgba_lanczos_matches_pil_directly(ih, iw, oh, ow):
    rng = np.random.default_rng(ih + iw + oh + ow)
    img = rng.integers(0, 256, (ih, iw, 4), dtype=np.uint8)
    img[..., 3] = 255
    pil = np.asarray(Image.fromarray(img, "RGBA").resize((ow, oh), Image.LANCZOS))
    got = _ours(img, oh, ow)
    diff = np.abs(pil.astype(int) - got.astype(int))
    assert diff.max() <= 1


@pytest.mark.parametrize("ih,iw,oh,ow", CASES)
def test_exact_path_is_bit_exact_vs_pil(ih, iw, oh, ow):
    """Host-built float64 tables + fixed-point limb matmuls == PIL exactly."""
    rng = np.random.default_rng(ih * 7 + ow)
    img = rng.integers(0, 256, (ih, iw, 4), dtype=np.uint8)
    pil = np.asarray(Image.fromarray(img, "RGBA").resize((ow, oh), Image.LANCZOS))
    out = np.asarray(
        resize_exact_u8(
            jnp.asarray(img), (ih, iw), (oh, ow), (max(oh, ih), max(ow, iw))
        )
    )[:oh, :ow]
    assert np.array_equal(pil, out)


def test_bilinear_mode_matches_pil():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 60, 4), dtype=np.uint8)
    img[..., 3] = 255
    pil = np.asarray(Image.fromarray(img, "RGBA").resize((25, 90), Image.BILINEAR))
    got = _ours(img, 90, 25, method="bilinear")
    assert np.abs(pil.astype(int) - got.astype(int)).max() <= 1


def test_identity_resize_is_lossless_even_at_low_alpha():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (20, 20, 4), dtype=np.uint8)
    img[..., 3] = rng.integers(0, 5, (20, 20), dtype=np.uint8)  # near transparent
    got = _ours(img, 20, 20)
    assert np.array_equal(got, img)


def test_premultiply_roundtrip_formulas_match_pil():
    vals = np.arange(256, dtype=np.uint8)
    c, a = np.meshgrid(vals, vals, indexing="ij")
    rgba = np.stack([c, c, c, a], -1).astype(np.uint8)
    pil_prem = np.asarray(Image.fromarray(rgba, "RGBA").convert("RGBa"))
    ours_prem = np.asarray(premultiply_rgba(jnp.asarray(rgba))).astype(np.uint8)
    assert np.array_equal(pil_prem, ours_prem)
    pil_un = np.asarray(Image.frombuffer("RGBa", (256, 256), rgba.tobytes()).convert("RGBA"))
    ours_un = np.asarray(unpremultiply_rgba(jnp.asarray(rgba))).astype(np.uint8)
    assert np.array_equal(pil_un, ours_un)


def test_extreme_downscale_wide_accumulation_bit_exact():
    """Extreme downscales (taps > 256: a huge cutout in a 1-px-ish box)
    route to the chunked-exact wide limb path and stay bit-exact vs PIL.
    The single-dot path's f32 limb accumulators exceed 2^24 there — an
    invariant violation that XLA's CPU reduce order happens not to expose
    but the TPU MXU's accumulation order is not guaranteed to forgive."""
    from image_transformation_tpu.ops.resize import needs_wide_accumulation

    rng = np.random.default_rng(11)
    cases = [(1600, 1200, 3, 2), (2048, 64, 2, 16), (900, 1800, 40, 2)]
    for W_in, H_in, w, h in cases:
        assert needs_wide_accumulation(W_in, w) or needs_wide_accumulation(
            H_in, h
        )
        img = rng.integers(0, 256, (H_in, W_in, 4), np.uint8)
        img[..., 3] = rng.integers(1, 256, (H_in, W_in), np.uint8)
        pil = np.asarray(
            Image.fromarray(img, "RGBA").resize((w, h), Image.LANCZOS)
        )
        out = np.asarray(
            resize_exact_u8(jnp.asarray(img), (H_in, W_in), (h, w), (h, w))
        )
        assert np.array_equal(out[:h, :w], pil), (W_in, H_in, w, h)
        # boundary-adversarial: uniform colors land exactly on >>22
        # rounding boundaries
        flat = np.full((H_in, W_in, 4), 137, np.uint8)
        flat[..., 3] = 255
        pil_f = np.asarray(
            Image.fromarray(flat, "RGBA").resize((w, h), Image.LANCZOS)
        )
        out_f = np.asarray(
            resize_exact_u8(jnp.asarray(flat), (H_in, W_in), (h, w), (h, w))
        )
        assert np.array_equal(out_f[:h, :w], pil_f), (W_in, H_in, w, h)


def test_composite_exact_extreme_downscale_matches_pil():
    """composite_exact auto-selects the wide program when any placement is
    an extreme downscale; output stays bit-exact vs the PIL pipeline."""
    from image_transformation_tpu.ops.compose import composite_exact

    rng = np.random.default_rng(12)
    H_in, W_in = 40, 1500
    obj = rng.integers(0, 256, (H_in, W_in, 4), np.uint8)
    canvas = np.full((64, 96, 4), 200, np.uint8)
    box = [10, 20, 14, 25]  # 4x5 box from a 1500-wide object: taps >> 256
    # PIL oracle (reference compositor semantics)
    pil_canvas = Image.fromarray(canvas, "RGBA")
    resized = Image.fromarray(obj, "RGBA").resize((4, 5), Image.LANCZOS)
    pil_canvas.alpha_composite(resized, dest=(10, 20))
    expect = np.asarray(pil_canvas)
    got = np.asarray(
        composite_exact(
            canvas, obj[None], np.array([[H_in, W_in]]), [box]
        )
    )
    assert np.array_equal(got, expect)
