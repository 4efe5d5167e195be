"""Background synthesis parity: histogram medians and vectorized gradients.

Oracles are inline numpy formulations of the documented reference behavior
(np.median over masked pixels + int() truncation; f32 lerp + uint8 trunc).
"""

import numpy as np
from PIL import Image

import jax.numpy as jnp

import background_resizing as br
from image_transformation_tpu.ops.background import (
    gradient_canvas,
    masked_median_rgb,
    solid_canvas,
)


def _np_masked_median(rgba):
    alpha = rgba[:, :, 3]
    mask = alpha > 0
    rgb = rgba[:, :, :3][mask] if mask.any() else rgba[:, :, :3].reshape(-1, 3)
    return tuple(int(x) for x in np.median(rgb, axis=0))


def test_masked_median_matches_numpy_random():
    rng = np.random.default_rng(0)
    for trial in range(8):
        rgba = rng.integers(0, 256, (31, 47, 4), dtype=np.uint8)
        if trial == 0:
            rgba[..., 3] = 0  # fully transparent fallback path
        got = tuple(int(x) for x in np.asarray(masked_median_rgb(jnp.asarray(rgba))))
        assert got == _np_masked_median(rgba), f"trial {trial}"


def test_median_even_count_truncates_like_reference():
    # two pixels -> median is the average of both, truncated by int()
    rgba = np.zeros((1, 2, 4), np.uint8)
    rgba[0, 0] = (10, 0, 255, 255)
    rgba[0, 1] = (13, 0, 254, 255)
    got = tuple(int(x) for x in np.asarray(masked_median_rgb(jnp.asarray(rgba))))
    assert got == (11, 0, 254)  # 11.5 -> 11, 254.5 -> 254


def test_fill_solid_on_bundles_matches_reference_semantics():
    for bundle in ("squarespace", "audio_book"):
        path = f"data/{bundle}/background.png"
        img = np.asarray(Image.open(path).convert("RGBA"))
        expect = _np_masked_median(img)
        out = np.asarray(br.fill_solid(path, (32, 16)))
        assert out.shape == (16, 32, 4)
        assert tuple(out[0, 0][:3]) == expect
        assert (out[..., 3] == 255).all()
        assert (out == out[0, 0]).all()


def test_gradient_canvas_truncates_like_reference_loop():
    c1, c2 = np.array([10, 200, 33], np.uint8), np.array([250, 5, 127], np.uint8)
    h, w = 9, 17
    out = np.asarray(gradient_canvas(jnp.asarray(c1), jnp.asarray(c2), h, w, True))
    # reference loop oracle
    expect = np.zeros((h, w, 4), np.uint8)
    for x in range(w):
        t = x / max(1, w - 1)
        rgb = (1 - t) * c1.astype(np.float32) + t * c2.astype(np.float32)
        expect[:, x, :3] = rgb.astype(np.uint8)
    expect[:, :, 3] = 255
    assert np.array_equal(out, expect)
    # vertical variant
    outv = np.asarray(gradient_canvas(jnp.asarray(c1), jnp.asarray(c2), h, w, False))
    assert np.array_equal(outv[:, 0], outv[:, -1])
    assert tuple(outv[0, 0][:3]) == tuple(c1)


def test_gradient_canvas_reference_parity_fuzz():
    """Randomized bit-exactness vs the reference's per-line loop: the f64
    weights (1 - t computed in f64, cast to f32 at the multiply) matter —
    an f32 (1.0 - t) flips round-to-even ties one ulp low and truncates
    the u8 cast off by one on ~0.03% of (width, color) rows."""
    rng = np.random.default_rng(7)
    for _ in range(300):
        w = int(rng.integers(2, 600))
        c1 = rng.integers(0, 256, 3).astype(np.uint8)
        c2 = rng.integers(0, 256, 3).astype(np.uint8)
        out = np.asarray(
            gradient_canvas(jnp.asarray(c1), jnp.asarray(c2), 1, w, True)
        )
        expect = np.zeros((1, w, 4), np.uint8)
        for x in range(w):
            t = x / max(1, w - 1)
            rgb = (1 - t) * c1.astype(np.float32) + t * c2.astype(np.float32)
            expect[:, x, :3] = rgb.astype(np.uint8)
        expect[:, :, 3] = 255
        assert np.array_equal(out, expect), (w, c1.tolist(), c2.tolist())


def test_fill_gradient_axis_choice():
    # horizontally-uniform image -> horizontal gradient (variance 0 on that axis)
    arr = np.zeros((20, 40, 4), np.uint8)
    arr[:10] = (200, 0, 0, 255)
    arr[10:] = (0, 0, 200, 255)
    p = "/tmp/_grad_axis_test.png"
    Image.fromarray(arr, "RGBA").save(p)
    out = np.asarray(br.fill_gradient(p, (40, 20)))
    # left and right strips have identical medians -> horizontal wins ties
    assert np.array_equal(out[:, 0], out[:, -1]) or not np.array_equal(out[0], out[-1])


def test_solid_canvas_shape_dtype():
    out = np.asarray(solid_canvas(jnp.asarray(np.array([1, 2, 3], np.uint8)), 4, 6))
    assert out.shape == (4, 6, 4) and out.dtype == np.uint8
    assert tuple(out[2, 3]) == (1, 2, 3, 255)
