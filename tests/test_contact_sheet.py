"""Contact sheet: thumbnail geometry/pixel parity and sheet structure."""

import numpy as np
import pytest
from PIL import Image

from image_transformation_tpu.ops.contact_sheet import (
    _premultiply_np,
    _reduce_np,
    build_contact_sheet_from_results,
    build_labeled_contact_sheet,
    thumbnail_exact_u8,
    thumbnail_size,
)


def test_thumbnail_size_matches_pil():
    rng = np.random.default_rng(0)
    for _ in range(40):
        w = int(rng.integers(1, 2000))
        h = int(rng.integers(1, 2000))
        im = Image.new("RGBA", (w, h))
        im.thumbnail((256, 256), Image.LANCZOS)
        assert thumbnail_size((w, h), (256, 256)) == im.size, (w, h)


@pytest.mark.parametrize("hw", [(207, 357), (800, 1200), (100, 1500), (50, 60)])
def test_thumbnail_pixels_bit_exact_vs_pil(hw):
    h, w = hw
    rng = np.random.default_rng(h + w)
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    pil = Image.fromarray(img, "RGBA")
    pil.thumbnail((256, 256), Image.LANCZOS)
    got = thumbnail_exact_u8(img, (256, 256))
    assert np.array_equal(got, np.asarray(pil))


def test_reduce_np_matches_pillow_fixed_point():
    # Pillow's reduce runs on premultiplied data inside resize; our
    # helper reproduces its fixed-point reciprocal rounding bit-exactly.
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (23, 31, 4), dtype=np.uint8)
    pil_rgba = Image.frombuffer("RGBa", (31, 23), img.tobytes())
    for f in [(2, 2), (3, 3), (2, 5), (4, 1)]:
        red = pil_rgba.reduce(f)
        ref = np.frombuffer(red.tobytes(), np.uint8).reshape(
            red.size[1], red.size[0], 4
        )
        got = _reduce_np(img, f[0], f[1])
        assert np.array_equal(got, ref), f


def test_sheet_layout_matches_reference_geometry():
    sheet = build_contact_sheet_from_results("data/squarespace/results.json")
    # 4 objects, 4 cols, 256x256 thumbs + 72px label band
    assert sheet.size == (4 * 256, 256 + 72)
    arr = np.asarray(sheet)
    assert (arr[-1, :, :3] >= 0).all()
    # white background in label band corners
    assert tuple(arr[300, 0][:3]) == (255, 255, 255)


def test_sheet_thumbnails_bit_exact_vs_pil():
    from image_transformation_tpu.core.bundle import load_bundle

    bundle = load_bundle("data/audio_book")
    sheet = np.asarray(build_labeled_contact_sheet(bundle.objects, bundle.id_to_label()))
    for k, oid in enumerate(sorted(bundle.objects)):
        th = bundle.objects[oid].copy()
        th.thumbnail((256, 256), Image.LANCZOS)
        ref = np.asarray(th)
        tw, tile_h = th.size
        x = k * 256 + (256 - tw) // 2
        y = (256 - tile_h) // 2
        got = sheet[y : y + tile_h, x : x + tw]
        # over white: alpha_composite of the thumb onto the white sheet
        white = np.full_like(ref, 255)
        expect = np.asarray(
            Image.alpha_composite(
                Image.fromarray(white, "RGBA"), Image.fromarray(ref, "RGBA")
            )
        )
        assert np.array_equal(got, expect), oid
