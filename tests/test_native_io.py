"""Native PNG codec vs PIL on synthetic images and the shipped bundles."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from image_transformation_tpu.core import native_io

pytestmark = pytest.mark.skipif(
    not native_io.native_available(), reason="native library not built"
)


def test_decode_matches_pil_on_bundles():
    for bundle in ("squarespace", "audio_book"):
        base = Path("data") / bundle
        items = json.loads((base / "results.json").read_text())
        paths = [base / "background.png"] + [base / it["filename"] for it in items]
        for p in paths:
            ref = np.asarray(Image.open(p).convert("RGBA"))
            got = native_io.decode_png_rgba(p)
            assert got is not None, p
            assert np.array_equal(got, ref), p


def test_decode_synthetic_color_types(tmp_path):
    rng = np.random.default_rng(0)
    cases = {
        "rgba": Image.fromarray(rng.integers(0, 256, (37, 23, 4), dtype=np.uint8), "RGBA"),
        "rgb": Image.fromarray(rng.integers(0, 256, (16, 41, 3), dtype=np.uint8), "RGB"),
        "gray": Image.fromarray(rng.integers(0, 256, (9, 9), dtype=np.uint8), "L"),
        "pal": Image.fromarray(
            rng.integers(0, 256, (12, 15, 3), dtype=np.uint8), "RGB"
        ).convert("P"),
    }
    for name, img in cases.items():
        p = tmp_path / f"{name}.png"
        img.save(p)
        ref = np.asarray(Image.open(p).convert("RGBA"))
        got = native_io.decode_png_rgba(p)
        assert got is not None, name
        assert np.array_equal(got, ref), name


def test_encode_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    rgba = rng.integers(0, 256, (64, 48, 4), dtype=np.uint8)
    p = tmp_path / "out.png"
    assert native_io.encode_png_rgba(rgba, p)
    back_pil = np.asarray(Image.open(p).convert("RGBA"))
    assert np.array_equal(back_pil, rgba)
    back_native = native_io.decode_png_rgba(p)
    assert np.array_equal(back_native, rgba)


def test_batch_decode_into_padded():
    base = Path("data/squarespace")
    items = json.loads((base / "results.json").read_text())
    paths = [base / it["filename"] for it in items]
    result = native_io.batch_decode_into_padded(paths, n_slots=6, pad_hw=(256, 512))
    assert result is not None
    tensor, hw = result
    assert tensor.shape == (6, 256, 512, 4)
    for k, p in enumerate(paths):
        ref = np.asarray(Image.open(p).convert("RGBA"))
        h, w = ref.shape[:2]
        assert tuple(hw[k]) == (h, w)
        assert np.array_equal(tensor[k, :h, :w], ref)
        assert (tensor[k, h:] == 0).all() and (tensor[k, :, w:] == 0).all()
    assert (hw[len(paths):] == 0).all()


def test_batch_decode_rejects_oversize():
    base = Path("data/squarespace")
    items = json.loads((base / "results.json").read_text())
    paths = [base / it["filename"] for it in items]
    assert native_io.batch_decode_into_padded(paths, 6, (8, 8)) is None


def test_save_png_fallback_api(tmp_path):
    rgba = np.zeros((5, 7, 4), np.uint8)
    rgba[..., 3] = 255
    native_io.save_png(rgba, tmp_path / "a.png")
    assert np.array_equal(
        np.asarray(Image.open(tmp_path / "a.png").convert("RGBA")), rgba
    )


def test_png_bytes_roundtrip_and_fallback(monkeypatch):
    """In-memory native PNG encode round-trips exactly; PIL fallback kicks
    in when the native library is unavailable."""
    import io

    import numpy as np
    from PIL import Image

    import image_transformation_tpu.core.native_io as nio

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 56, 4), dtype=np.uint8)
    data = nio.png_bytes(img)
    back = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    assert np.array_equal(back, img)

    monkeypatch.setattr(nio, "load_library", lambda: None)
    assert native_io.encode_png_rgba_bytes(img) is None
    data2 = nio.png_bytes(img)  # PIL fallback
    back2 = np.asarray(Image.open(io.BytesIO(data2)).convert("RGBA"))
    assert np.array_equal(back2, img)


def test_corrupt_header_degrades_to_none(tmp_path):
    """A PNG declaring absurd dimensions must fail into the PIL-fallback
    contract (None), not raise MemoryError or abort the process inside
    the native decoder."""
    import struct

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_body = struct.pack(">IIBBBBB", 0x40000000, 0x40000000, 8, 6, 0, 0, 0)
    import zlib as _z

    chunk = (
        struct.pack(">I", len(ihdr_body)) + b"IHDR" + ihdr_body
        + struct.pack(">I", _z.crc32(b"IHDR" + ihdr_body))
    )
    idat = struct.pack(">I", 0) + b"IDAT" + struct.pack(">I", _z.crc32(b"IDAT"))
    p = tmp_path / "huge.png"
    p.write_bytes(sig + chunk + idat)
    assert native_io.probe_png(p) is None
    assert native_io.decode_png_rgba(p) is None


def test_rgb_color_key_transparency_falls_back_to_pil(tmp_path):
    """RGB PNGs with a tRNS color key are not implemented natively —
    decode must report failure (so the bundle path takes the bit-exact
    PIL fallback that APPLIES the key), never silently return alpha=255."""
    rgb = np.zeros((6, 6, 3), np.uint8)
    rgb[:3] = (10, 20, 30)  # keyed color
    rgb[3:] = (200, 100, 50)
    p = tmp_path / "keyed.png"
    Image.fromarray(rgb, "RGB").save(p, transparency=(10, 20, 30))
    # confirm PIL itself sees the transparency
    pil = np.asarray(Image.open(p).convert("RGBA"))
    assert (pil[:3, :, 3] == 0).all() and (pil[3:, :, 3] == 255).all()
    assert native_io.decode_png_rgba(p) is None  # native declines -> fallback


def test_encode_rejects_non_rgba_input():
    """The native encoder reads H*W*4 bytes; non-RGBA arrays must return
    None (PIL fallback raises its clean mode error) instead of an
    out-of-bounds read."""
    assert native_io.encode_png_rgba_bytes(np.zeros((4, 4, 3), np.uint8)) is None
    assert native_io.encode_png_rgba_bytes(np.zeros((4, 4), np.uint8)) is None
