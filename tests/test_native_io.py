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
    assert nio.encode_png_rgba_bytes(img) is None
    data2 = nio.png_bytes(img)  # PIL fallback
    back2 = np.asarray(Image.open(io.BytesIO(data2)).convert("RGBA"))
    assert np.array_equal(back2, img)
