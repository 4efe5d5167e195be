"""Bundle loaders: PIL view, padded array view, and the native fast path."""

import numpy as np
import pytest

from image_transformation_tpu.core.bundle import (
    Bundle,
    ensure_bundle,
    load_bundle,
    load_bundle_arrays,
)


def test_load_bundle_metadata():
    b = load_bundle("data/squarespace")
    assert b.object_ids() == [1, 2, 3, 4]
    assert b.id_to_label() == {1: "logo", 2: "photo", 3: "text", 4: "cta"}
    assert b.sizes()[2] == (357, 207)
    assert b.background.size == (970, 250)


def test_to_arrays_padding_and_order():
    b = load_bundle("data/audio_book")
    arrays = b.to_arrays(n_max=5, pad_hw=(300, 500))
    assert arrays.objects.shape == (5, 300, 500, 4)
    assert arrays.n_valid == 3
    assert arrays.object_ids[:3].tolist() == [1, 2, 3]
    assert arrays.object_ids[3:].tolist() == [-1, -1]
    for k, oid in enumerate(b.object_ids()):
        w, h = b.sizes()[oid]
        assert tuple(arrays.obj_hw[k]) == (h, w)
        ref = np.asarray(b.objects[oid])
        assert np.array_equal(arrays.objects[k, :h, :w], ref)
    assert arrays.index_of(2) == 1
    with pytest.raises(KeyError):
        arrays.index_of(99)


def test_to_arrays_rejects_too_small_padding():
    b = load_bundle("data/squarespace")
    with pytest.raises(ValueError):
        b.to_arrays(pad_hw=(10, 10))
    with pytest.raises(ValueError):
        b.to_arrays(n_max=2)


def test_ensure_bundle_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        ensure_bundle(tmp_path / "nope")


def test_load_bundle_arrays_fast_path_matches_pil_loader():
    fast, items = load_bundle_arrays("data/squarespace")
    slow = load_bundle("data/squarespace").to_arrays(
        pad_hw=(fast.objects.shape[1], fast.objects.shape[2])
    )
    assert np.array_equal(fast.objects, slow.objects)
    assert np.array_equal(fast.obj_hw, slow.obj_hw)
    assert np.array_equal(fast.object_ids, slow.object_ids)
    assert [int(it["object_id"]) for it in items] == [1, 2, 3, 4]
