"""Behavioral contract of the compose kernel (reference golden preserved).

Mirrors /root/reference/tests/test_compositor.py plus kernel-level cases.
"""

import numpy as np
from PIL import Image

from compositor import composite


def test_composite_places_object_pixel():
    bg = Image.new("RGBA", (10, 10), (255, 0, 0, 255))
    obj = Image.new("RGBA", (2, 2), (0, 255, 0, 255))
    out = composite(bg, {1: obj}, [{"object_id": 1, "box": [4, 4, 6, 6]}])
    assert out.getpixel((4, 4))[:3] == (0, 255, 0)


def test_composite_exact_identity_paste():
    bg = Image.new("RGBA", (10, 10), (255, 0, 0, 255))
    obj = Image.new("RGBA", (2, 2), (0, 255, 0, 255))
    out = composite(bg, {1: obj}, [{"object_id": 1, "box": [4, 4, 6, 6]}])
    arr = np.asarray(out)
    assert (arr[4:6, 4:6, :3] == (0, 255, 0)).all()
    assert (arr[:4, :, 0] == 255).all() and (arr[6:, :, 0] == 255).all()


def test_composite_skips_unknown_ids_and_floors_size():
    bg = Image.new("RGBA", (8, 8), (1, 2, 3, 255))
    obj = Image.new("RGBA", (3, 3), (9, 9, 9, 255))
    out = composite(
        bg,
        {1: obj},
        [
            {"object_id": 99, "box": [0, 0, 4, 4]},  # unknown: skipped
            {"object_id": 1, "box": [2, 2, 2, 2]},  # degenerate: floors to 1x1
        ],
    )
    arr = np.asarray(out)
    assert tuple(arr[0, 0]) == (1, 2, 3, 255)
    assert tuple(arr[2, 2][:3]) == (9, 9, 9)
    assert tuple(arr[3, 3]) == (1, 2, 3, 255)


def test_composite_z_order_is_list_order():
    bg = Image.new("RGBA", (6, 6), (0, 0, 0, 255))
    a = Image.new("RGBA", (2, 2), (255, 0, 0, 255))
    b = Image.new("RGBA", (2, 2), (0, 0, 255, 255))
    out = composite(
        bg,
        {1: a, 2: b},
        [
            {"object_id": 1, "box": [1, 1, 3, 3]},
            {"object_id": 2, "box": [2, 2, 4, 4]},  # painted last, wins overlap
        ],
    )
    assert out.getpixel((2, 2))[:3] == (0, 0, 255)
    assert out.getpixel((1, 1))[:3] == (255, 0, 0)


def test_composite_semitransparent_blend_matches_pil():
    rng = np.random.default_rng(7)
    bg_arr = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    bg_arr[..., 3] = 255
    obj_arr = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    bg = Image.fromarray(bg_arr, "RGBA")
    obj = Image.fromarray(obj_arr, "RGBA")
    placement = [{"object_id": 1, "box": [3, 5, 3 + 4, 5 + 4]}]  # identity size
    ours = np.asarray(composite(bg, {1: obj}, placement))
    ref = bg.copy()
    ref.alpha_composite(obj, dest=(3, 5))
    assert np.array_equal(ours, np.asarray(ref))


def test_composite_canvas_smaller_than_objects():
    # canvas smaller than the object pad envelope exercises the grow path
    bg = Image.new("RGBA", (20, 12), (5, 5, 5, 255))
    obj = Image.new("RGBA", (40, 30), (200, 10, 10, 255))
    out = composite(bg, {1: obj}, [{"object_id": 1, "box": [4, 2, 44, 32]}])
    assert out.size == (20, 12)
    arr = np.asarray(out)
    assert tuple(arr[5, 10][:3]) == (200, 10, 10)  # inside the (cropped) paste
    assert tuple(arr[0, 0][:3]) == (5, 5, 5)


def test_composite_partial_right_bottom_overflow_matches_pil():
    rng = np.random.default_rng(9)
    bg_arr = rng.integers(0, 256, (30, 40, 4), dtype=np.uint8)
    bg_arr[..., 3] = 255
    obj_arr = rng.integers(0, 256, (10, 12, 4), dtype=np.uint8)
    bg = Image.fromarray(bg_arr, "RGBA")
    obj = Image.fromarray(obj_arr, "RGBA")
    # identity-size paste hanging off the right/bottom edge
    ours = np.asarray(
        composite(bg, {1: obj}, [{"object_id": 1, "box": [34, 25, 46, 35]}])
    )
    ref = bg.copy()
    ref.alpha_composite(obj, dest=(34, 25))
    assert np.array_equal(ours, np.asarray(ref))


def test_composite_empty_placements_returns_canvas_copy():
    bg = Image.new("RGBA", (8, 8), (9, 8, 7, 255))
    out = composite(bg, {}, [])
    assert np.array_equal(np.asarray(out), np.asarray(bg))


def test_composite_float_boxes_are_int_cast():
    bg = Image.new("RGBA", (10, 10), (0, 0, 0, 255))
    obj = Image.new("RGBA", (2, 2), (0, 255, 0, 255))
    out = composite(bg, {1: obj}, [{"object_id": 1, "box": [4.9, 4.1, 6.9, 6.1]}])
    assert out.getpixel((4, 4))[:3] == (0, 255, 0)  # int() truncation, as PIL
