"""Canvas sizing and grid partition invariants (reference tests preserved)."""

from layout_constraints import compute_canvas_size, grid_cells, parse_ratio
from image_transformation_tpu.layout.canvas import ratio_family


def test_compute_canvas_size_preserves_ratio_and_pixels():
    ow, oh = 1920, 1080
    tw, th = compute_canvas_size((ow, oh), "9:16")
    assert abs((tw / th) - parse_ratio("9:16")) < 0.02
    assert abs(tw * th - ow * oh) / (ow * oh) < 0.02


def test_compute_canvas_size_reference_values():
    # Pinned concrete values (banker's rounding of sqrt budgets).
    assert compute_canvas_size((970, 250), "1:1", verbose=False) == (492, 492)
    assert compute_canvas_size((970, 250), "9:16", verbose=False) == (369, 657)
    assert compute_canvas_size((970, 250), "16:9", verbose=False) == (657, 369)
    assert compute_canvas_size((970, 250), "4:1", verbose=False) == (985, 246)
    assert compute_canvas_size((1920, 1080), "16:9", verbose=False) == (1920, 1080)


def test_grid_cells_bounds_and_count():
    tw, th = 1000, 2000
    cells = grid_cells((tw, th), margin_pct=0.05)
    assert len(cells) == 9
    for (x1, y1, x2, y2) in cells.values():
        assert 0 <= x1 < x2 <= tw
        assert 0 <= y1 < y2 <= th


def test_parse_ratio_rejects_bad_input():
    import pytest

    for bad in ("9", "9:0", "-1:2", "a:b"):
        with pytest.raises(ValueError):
            parse_ratio(bad)


def test_ratio_family_thresholds():
    # Reference thresholds: vertical needs H/W > 2.2, so 9:16 is "square".
    assert ratio_family("9:16") == "square"
    assert ratio_family("9:32") == "vertical"
    assert ratio_family("1:1") == "square"
    assert ratio_family("21:9") == "horizontal"
    assert ratio_family("4:1") == "u-wide"
    assert ratio_family("junk") == "unknown"
