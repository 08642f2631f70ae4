"""Geometry primitives vs hand-computed values (SURVEY.md §5.2 tier 1)."""

import math

import pytest

from tesseract_recognize_spark.functions.geometry import (
    bbox_u_to_r,
    clip_baseline,
    corner_points,
    line_intersection,
    point_r_to_u,
    point_u_to_r,
    polystripe,
    rframe_dims,
    rotate_back_angle_k,
)


def test_corner_order_by_orientation():
    """Corner start rotates per orientation (tesseract-recognize.cc:167-172)."""
    bbox = (1, 2, 5, 9)
    tl, tr, br, bl = (1, 2), (5, 2), (5, 9), (1, 9)
    assert corner_points(bbox, 0) == [tl, tr, br, bl]      # page up
    assert corner_points(bbox, 1) == [bl, tl, tr, br]      # page left (+90)
    assert corner_points(bbox, 2) == [br, bl, tl, tr]      # page down (180)
    assert corner_points(bbox, 3) == [tr, br, bl, tl]      # page right (-90)


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_frame_transform_roundtrip(k):
    pw, ph = 100, 60
    rw, rh = rframe_dims(pw, ph, k)
    for pt in [(0, 0), (99, 59), (13, 42), (50, 0)]:
        r = point_u_to_r(*pt, pw, ph, k)
        assert 0 <= r[0] < rw and 0 <= r[1] < rh
        assert point_r_to_u(*r, rw, rh, k) == pt


def test_bbox_transform_k1():
    # upright 100x60, CCW once → raster 60x100; bbox corners map exactly
    assert bbox_u_to_r((10, 20, 30, 25), 100, 60, 1) == (20, 69, 25, 89)


def test_line_intersection_basic():
    assert line_intersection((0, 0), (10, 0), (5, -5), (5, 5)) == (5, 0)
    # parallel → None (reference warning path)
    assert line_intersection((0, 0), (10, 0), (0, 1), (10, 1)) is None


def test_clip_baseline_on_box():
    # flat baseline exactly on the bottom edge clips to the bottom corners
    coords = [(0, 0), (10, 0), (10, 6), (0, 6)]
    p1, p2, ok = clip_baseline((0.0, 6.0), (10.0, 6.0), coords)
    assert ok and p1 == (0, 6) and p2 == (10, 6)


def test_clip_baseline_parallel_keeps_raw():
    # degenerate coords make both side lines horizontal; a horizontal
    # baseline is parallel → raw baseline kept, clipped=False
    p1, p2, ok = clip_baseline((0.0, 2.0), (10.0, 2.0), [
        (0, 0), (10, 0), (10, 0), (0, 0)
    ])
    assert not ok and p1 == (0.0, 2.0) and p2 == (10.0, 2.0)


def test_polystripe_hand_values():
    # reference formula: height = mean corner distances, offset = lower share
    coords = [(0, 0), (10, 0), (10, 6), (0, 6)]
    h, off = polystripe((0, 6), (10, 6), coords)
    assert h == 6.0 and off == 0.0
    # baseline strictly inside: up=4, down=2 per corner → height 6, offset 1/3
    h, off = polystripe((0, 4), (10, 4), coords)
    assert h == 6.0 and off == pytest.approx(1 / 3)
    # degenerate height → (1.0, 0.0)
    h, off = polystripe((0, 0), (10, 0), [(0, 0), (10, 0), (10, 0), (0, 0)])
    assert h == 1.0 and off == 0.0


def test_rotate_back_angle_k():
    assert rotate_back_angle_k(0) == 0
    assert rotate_back_angle_k(90) == 1
    assert rotate_back_angle_k(180) == 2
    assert rotate_back_angle_k(-90) == 3
    with pytest.raises(ValueError):
        rotate_back_angle_k(45)


def test_angle_bucketing_reference_semantics():
    """P2 buckets (tesseract-recognize.cc:805-811)."""
    def bucket(dom):
        if math.pi / 4 <= dom < 3 * math.pi / 4:
            return -90
        if -3 * math.pi / 4 < dom <= -math.pi / 4:
            return 90
        if dom >= 3 * math.pi / 4 or dom <= -3 * math.pi / 4:
            return 180
        return 0

    assert bucket(0.0) == 0
    assert bucket(math.pi / 2) == -90
    assert bucket(-math.pi / 2) == 90
    assert bucket(math.pi) == 180
    assert bucket(math.pi / 4) == -90          # boundary inclusive
    assert bucket(-math.pi / 4) == 90
    assert bucket(3 * math.pi / 4) == 180
