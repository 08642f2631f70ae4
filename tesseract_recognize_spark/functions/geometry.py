"""Pure integer/float geometry shared by the UDF, the oracle and tests.

Mirrors the reference's geometry semantics:
  * corner-order rotation by page orientation (tesseract-recognize.cc:155-175)
  * baseline clipping to bbox sides via line intersection + polystripe
    (tesseract-recognize.cc:177-203)
  * 90°/180° page rotations for the apply-image-orientation and
    dominant-baseline post-passes (tesseract-recognize.cc:793-814)

Frames: the "upright" frame U is the page as laid out; the raster frame R is
U rotated by ``k`` CCW 90° turns (numpy ``rot90`` convention). All bboxes are
inclusive ``(x0, y0, x1, y1)`` pixel coordinates.
"""

from __future__ import annotations

import math

from tesseract_recognize_spark.constants import ORIENT_K_TO_ANGLE

__all__ = [
    "rframe_dims",
    "point_u_to_r",
    "point_r_to_u",
    "bbox_u_to_r",
    "corner_points",
    "CORNER_START",
    "line_intersection",
    "clip_baseline",
    "polystripe",
    "rotate_back_angle_k",
]

# orientation_k → index into [tl, tr, br, bl] of the first emitted corner
# (reference tesseract-recognize.cc:167-172: UP starts tl, RIGHT starts tr,
# LEFT starts bl, DOWN starts br; our k=1 is page-up-LEFT, k=3 page-up-RIGHT).
CORNER_START = {0: 0, 1: 3, 2: 2, 3: 1}


def rframe_dims(page_w: int, page_h: int, k: int) -> tuple[int, int]:
    """Raster-frame (W, H) for upright dims rotated by k CCW turns."""
    return (page_h, page_w) if k % 2 else (page_w, page_h)


def point_u_to_r(x: float, y: float, page_w: int, page_h: int, k: int):
    """Map an upright-frame point into the raster frame (k CCW rot90s)."""
    if k == 0:
        return (x, y)
    if k == 1:
        return (y, page_w - 1 - x)
    if k == 2:
        return (page_w - 1 - x, page_h - 1 - y)
    if k == 3:
        return (page_h - 1 - y, x)
    raise ValueError(f"bad orientation k={k}")


def point_r_to_u(x: float, y: float, r_w: int, r_h: int, k: int):
    """Inverse of point_u_to_r, expressed in raster-frame dims (r_w, r_h)."""
    if k == 0:
        return (x, y)
    if k == 1:
        return (r_h - 1 - y, x)
    if k == 2:
        return (r_w - 1 - x, r_h - 1 - y)
    if k == 3:
        return (y, r_w - 1 - x)
    raise ValueError(f"bad orientation k={k}")


def bbox_u_to_r(bbox, page_w: int, page_h: int, k: int):
    """Map an inclusive upright bbox into the raster frame."""
    x0, y0, x1, y1 = bbox
    xa, ya = point_u_to_r(x0, y0, page_w, page_h, k)
    xb, yb = point_u_to_r(x1, y1, page_w, page_h, k)
    return (min(xa, xb), min(ya, yb), max(xa, xb), max(ya, yb))


def corner_points(bbox, k: int) -> list[tuple[float, float]]:
    """4-corner polygon of an axis-aligned bbox, starting at the
    reading-direction top-left corner per the orientation
    (reference setCoords corner-order switch)."""
    x0, y0, x1, y1 = bbox
    tl, tr, br, bl = (x0, y0), (x1, y0), (x1, y1), (x0, y1)
    base = [tl, tr, br, bl]
    s = CORNER_START[k % 4]
    return [base[(s + i) % 4] for i in range(4)]


def line_intersection(p1, p2, q1, q2):
    """Intersection of the infinite lines through (p1,p2) and (q1,q2), or
    None when parallel — mirrors the reference's page.intersection guard
    (tesseract-recognize.cc:184-189 warning path)."""
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = q1
    x4, y4 = q2
    denom = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    if denom == 0:
        return None
    a = x1 * y2 - y1 * x2
    b = x3 * y4 - y3 * x4
    px = (a * (x3 - x4) - (x1 - x2) * b) / denom
    py = (a * (y3 - y4) - (y1 - y2) * b) / denom
    return (px, py)


def clip_baseline(b1, b2, coords):
    """Clip a baseline segment to the bbox sides coords[0]-coords[3] and
    coords[1]-coords[2] (reference setLineCoords). Returns
    ``(p1, p2, clipped)``; when either intersection is undefined the raw
    baseline is kept with ``clipped=False`` (the reference's warning path).
    """
    i1 = line_intersection(b1, b2, coords[0], coords[3])
    i2 = line_intersection(b1, b2, coords[1], coords[2])
    if i1 is None or i2 is None:
        return (b1, b2, False)
    return (i1, i2, True)


def _norm(a, b) -> float:
    dx = a[0] - b[0]
    dy = a[1] - b[1]
    return math.sqrt(dx * dx + dy * dy)


def polystripe(p1, p2, coords) -> tuple[float, float]:
    """Polystripe (height, offset) from a clipped baseline and 4-pt coords
    (reference setLineCoords: height = mean of the 4 corner distances,
    offset = lower share; height<=0 → (1.0, offset))."""
    up1 = _norm(p1, coords[0])
    up2 = _norm(p2, coords[1])
    down1 = _norm(p1, coords[3])
    down2 = _norm(p2, coords[2])
    height = 0.5 * (up1 + up2 + down1 + down2)
    offset = 0.0 if height <= 0.0 else 0.5 * (down1 + down2) / height
    return (1.0 if height <= 0.0 else height, offset)


def rotate_back_angle_k(angle: int) -> int:
    """apply-image-orientation angle → the k whose derotation undoes it.

    The property follows the reference's convention (+90 for page-up-left,
    -90 for page-up-right, 180 for upside-down); rotatePage(-angle) equals
    mapping raster-frame points through point_r_to_u with this k.
    """
    for k, a in ORIENT_K_TO_ANGLE.items():
        if a == angle:
            return k
    raise ValueError(f"bad apply-image-orientation angle: {angle}")
