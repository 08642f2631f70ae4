"""Native (Catalyst/whole-stage-codegen) post-passes over span rows.

Each maps one reference post-pass to stock DataFrame operators — no Python
in any of these, so they run JVM-side at full codegen speed:

  T1  block-type filter            → ``df.filter``        (tesseract-recognize.cc:651-655)
  T3  corner polygon + sentinel    → ``when``/``array``    (tesseract-recognize.cc:155-175)
  P1  apply-image-orientation      → conditional point transform
                                                          (tesseract-recognize.cc:793-799)
  P2  dominant-baseline fix-up     → per-page window aggregate + transform
                                                          (tesseract-recognize.cc:800-814)
  P3  word-coords filler           → frame-bounded window last/first
                                                          (tesseract-recognize.cc:816-858)

P3 is the reference's backwards sequential in-place loop re-derived as a
closed form (the chaining collapses: within a run of unlocatable words, the
run-final word gets the true neighbor quad / 1-px extrusion and the others
degenerate to the preceding word's right edge; leading runs become m-step
extrusions) — which is exactly expressible with ignorenulls last/first over
(unboundedPreceding,-1) / (1,unboundedFollowing) frames. The pure-Python
sequential form lives in oracle/reference_ops.py; pytest checks parity.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "t1_block_filter",
    "t3_coords",
    "p1_apply_orientation",
    "p2_dominant_baselines",
    "p3_fill_word_coords",
]


def _pt(x, y) -> Column:
    return F.struct(
        x.cast("double").alias("x"), y.cast("double").alias("y")
    )


def t1_block_filter(df: DataFrame) -> DataFrame:
    """Drop non-text blocks (BlockType > PT_CAPTION_TEXT) and quarantined
    rows — a plain Catalyst filter; the UDF emits them so the skip is
    visible in the plan rather than buried in Python."""
    return df.filter((F.col("sub_order") >= 0) & (F.col("block_type") <= 8))


def t3_coords(df: DataFrame) -> DataFrame:
    """Build the 4-corner polygon, start corner rotated by orientation;
    unlocatable rows get the 2-point sentinel (reference setCoords)."""
    x0, y0 = F.col("x0"), F.col("y0")
    x1, y1 = F.col("x1"), F.col("y1")
    tl, tr, br, bl = _pt(x0, y0), _pt(x1, y0), _pt(x1, y1), _pt(x0, y1)
    zero = _pt(F.lit(0), F.lit(0))
    k = F.col("orientation_k")
    coords = (
        F.when(F.col("full_page"), F.array(zero, zero))
        .when(k == 1, F.array(bl, tl, tr, br))   # page-up LEFT starts bl
        .when(k == 2, F.array(br, bl, tl, tr))   # DOWN starts br
        .when(k == 3, F.array(tr, br, bl, tl))   # RIGHT starts tr
        .otherwise(F.array(tl, tr, br, bl))      # UP
    )
    return df.withColumn("coords", coords).withColumn(
        "coords_filled", F.lit(False)
    )


def _rotated_point(x, y, w, h, angle):
    """Point transform of rotatePage(-angle) — the derotation that undoes a
    raster orientation of `angle` ∈ {90, 180, -90} (frame dims w × h)."""
    nx = (
        F.when(angle == 90, h - 1 - y)
        .when(angle == 180, w - 1 - x)
        .otherwise(y)  # angle == -90
    )
    ny = (
        F.when(angle == 90, x)
        .when(angle == 180, h - 1 - y)
        .otherwise(w - 1 - x)  # angle == -90
    )
    return nx, ny


def _apply_rotation(df: DataFrame, angle: Column) -> DataFrame:
    """Rotate coords/baseline/page-dims of rows whose `angle` is ±90/180.
    The 2-point sentinel is frame-invariant (see oracle/reference_ops.py
    on this deliberate deviation from the reference's string matching)."""
    active = angle.isin(90, 180, -90)
    w, h = F.col("page_w"), F.col("page_h")

    def rot_struct(p):
        nx, ny = _rotated_point(p["x"], p["y"], w, h, angle)
        return F.struct(nx.alias("x"), ny.alias("y"))

    coords = F.when(
        active & (F.size("coords") == 4),
        F.transform("coords", rot_struct),
    ).otherwise(F.col("coords"))
    b1 = _rotated_point(F.col("b1x"), F.col("b1y"), w, h, angle)
    b2 = _rotated_point(F.col("b2x"), F.col("b2y"), w, h, angle)
    swap = active & angle.isin(90, -90)
    return (
        df.withColumn("coords", coords)
        .withColumn("_b1x", F.when(active, b1[0]).otherwise(F.col("b1x")))
        .withColumn("_b1y", F.when(active, b1[1]).otherwise(F.col("b1y")))
        .withColumn("_b2x", F.when(active, b2[0]).otherwise(F.col("b2x")))
        .withColumn("_b2y", F.when(active, b2[1]).otherwise(F.col("b2y")))
        .withColumn("_pw", F.when(swap, h).otherwise(w))
        .withColumn("_ph", F.when(swap, w).otherwise(h))
        .drop("b1x", "b1y", "b2x", "b2y", "page_w", "page_h")
        .withColumnsRenamed(
            {"_b1x": "b1x", "_b1y": "b1y", "_b2x": "b2x", "_b2y": "b2y",
             "_pw": "page_w", "_ph": "page_h"}
        )
    )


def p1_apply_orientation(df: DataFrame) -> DataFrame:
    """Derotate pages that carry the OSD apply-image-orientation property.
    Purely row-wise — no shuffle."""
    return _apply_rotation(df, F.col("osd_angle"))


def p2_dominant_baselines(df: DataFrame) -> DataFrame:
    """Dominant-baseline re-orientation: the reference's only true
    aggregate, as a per-page window (circular mean of line baseline
    angles) + conditional rotation. Like the reference, only pages that
    carried the OSD property participate."""
    page_w = Window.partitionBy("doc_id", "offset")
    theta = F.when(
        (F.col("level") == "line") & F.col("b1x").isNotNull(),
        F.atan2(-(F.col("b2y") - F.col("b1y")), F.col("b2x") - F.col("b1x")),
    )
    dom = F.atan2(
        F.avg(F.sin(theta)).over(page_w), F.avg(F.cos(theta)).over(page_w)
    )
    pi = math.pi
    bucket = (
        F.when(dom.isNull(), F.lit(0))
        .when((dom >= pi / 4) & (dom < 3 * pi / 4), F.lit(-90))
        .when((dom <= -pi / 4) & (dom > -3 * pi / 4), F.lit(90))
        .when((dom >= 3 * pi / 4) | (dom <= -3 * pi / 4), F.lit(180))
        .otherwise(F.lit(0))
    )
    osd_page = F.col("osd_angle").isNotNull() & (F.col("osd_angle") != 0)
    p2_angle = F.when(osd_page, bucket).otherwise(F.lit(0))
    # rotatePage(a) ⇔ the derotation transform for angle -a (180 ↔ 180)
    undo = F.when(p2_angle == 180, F.lit(180)).otherwise(-p2_angle)
    df = df.withColumn("_p2_undo", undo)
    df = _apply_rotation(df, F.col("_p2_undo"))
    return df.drop("_p2_undo")


def _unit_dx(ax, ay, bx, by):
    dx, dy = ax - bx, ay - by
    n = F.sqrt(dx * dx + dy * dy)
    return dx / n, dy / n


def p3_fill_word_coords(df: DataFrame) -> DataFrame:
    """Fill unlocatable word coords from sibling words (closed form of the
    reference's backwards sequential loop — see module docstring)."""
    line_part = Window.partitionBy("doc_id", "offset", "line_id")
    w_order = line_part.orderBy("sub_order")
    preceding = w_order.rowsBetween(Window.unboundedPreceding, -1)
    following = w_order.rowsBetween(1, Window.unboundedFollowing)
    whole = line_part.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    is_word = F.col("level") == "word"
    real_coords = F.when(is_word & (F.size("coords") == 4), F.col("coords"))
    real_idx = F.when(is_word & (F.size("coords") == 4), F.col("word_idx"))

    pre = F.last(real_coords, ignorenulls=True).over(preceding)
    fol = F.first(real_coords, ignorenulls=True).over(following)
    fol_idx = F.first(real_idx, ignorenulls=True).over(following)
    max_idx = F.max(F.when(is_word, F.col("word_idx"))).over(whole)
    line_coords = F.first(
        F.when(F.col("level") == "line", F.col("coords")), ignorenulls=True
    ).over(whole)

    df = (
        df.withColumn("_pre", pre)
        .withColumn("_fol", fol)
        .withColumn("_fol_idx", fol_idx)
        .withColumn("_max_idx", max_idx)
        .withColumn("_line_coords", line_coords)
    )

    def at(col, i):
        return F.element_at(col, i + 1)

    def px(col, i):
        return at(col, i)["x"]

    def py(col, i):
        return at(col, i)["y"]

    def pt(x, y):
        return F.struct(x.alias("x"), y.alias("y"))

    p = F.col("_pre")
    f = F.col("_fol")
    L = F.col("_line_coords")
    m_fol = (F.col("_fol_idx") - F.col("word_idx")).cast("double")
    m_end = (F.col("_max_idx") - F.col("word_idx")).cast("double")

    # both neighbors: run-final word gets the true gap quad, inner words
    # degenerate onto the preceding word's right edge (the chain fixpoint)
    quad_both = F.when(
        F.col("_fol_idx") == F.col("word_idx") + 1,
        F.array(at(p, 1), at(f, 0), at(f, 3), at(p, 2)),
    ).otherwise(F.array(at(p, 1), at(p, 1), at(p, 2), at(p, 2)))

    # preceding only: line-final word extrudes 1px along pre's edge
    # directions; inner words degenerate
    pux, puy = _unit_dx(px(p, 1), py(p, 1), px(p, 0), py(p, 0))
    plx, ply = _unit_dx(px(p, 2), py(p, 2), px(p, 3), py(p, 3))
    quad_pre = F.when(
        F.col("word_idx") == F.col("_max_idx"),
        F.array(
            at(p, 1),
            pt(px(p, 1) + pux, py(p, 1) + puy),
            pt(px(p, 2) + plx, py(p, 2) + ply),
            at(p, 2),
        ),
    ).otherwise(F.array(at(p, 1), at(p, 1), at(p, 2), at(p, 2)))

    def extrude_back(src, m):
        """m-step backwards extrusion from quad `src` (chained fol-only)."""
        ux, uy = _unit_dx(px(src, 0), py(src, 0), px(src, 1), py(src, 1))
        lx, ly = _unit_dx(px(src, 3), py(src, 3), px(src, 2), py(src, 2))
        return F.array(
            pt(px(src, 0) + m * ux, py(src, 0) + m * uy),
            pt(px(src, 0) + (m - 1) * ux, py(src, 0) + (m - 1) * uy),
            pt(px(src, 3) + (m - 1) * lx, py(src, 3) + (m - 1) * ly),
            pt(px(src, 3) + m * lx, py(src, 3) + m * ly),
        )

    # no real sibling at all: run-final word copies the parent line coords,
    # earlier words chain backwards extrusions off the line quad
    quad_none = F.when(m_end == 0, L).otherwise(extrude_back(L, m_end))

    filled = (
        F.when(p.isNotNull() & f.isNotNull(), quad_both)
        .when(p.isNotNull(), quad_pre)
        .when(f.isNotNull(), extrude_back(f, m_fol))
        .otherwise(quad_none)
    )

    needs_fill = is_word & (F.size("coords") == 2)
    df = df.withColumn(
        "coords_filled", F.when(needs_fill, F.lit(True)).otherwise(F.col("coords_filled"))
    ).withColumn(
        "coords", F.when(needs_fill, filled).otherwise(F.col("coords"))
    )
    return df.drop("_pre", "_fol", "_fol_idx", "_max_idx", "_line_coords")
