"""Native (Catalyst/whole-stage-codegen) post-passes over span rows.

Each maps one reference post-pass to stock DataFrame operators — no Python
in any of these:

  T1  block-type filter            → ``df.filter``        (tesseract-recognize.cc:651-655)
  T3  corner polygon + sentinel    → scalar corner columns (tesseract-recognize.cc:155-175)
  P1  apply-image-orientation      → conditional point transform
                                                          (tesseract-recognize.cc:793-799)
  P2  dominant-baseline fix-up     → per-page window aggregate + transform
                                                          (tesseract-recognize.cc:800-814)
  P3  word-coords filler           → frame-bounded window last/first
                                                          (tesseract-recognize.cc:816-858)

Geometry is carried as EIGHT SCALAR DOUBLE COLUMNS (c0x..c3y — the polygon
corners in emission order) plus a ``sentinel`` boolean, and the
array<struct> coords column is assembled ONCE at the end
(``build_coords_array``). Array-of-struct expressions here would be
evaluated outside whole-stage codegen with per-row object allocation —
measured to destroy scaling at high core counts (GC-bound at 32 cores);
scalar doubles keep the whole post-pass chain inside codegen.

P3 is the reference's backwards sequential in-place loop re-derived as a
closed form (the chaining collapses: within a run of unlocatable words, the
run-final word gets the true neighbor quad / 1-px extrusion and the others
degenerate to the preceding word's right edge; leading runs become m-step
extrusions) — exactly expressible with ignorenulls last/first over
(unboundedPreceding,-1) / (1,unboundedFollowing) frames. The pure-Python
sequential form lives in oracle/reference_ops.py; pytest checks parity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "t1_block_filter",
    "t3_coords",
    "p1_apply_orientation",
    "p2_dominant_baselines",
    "p3_fill_word_coords",
    "build_coords_array",
    "CORNER_COLS",
]

CORNER_COLS = [f"c{i}{a}" for i in range(4) for a in ("x", "y")]

# Every builder in this module constructs the SAME static expression
# tree on every call (t3's 16 corner cases, p3's window/fill forest, the
# rotation updates — ~0.5 s of py4j-bound driver time per query
# construction); see exprcache for the caching contract.
from tesseract_recognize_spark.exprcache import cached_exprs as _cached_exprs


def t1_block_filter(df: DataFrame) -> DataFrame:
    """Drop non-text blocks (BlockType > PT_CAPTION_TEXT) and quarantined
    rows — a plain Catalyst filter; the UDF emits them so the skip is
    visible in the plan rather than buried in Python."""
    return df.filter((F.col("sub_order") >= 0) & (F.col("block_type") <= 8))


def _build_t3() -> dict:
    x0, y0 = F.col("x0").cast("double"), F.col("y0").cast("double")
    x1, y1 = F.col("x1").cast("double"), F.col("y1").cast("double")
    tl = (x0, y0)
    tr = (x1, y0)
    br = (x1, y1)
    bl = (x0, y1)
    # orientation_k → corner order (reference tesseract-recognize.cc:167-172;
    # k=1 page-up-LEFT starts bl, k=2 DOWN starts br, k=3 RIGHT starts tr)
    order_for = {0: (tl, tr, br, bl), 1: (bl, tl, tr, br),
                 2: (br, bl, tl, tr), 3: (tr, br, bl, tl)}
    k = F.col("orientation_k")
    sent = F.col("full_page")
    cols = {}
    for i in range(4):
        for a in (0, 1):
            expr = (
                F.when(sent, F.lit(0.0))
                .when(k == 1, order_for[1][i][a])
                .when(k == 2, order_for[2][i][a])
                .when(k == 3, order_for[3][i][a])
                .otherwise(order_for[0][i][a])
            )
            cols[f"c{i}{'xy'[a]}"] = expr
    return {**cols, "sentinel": sent, "coords_filled": F.lit(False)}


def t3_coords(df: DataFrame) -> DataFrame:
    """Corner polygon as scalar columns, start corner rotated by
    orientation; unlocatable rows flagged ``sentinel`` (reference
    setCoords: '0,0 0,0')."""
    return df.withColumns(_cached_exprs(df, "t3", _build_t3))


def _rot_x(x, y, w, h, angle):
    return (
        F.when(angle == 90, h - 1 - y)
        .when(angle == 180, w - 1 - x)
        .otherwise(y)  # angle == -90
    )


def _rot_y(x, y, w, h, angle):
    return (
        F.when(angle == 90, x)
        .when(angle == 180, h - 1 - y)
        .otherwise(w - 1 - x)  # angle == -90
    )


def _build_rotation(angle_name: str) -> dict:
    angle = F.col(angle_name)
    active = angle.isin(90, 180, -90)
    w, h = F.col("page_w"), F.col("page_h")
    upd = {}
    rot_pt = active & ~F.col("sentinel")
    for i in range(4):
        cx, cy = F.col(f"c{i}x"), F.col(f"c{i}y")
        upd[f"c{i}x"] = F.when(rot_pt, _rot_x(cx, cy, w, h, angle)).otherwise(cx)
        upd[f"c{i}y"] = F.when(rot_pt, _rot_y(cx, cy, w, h, angle)).otherwise(cy)
    for p in ("b1", "b2"):
        bx, by = F.col(f"{p}x"), F.col(f"{p}y")
        upd[f"{p}x"] = F.when(active, _rot_x(bx, by, w, h, angle)).otherwise(bx)
        upd[f"{p}y"] = F.when(active, _rot_y(bx, by, w, h, angle)).otherwise(by)
    swap = active & angle.isin(90, -90)
    upd["page_w"] = F.when(swap, h).otherwise(w)
    upd["page_h"] = F.when(swap, w).otherwise(h)
    return upd


def _apply_rotation(df: DataFrame, angle_name: str) -> DataFrame:
    """Rotate corner/baseline scalars and swap page dims for rows whose
    angle column (by name) is ±90/180. The sentinel is frame-invariant
    (see oracle/reference_ops.py on this deliberate deviation from the
    reference's string matching)."""
    return df.withColumns(
        _cached_exprs(
            df, ("rot", angle_name), lambda: _build_rotation(angle_name)
        )
    )


def p1_apply_orientation(df: DataFrame) -> DataFrame:
    """Derotate pages that carry the OSD apply-image-orientation property.
    Purely row-wise — no shuffle."""
    return _apply_rotation(df, "osd_angle")


def p2_dominant_baselines(df: DataFrame) -> DataFrame:
    """Dominant-baseline re-orientation: the reference's only true
    aggregate, as a per-page window (circular mean of line baseline
    angles) + conditional rotation. Like the reference, only pages that
    carried the OSD property participate. The unordered (doc_id, offset)
    window reuses any upstream sort prefixed by those keys."""
    def build():
        page_w = Window.partitionBy("doc_id", "offset")
        theta = F.when(
            (F.col("level") == "line") & F.col("b1x").isNotNull(),
            F.atan2(
                -(F.col("b2y") - F.col("b1y")), F.col("b2x") - F.col("b1x")
            ),
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
        return F.when(p2_angle == 180, F.lit(180)).otherwise(-p2_angle)

    df = df.withColumn("_p2_undo", _cached_exprs(df, "p2_undo", build))
    df = _apply_rotation(df, "_p2_undo")
    return df.drop("_p2_undo")


def _unit(ax, ay, bx, by):
    dx, dy = ax - bx, ay - by
    n = F.sqrt(dx * dx + dy * dy)
    return dx / n, dy / n


def p3_fill_word_coords(df: DataFrame) -> DataFrame:
    """Fill unlocatable word coords from sibling words (closed form of the
    reference's backwards sequential loop — see module docstring).

    All window inputs/outputs are scalar doubles; the pre/fol neighbor
    corner pairs travel as one struct per row through the ignorenulls
    last/first frames. The line partition keys on the numeric line_sub
    anchor (not the line_id string): its sort coincides with emission
    order, so the downstream order-assignment window reuses this sort."""
    win_cols, upd = _cached_exprs(df, "p3", _build_p3)
    df = df.withColumns(win_cols)
    df = df.withColumns(upd)
    return df.drop("_pre", "_fol", "_fol_idx", "_max_idx", "_line")


def _build_p3() -> tuple:
    line_part = Window.partitionBy("doc_id", "offset", "line_sub")
    w_order = line_part.orderBy("sub_order")
    preceding = w_order.rowsBetween(Window.unboundedPreceding, -1)
    following = w_order.rowsBetween(1, Window.unboundedFollowing)

    is_word = F.col("level") == "word"
    is_real = is_word & ~F.col("sentinel")
    corner_struct = F.struct(*[F.col(c) for c in CORNER_COLS])
    real_struct = F.when(is_real, corner_struct)
    real_idx = F.when(is_real, F.col("word_idx"))

    # Every expression shares the SAME (partition, order) spec, so Catalyst
    # plans ONE WindowExec (different frames are evaluated in a single
    # pass). The two whole-frame lookups of the earlier form are re-derived
    # on the bounded frames — valid because within a line partition the
    # line row precedes every word/glyph row and word_idx is monotone in
    # sub_order:
    #   * the parent line's corners = last line-struct over PRECEDING;
    #   * the line's max word_idx = last word idx over FOLLOWING, or the
    #     row's own word_idx when no word follows it.
    win_cols = {
        "_pre": F.last(real_struct, ignorenulls=True).over(preceding),
        "_line": F.last(
            F.when(F.col("level") == "line", corner_struct),
            ignorenulls=True,
        ).over(preceding),
        "_fol": F.first(real_struct, ignorenulls=True).over(following),
        "_fol_idx": F.first(real_idx, ignorenulls=True).over(following),
        "_max_idx": F.coalesce(
            F.last(
                F.when(is_word, F.col("word_idx")), ignorenulls=True
            ).over(following),
            F.col("word_idx"),
        ),
    }

    def pt(src, i):
        return (F.col(src)[f"c{i}x"], F.col(src)[f"c{i}y"])

    m_fol = (F.col("_fol_idx") - F.col("word_idx")).cast("double")
    m_end = (F.col("_max_idx") - F.col("word_idx")).cast("double")

    p1_, p2_ = pt("_pre", 1), pt("_pre", 2)
    f0, f3 = pt("_fol", 0), pt("_fol", 3)

    # case quads as 4 (x, y) scalar pairs, ordered [q0, q1, q2, q3]
    def case_both():
        last_in_run = F.col("_fol_idx") == F.col("word_idx") + 1
        pick = lambda a, b: (
            F.when(last_in_run, a[0]).otherwise(b[0]),
            F.when(last_in_run, a[1]).otherwise(b[1]),
        )
        return [pick(p1_, p1_), pick(f0, p1_), pick(f3, p2_), pick(p2_, p2_)]

    def case_pre():
        p0, p3_c = pt("_pre", 0), pt("_pre", 3)
        ux, uy = _unit(p1_[0], p1_[1], p0[0], p0[1])
        lx, ly = _unit(p2_[0], p2_[1], p3_c[0], p3_c[1])
        final = F.col("word_idx") == F.col("_max_idx")
        ext1 = (p1_[0] + ux, p1_[1] + uy)
        ext2 = (p2_[0] + lx, p2_[1] + ly)
        pick = lambda a, b: (
            F.when(final, a[0]).otherwise(b[0]),
            F.when(final, a[1]).otherwise(b[1]),
        )
        return [
            p1_,
            pick(ext1, p1_),
            pick(ext2, p2_),
            p2_,
        ]

    def extrude_back(q0, q1, q2, q3, m):
        """m-step backwards extrusion off quad (q0..q3)."""
        ux, uy = _unit(q0[0], q0[1], q1[0], q1[1])
        lx, ly = _unit(q3[0], q3[1], q2[0], q2[1])
        return [
            (q0[0] + m * ux, q0[1] + m * uy),
            (q0[0] + (m - 1) * ux, q0[1] + (m - 1) * uy),
            (q3[0] + (m - 1) * lx, q3[1] + (m - 1) * ly),
            (q3[0] + m * lx, q3[1] + m * ly),
        ]

    def case_fol():
        f1, f2 = pt("_fol", 1), pt("_fol", 2)
        return extrude_back(f0, f1, f2, f3, m_fol)

    def case_none():
        L = [pt("_line", i) for i in range(4)]
        ext = extrude_back(L[0], L[1], L[2], L[3], m_end)
        out = []
        for i in range(4):
            out.append(
                (
                    F.when(m_end == 0, L[i][0]).otherwise(ext[i][0]),
                    F.when(m_end == 0, L[i][1]).otherwise(ext[i][1]),
                )
            )
        return out

    qb, qp, qf, qn = case_both(), case_pre(), case_fol(), case_none()
    has_pre = F.col("_pre").isNotNull()
    has_fol = F.col("_fol").isNotNull()
    needs_fill = is_word & F.col("sentinel")

    upd = {}
    for i in range(4):
        for a, ax in ((0, "x"), (1, "y")):
            filled = (
                F.when(has_pre & has_fol, qb[i][a])
                .when(has_pre, qp[i][a])
                .when(has_fol, qf[i][a])
                .otherwise(qn[i][a])
            )
            c = f"c{i}{ax}"
            upd[c] = F.when(needs_fill, filled).otherwise(F.col(c))
    upd["coords_filled"] = F.when(needs_fill, F.lit(True)).otherwise(
        F.col("coords_filled")
    )
    upd["sentinel"] = F.when(needs_fill, F.lit(False)).otherwise(
        F.col("sentinel")
    )
    return win_cols, upd


def build_coords_array(df: DataFrame) -> DataFrame:
    """Assemble the public coords column (array of (x, y) structs; the
    2-point '0,0 0,0' sentinel for never-filled rows) from the scalar
    corner columns — the ONE place an array-of-struct is constructed."""

    def build():
        def p(x, y):
            return F.struct(x.alias("x"), y.alias("y"))

        zero = p(F.lit(0.0), F.lit(0.0))
        corners = F.array(
            *[p(F.col(f"c{i}x"), F.col(f"c{i}y")) for i in range(4)]
        )
        return (
            F.when(F.col("c0x").isNull(), F.lit(None))
            .when(F.col("sentinel"), F.array(zero, zero))
            .otherwise(corners)
        )

    coords = _cached_exprs(df, "coords_array", build)
    return df.withColumn("coords", coords).drop(*CORNER_COLS, "sentinel")
