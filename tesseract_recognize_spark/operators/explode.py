"""documents → one row per span, fully native (no UDFs, no shuffle).

The Spark analog of the reference's NamedImage work list
(tesseract-recognize.cc:383-532): each span becomes an independent work
item. Page numbering metadata (media_idx / n_media — the reference's
multipage "pg{k}_" id prefix inputs, tesseract-recognize.cc:668-670) is
computed from the spans array BEFORE exploding, with array expressions —
zero shuffles, O(n) per doc in array length (one linear aggregate scan
produces a prefix-count array shared by the page filter and the emitted
media_idx; round 2 used slice+filter per element, O(n²)).

Page-set selection (the reference's ``file.pdf[0-2,5]`` suffix,
parsePagesSet at tesseract-recognize.cc:222-235) is applied to the spans
ARRAY before media_idx/n_media are computed: non-selected media spans never
become rows — the analog of the reference skipping frames *before decode*
(tesseract-recognize.cc:470-471,497-498) — and the surviving pages renumber
consecutively exactly as the reference's page registration does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["parse_pages_set", "explode_spans"]


def parse_pages_set(spec: str) -> frozenset[int]:
    """Parse the reference's page-set syntax: comma-separated 0-based
    indices and dash ranges, e.g. "0-2,5" → {0,1,2,5}
    (tesseract-recognize.cc:222-235). Malformed tokens (non-numeric,
    empty-sided or reversed ranges) raise a descriptive ValueError — the
    reference likewise errors on invalid page selections
    (tesseract-recognize.cc:466-469)."""
    out: set[int] = set()
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "-" in tok:
            a, b = tok.split("-", 1)
            a, b = a.strip(), b.strip()
            if not a.isdigit() or not b.isdigit():
                raise ValueError(
                    f"invalid page range {tok!r} in page set {spec!r}: "
                    "both sides of a dash range must be non-negative integers"
                )
            lo, hi = int(a), int(b)
            if hi < lo:
                raise ValueError(
                    f"reversed page range {tok!r} in page set {spec!r}"
                )
            out.update(range(lo, hi + 1))
        else:
            if not tok.isdigit():
                raise ValueError(
                    f"invalid page index {tok!r} in page set {spec!r}: "
                    "expected a non-negative integer"
                )
            out.add(int(tok))
    return frozenset(out)


def _in_set(col: Column, values: frozenset[int]) -> Column:
    # Column.isin does not accept lambda-bound variables inside
    # higher-order functions; array_contains against a constant-folded
    # literal array does, and stays one expression however large the
    # page set gets (the ==-OR fold it replaces built a linear chain)
    if not values:
        return F.lit(False)
    return F.array_contains(
        F.array(*[F.lit(v) for v in sorted(values)]), col
    )


def _media_prefix_counts(spans: Column) -> Column:
    """array<int> with element i = count of media spans among spans[0..i]
    (i.e. the 1-based media ordinal when element i is itself media).

    Single linear aggregate scan — ONE lambda evaluation per element. The
    previous form re-filtered ``slice(spans, 1, i+1)`` per element: O(n²)
    interpreted-lambda evaluations per document, a wall for docs with
    hundreds of spans."""
    def step(acc: Column, s: Column) -> Column:
        c = acc["c"] + F.when(
            s["kind"] == F.lit("media"), F.lit(1)
        ).otherwise(F.lit(0))
        c = c.cast("int")
        return F.struct(
            c.alias("c"), F.concat(acc["idx"], F.array(c)).alias("idx")
        )

    return F.aggregate(
        spans,
        F.struct(
            F.lit(0).cast("int").alias("c"),
            F.array().cast("array<int>").alias("idx"),
        ),
        step,
        lambda acc: acc["idx"],
    )


def explode_spans(
    docs_df: DataFrame, pages: frozenset[int] | str | None = None
) -> DataFrame:
    """Explode the spans array into rows with page-numbering metadata.

    Output: doc_id, offset, kind, text, media_ref, media_idx (1-based page
    number among the doc's media spans, in offset order), n_media.

    ``pages`` (a "0-2,5"-style spec or a set of 0-based media ordinals)
    keeps only the selected media spans — dropped before the explode, so
    they never reach the decode stage.
    """
    # defensive: span order is defined by `offset`, not array position
    spans = F.array_sort(
        F.col("spans"),
        lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    # The prefix-count array is materialized as a NAMED COLUMN in its own
    # projection (not an expression inside the consuming lambdas): lambda
    # bodies then fetch it as an O(1) bound row reference per element. The
    # passthrough "_pre" reference below also keeps CollapseProject from
    # inlining the aggregate into the filter lambda (which would re-evaluate
    # the O(n) scan per element — quadratic again).
    base = docs_df.select("doc_id", spans.alias("_spans"))
    base = base.select(
        "doc_id",
        "_spans",
        _media_prefix_counts(F.col("_spans")).alias("_pre"),
    )
    if pages is not None:
        if isinstance(pages, str):
            pages = parse_pages_set(pages)

        def keep(s: Column, i: Column) -> Column:
            # 0-based media ordinal of element i = prefix media count at i
            # minus one (two-param HOF lambda: arg 2 IS the array index)
            ordinal = F.element_at(F.col("_pre"), i + 1) - 1
            return (s["kind"] != F.lit("media")) | _in_set(ordinal, pages)

        base = base.select(
            "doc_id", F.filter(F.col("_spans"), keep).alias("_spans"), "_pre"
        )
        # surviving pages renumber consecutively: fresh prefix counts over
        # the filtered array
        base = base.select(
            "doc_id",
            "_spans",
            _media_prefix_counts(F.col("_spans")).alias("_pre"),
        )
    df = base.select(
        "doc_id",
        F.when(
            F.size(F.col("_spans")) > 0,
            F.element_at(F.col("_pre"), F.size(F.col("_spans"))),
        )
        .otherwise(F.lit(0))
        .alias("n_media"),
        F.posexplode(
            F.zip_with(
                F.col("_spans"),
                F.col("_pre"),
                lambda s, m: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                    m.alias("media_idx"),
                ),
            )
        ).alias("span_pos", "span"),
    )
    return df.select(
        "doc_id",
        F.col("span.offset").alias("offset"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.media_idx").alias("media_idx"),
        "n_media",
    )
