"""documents → one row per span, fully native (no UDFs, no shuffle).

The Spark analog of the reference's NamedImage work list
(tesseract-recognize.cc:383-532): each span becomes an independent work
item. Page numbering metadata (media_idx / n_media — the reference's
multipage "pg{k}_" id prefix inputs, tesseract-recognize.cc:668-670) is
computed from the spans array BEFORE exploding, with array expressions —
zero shuffles, O(n²) per doc in array length (n ≤ a few dozen).

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
    (tesseract-recognize.cc:222-235)."""
    out: set[int] = set()
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "-" in tok:
            a, b = tok.split("-", 1)
            out.update(range(int(a), int(b) + 1))
        else:
            out.add(int(tok))
    return frozenset(out)


def _in_set(col: Column, values: frozenset[int]) -> Column:
    # ==-OR fold: Column.isin does not accept lambda-bound variables inside
    # higher-order functions
    out = F.lit(False)
    for v in sorted(values):
        out = out | (col == F.lit(v))
    return out


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
    if pages is not None:
        if isinstance(pages, str):
            pages = parse_pages_set(pages)
        sorted_spans = spans

        def keep(s: Column, i: Column) -> Column:
            # 0-based media ordinal of element i = count of media spans in
            # the prefix [0..i] minus one (two-param HOF lambda: arg 2 IS
            # the array index)
            ordinal = (
                F.size(
                    F.filter(
                        F.slice(sorted_spans, F.lit(1), i + 1),
                        lambda t: t["kind"] == F.lit("media"),
                    )
                )
                - 1
            )
            return (s["kind"] != F.lit("media")) | _in_set(ordinal, pages)

        spans = F.filter(sorted_spans, keep)
    df = docs_df.select(
        "doc_id",
        F.size(F.filter(spans, lambda s: s["kind"] == F.lit("media"))).alias(
            "n_media"
        ),
        F.posexplode(
            F.transform(
                spans,
                lambda s, i: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                    F.size(
                        F.filter(
                            F.slice(spans, F.lit(1), i + 1),
                            lambda t: t["kind"] == F.lit("media"),
                        )
                    ).alias("media_idx"),
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
