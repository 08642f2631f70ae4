"""documents → one row per span, fully native (no UDFs, no shuffle).

The Spark analog of the reference's NamedImage work list
(tesseract-recognize.cc:383-532): each span becomes an independent work
item. Page numbering metadata (media_idx / n_media — the reference's
multipage "pg{k}_" id prefix inputs, tesseract-recognize.cc:668-670) is
computed from the spans array BEFORE exploding, with array expressions —
zero shuffles, O(n²) per doc in array length (n ≤ a few dozen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["explode_spans"]


def explode_spans(docs_df: DataFrame) -> DataFrame:
    """Explode the spans array into rows with page-numbering metadata.

    Output: doc_id, offset, kind, text, media_ref, media_idx (1-based page
    number among the doc's media spans, in offset order), n_media.
    """
    # defensive: span order is defined by `offset`, not array position
    spans = F.array_sort(
        F.col("spans"),
        lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )
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
