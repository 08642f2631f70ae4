"""Text-span normalize branch — all native, zero UDFs.

The reference's entire text normalization is a leading/trailing whitespace
strip (setTextEquiv, tesseract-recognize.cc:205-212: the std::regex replace
of "^\\s+|\\s+$" with a reference to a nonexistent group — i.e. with "").
``F.regexp_replace`` matches those semantics exactly (Java and std \\s agree
on ASCII whitespace); Spark's ``F.trim`` would strip spaces only, so it is
deliberately NOT used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["trim_text", "normalize_text_spans"]

_TRIM_PATTERN = r"^\s+|\s+$"


def trim_text(col: Column) -> Column:
    return F.regexp_replace(col, _TRIM_PATTERN, "")


def normalize_text_spans(spans: DataFrame) -> DataFrame:
    """kind='text' span rows → normalized span rows (level='text')."""
    return (
        spans.filter(F.col("kind") == "text")
        .select(
            "doc_id",
            "offset",
            "media_ref",
            trim_text(F.col("text")).alias("text"),
        )
        .withColumn("sub_order", F.lit(0))
        .withColumn("level", F.lit("text"))
    )
