"""Deduplication operators for large-scale training-data pipelines.

All-native column expressions (no Python UDFs): hashing is md5-derived so a
DuckDB oracle can reproduce every value bit-for-bit; at production scale
you'd swap `_hash64` for xxhash64 (same shape, one line).

Scale notes (the 100-TB arguments):
  * exact dedup is one hash-aggregate — map-side partial aggregation makes
    the shuffle carry only distinct hashes per partition;
  * MinHash-LSH shuffles once on (band_id, band_hash) — candidate pairs
    never materialize the O(n²) cross product;
  * n-gram Jaccard prunes the self-join by (lang, length-bucket) blocking
    before the quadratic verify, and AQE's skew-join splitting handles hot
    buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash64_expr",
    "exact_dedup",
    "char_shingles",
    "minhash_lsh_pairs",
    "simhash_signature",
    "ngram_jaccard_pairs",
]


def hash64_expr(col: Column) -> Column:
    """Deterministic 60-bit integer hash from md5 — reproducible in any
    engine (DuckDB oracle: ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# universal-hash family for MinHash: g_i(h) = (a_i·h + b_i) mod MH_P
MH_P = 2147483647  # 2^31 - 1 (prime)


def mh_coeffs(i: int) -> tuple[int, int]:
    a = (1000003 * (i + 1) + 17) % MH_P
    b = (998244353 * (i + 1) + 29) % MH_P
    return a, b


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: content hash → keeper (min doc_id) + count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


def char_shingles(col: Column, k: int = 3) -> Column:
    """Distinct character k-grams (empty array when text shorter than k)."""
    n = F.length(col)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: col.substr(i, F.lit(k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash + banded LSH candidate pairs.

    shingle → n_hashes minhashes → bands of band_size → equi-join on
    (band_id, band_hash). Returns distinct (doc_a, doc_b) candidate pairs
    (doc_a < doc_b). One shuffle on the band key; no cross product.
    """
    shingles = char_shingles(F.col(text_col), shingle_k)
    # one md5 per shingle; the n_hashes minhash functions are derived by
    # universal hashing g_i(h) = (a_i·h + b_i) mod p over the 31-bit base
    # hash (products stay < 2^62 — no bigint overflow in any engine)
    hashed = docs.select(
        "doc_id",
        F.transform(
            shingles, lambda s: F.pmod(hash64_expr(s), F.lit(MH_P))
        ).alias("hs"),
    ).where(F.size("hs") > 0)

    def mh_col(i: int):
        a, b = mh_coeffs(i)
        # NB: single-parameter lambda — a second one would be bound to the
        # array index by F.transform
        return F.array_min(
            F.transform(
                F.col("hs"),
                lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MH_P)),
            )
        ).alias(f"mh{i}")

    sigs = hashed.select("doc_id", *[mh_col(i) for i in range(n_hashes)])
    n_bands = n_hashes // band_size
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh{b * band_size + j}")
                                for j in range(band_size)
                            ],
                        )
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    left = bands.alias("a")
    right = bands.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def simhash_signature(
    docs: DataFrame, text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Per-document SimHash: sign of the per-bit vote over token hashes.

    One explode + one hash-aggregate (map-side combinable: the per-bit
    votes are plain sums)."""
    tokens = F.split(F.lower(F.col(text_col)), r"\s+")
    tok = docs.select(
        "doc_id", F.explode(tokens).alias("tok")
    ).where(F.length("tok") > 0)
    # materialize the hash once per token — the 32 per-bit votes must not
    # each recompute the md5 (Catalyst does not CSE across aggregates)
    tok = tok.select("doc_id", hash64_expr(F.col("tok")).alias("h"))
    h = F.col("h")
    votes = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 3,
    length_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by character n-gram Jaccard similarity.

    Blocking: candidates must share lang and a length bucket (a true near-
    dup at ≥0.8 Jaccard has nearly equal length, so same-or-adjacent bucket;
    we use same-bucket for the oracle-checkable variant). Jaccard =
    |∩| / (|a| + |b| - |∩|) on distinct shingles — exact integer/double
    arithmetic, engine-independent.
    """
    base = docs.select(
        "doc_id",
        "lang",
        F.floor(F.length(text_col) / length_bucket).alias("lb"),
        char_shingles(F.col(text_col), shingle_k).alias("sh"),
    ).where(F.size("sh") > 0)
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.lb") == F.col("b.lb"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
