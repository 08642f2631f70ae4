"""Similarity search over embedding columns (array<float>).

Two paths, both pure DataFrame ops (F.zip_with/F.aggregate dot products —
no Python in the loop):

  * brute-force top-k cosine — the exact baseline. Scale shape: broadcast
    the (small) query set against the full corpus; one shuffle for the
    per-query top-k window.
  * LSH-bucketed top-k — the 100-TB path: sign-random-projection buckets
    (hyperplanes derived deterministically from md5 of the dimension
    index) prune the candidate set to same-bucket vectors before the
    exact re-rank. Recall < 1.0 by construction; bucket bits trade recall
    for cost.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window, functions as F

from tesseract_recognize_spark.caching import finalize_and_unpersist

__all__ = [
    "cosine_sim",
    "brute_force_topk",
    "lsh_signs",
    "lsh_bucket",
    "lsh_topk",
    "ivf_topk",
    "two_phase_topk",
    "embedding_cosine_pairs",
]


def two_phase_topk(pairs: DataFrame, k: int) -> DataFrame:
    """Per-query top-k over a (vec_id, neighbor_id, sim) pair set, executed
    as a physically two-phase plan with exactly ONE exchange.

    The implementation is a plain ``row_number() <= k`` window filter —
    Catalyst's rank-limit pushdown (``WindowGroupLimit``, Spark ≥ 3.5; this
    repo pins 4.1) rewrites it into the two-phase physical shape:

        Sort (partition-local)
        WindowGroupLimit Partial   ← map-side per-vec_id top-k prune
        Exchange hash(vec_id)      ← carries ≤ k rows per (query, map
        Sort                          partition) — NOT the full pair set
        WindowGroupLimit Final
        Window

    so no reducer ever receives a query's full candidate set (at 10^9
    corpus vectors an unpruned per-vec_id exchange is a straggler wall),
    and the pruned exchange is the only shuffle this operator adds. Earlier
    hand-rolled variants (round 2: rank over (vec_id, spark_partition_id())
    — shuffled the FULL pair set once before pruning; round 4 draft:
    sortWithinPartitions + a mapInArrow run-length scan — same plan shape
    but with an extra Python stage and a second local sort) are strictly
    dominated by letting the optimizer do it. Ordering is deterministic:
    desc sim, ties broken on asc neighbor_id.
    """
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "rank", "neighbor_id")
    )


def _as_double(col) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col


def dot_product(a: Column, b: Column, dim: int | None = None) -> Column:
    """Left-to-right sequential dot product (bit-reproducible across
    engines). With ``dim`` given, the sum is UNROLLED into a codegen-able
    expression — Spark's higher-order-function lambdas are evaluated
    interpreted per element, which is ~50x slower in tight join loops."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    out = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i) * F.element_at(b, i)
    return out


def _dot_sql(a: str, b: str, dim: int) -> str:
    """The unrolled dot product as ONE SQL fragment over column NAMES.

    Semantically identical to ``dot_product(col(a), col(b), dim)`` —
    same element order, same left-to-right addition — but built as a
    single string: the Column-object form issues ~3·dim py4j calls per
    dot, which put >10s of pure driver-side expression construction into
    every ANN query (measured; the multi-table query builds 16 unrolled
    projections + norms + the pair dot). One ``F.expr`` string is one
    py4j call and parses JVM-side in milliseconds."""
    return "(" + " + ".join(
        f"element_at({a}, {i}) * element_at({b}, {i})"
        for i in range(1, dim + 1)
    ) + ")"


def cosine_sim(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity of two array<double> columns."""
    dot = dot_product(a, b, dim)
    na = F.sqrt(dot_product(a, a, dim))
    nb = F.sqrt(dot_product(b, b, dim))
    return dot / (na * nb)


def brute_force_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (vec_id, rank, neighbor_id) — the similarity itself is kept
    internal so downstream equality checks are float-free; ties break on
    neighbor id (deterministic). Norms are precomputed once per vector
    (not once per pair); pass ``dim`` to unroll the dot product."""
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    norm = (
        F.expr(f"sqrt({_dot_sql('v', 'v', dim)})")
        if dim
        else F.sqrt(dot_product(F.col("v"), F.col("v"), dim))
    )
    base = base.withColumn("norm", norm)
    queries = base.filter(F.col("vec_id") < n_queries) if n_queries else base
    q, c = queries.alias("q"), base.alias("c")
    pair_dot = (
        F.expr(_dot_sql("q.v", "c.v", dim))
        if dim
        else dot_product(F.col("q.v"), F.col("c.v"), dim)
    )
    sim = pair_dot / (F.col("q.norm") * F.col("c.norm"))
    # broadcast the SMALL query set against the streamed corpus — at 10^9+
    # corpus vectors the other direction is an executor OOM
    pairs = F.broadcast(q).join(c, F.col("q.vec_id") != F.col("c.vec_id")).select(
        F.col("q.vec_id").alias("vec_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        sim.alias("sim"),
    )
    return two_phase_topk(pairs, k)


def lsh_signs(b: int, dim: int, table: int = 0) -> list[int]:
    """Hyperplane h_b's ±1 components: deterministic md5 of "b|d" (table 0;
    table t>0 prefixes "t{t}:") — no RNG, reproducible in any engine (the
    DuckDB oracle is generated from the same constants)."""
    prefix = "" if table == 0 else f"t{table}:"
    return [
        1 if int(hashlib.md5(f"{prefix}{b}|{d}".encode()).hexdigest(), 16) & 1
        else -1
        for d in range(dim)
    ]


def lsh_bucket(vec: str, dim: int, bits: int = 8, table: int = 0) -> Column:
    """Sign-random-projection bucket id: Σ_b 2^b · [⟨v, h_b⟩ > 0].

    ``vec`` is the COLUMN NAME of the array<double> vector. Each
    projection is the UNROLLED codegen dot product against inline ±1
    literals — no interpreted higher-order lambdas in what is a
    per-vector hot path — assembled as one SQL string (see _dot_sql for
    why: the Column-object form cost ~10s of py4j round trips per ANN
    query at bits=8, dim=64, two tables)."""
    terms = []
    for b in range(bits):
        proj = " + ".join(
            f"element_at({vec}, {d + 1}) * {float(s)}"
            for d, s in enumerate(lsh_signs(b, dim, table))
        )
        terms.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << b} ELSE 0 END)")
    return F.expr("(" + " + ".join(terms) + ")")


def lsh_topk(
    emb: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    n_queries: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine re-rank. The bucket equi-join replaces the cross
    product — the piece that makes ANN feasible at 10^12 rows.

    ``n_tables > 1`` runs the standard multi-table LSH recall boost: T
    independent hyperplane families, a candidate qualifies if it shares a
    bucket in ANY table (explode over (table, bucket), equi-join on both,
    dedup pairs with a max-aggregate before the re-rank). Recall rises
    roughly as 1-(1-p^bits)^T for per-plane agreement p; cost rises ~T×
    in bucket-join fan-out, still never the O(n²) cross product."""
    base = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        # buckets AND norm computed once per vector, pre-join — the join
        # hot loop is then a single unrolled dot product + one divide
        .withColumn("norm", F.expr(f"sqrt({_dot_sql('v', 'v', dim)})"))
    )
    if n_tables == 1:
        base = base.withColumn("bucket", lsh_bucket("v", dim, bits))
        join_keys = [("bucket", "bucket")]
    else:
        base = base.withColumn(
            "_bks",
            F.array(
                *[lsh_bucket("v", dim, bits, t) for t in range(n_tables)]
            ),
        ).select(
            "vec_id", "v", "norm",
            F.posexplode("_bks").alias("tbl", "bucket"),
        )
        join_keys = [("tbl", "tbl"), ("bucket", "bucket")]
    # The bucketed+normed projection is a ~4k-node expression tree feeding
    # BOTH sides of the self-join. Unpersisted, Catalyst re-optimizes and
    # re-compiles it per side per AQE stage (measured ~10s of fixed plan
    # cost per execution at ANY data size) and the projection itself runs
    # twice. Persisted, the downstream plan sees a small InMemoryRelation
    # leaf and the projection runs once. Footprint is the vector table +
    # (norm, buckets) — MEMORY_AND_DISK spills gracefully. The OPERATOR
    # owns cleanup (round-4 invariant): the bounded top-k result is
    # materialized eagerly and `base` is unpersisted before returning —
    # see caching.finalize_and_unpersist. At 10^12 rows, the same note as
    # dedup's signature table applies: write the projection to a
    # checkpoint TABLE instead of block-manager persist.
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    queries = base.filter(F.col("vec_id") < n_queries) if n_queries else base
    q, c = queries.alias("q"), base.alias("c")
    sim = F.expr(_dot_sql("q.v", "c.v", dim)) / (
        F.col("q.norm") * F.col("c.norm")
    )
    cond = F.col("q.vec_id") != F.col("c.vec_id")
    for a, b in join_keys:
        cond = cond & (F.col(f"q.{a}") == F.col(f"c.{b}"))
    pairs = q.join(c, cond).select(
        F.col("q.vec_id").alias("vec_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        sim.alias("sim"),
    )
    if n_tables > 1:
        # a pair found in several tables must count once; sim is identical
        # on every copy so any aggregate works — max keeps it codegen
        pairs = pairs.groupBy("vec_id", "neighbor_id").agg(
            F.max("sim").alias("sim")
        )
    return finalize_and_unpersist(two_phase_topk(pairs, k), [base])


def ivf_topk(
    emb: DataFrame,
    dim: int,
    k: int = 5,
    nprobe: int = 3,
    centroid_stride: int = 53,
    n_queries: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: an inverted-file index over centroid
    cells — the other classic ANN scale path next to ``lsh_topk``.

    Index build (one pass, no iteration):
      * centroid set: every ``centroid_stride``-th vector of the corpus
        itself (vec_id % stride == 0) — deterministic sampled centroids,
        i.e. a k-means++-style init with zero Lloyd refinement, fully
        reproducible in any engine (the DuckDB oracle derives the same
        cells from the same rule). Production IVF trains centroids
        offline on a sample and ships them as a table — pass
        ``centroids`` (id_col + vec_col) to use a prebuilt set; the
        assignment/probe/search plan is identical.
      * assignment: broadcast the (tiny) centroid table against the
        corpus and keep each vector's single nearest cell (rank-1 by
        cosine, ties on centroid id). The rank filter is a
        ``row_number() <= n`` window, which Catalyst rewrites to
        WindowGroupLimit: the per-vector prune happens MAP-side (the
        broadcast join emits one vector's centroid rows adjacently), so
        the exchange carries ≤ nprobe rows per vector, never the
        n·n_cells cross-score set.

    Search: a query probes its ``nprobe`` nearest cells (same window,
    rank ≤ nprobe) and exact-cosine re-ranks only the vectors ASSIGNED
    to those cells — an equi-join on cell id, the same
    never-the-cross-product shape as the LSH bucket join. Each corpus
    vector owns exactly ONE cell, so a (query, neighbor) pair occurs at
    most once and needs no dedup before the top-k. Recall < 1 by
    construction: a true neighbor is missed iff its one cell is not
    among the query's nprobe probes; nprobe trades recall for candidate
    volume (nprobe = n_cells is exact search).

    Output: (vec_id, rank, neighbor_id) — floats stay internal, like
    every ANN operator here. The assigned projection feeds both join
    sides and is persisted; the operator owns the cleanup — the top-k
    result materializes eagerly and the projection unpersists before
    return (as with lsh_topk).
    """
    from pyspark import StorageLevel

    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("norm", F.expr(f"sqrt({_dot_sql('v', 'v', dim)})"))
    if centroids is None:
        cent = base.filter(F.col("vec_id") % centroid_stride == 0).select(
            F.col("vec_id").alias("c_id"),
            F.col("v").alias("cv"),
            F.col("norm").alias("cnorm"),
        )
    else:
        cent = centroids.select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ).withColumn("cnorm", F.expr(f"sqrt({_dot_sql('cv', 'cv', dim)})"))
    sim_c = F.expr(_dot_sql("v", "cv", dim)) / (
        F.col("norm") * F.col("cnorm")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sim_c"), F.asc("c_id")
    )
    assigned = (
        base.crossJoin(F.broadcast(cent))  # vs the tiny centroid set
        .withColumn("sim_c", sim_c)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("vec_id", "v", "norm", F.col("c_id").alias("cell"), "rn")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    corpus = assigned.filter(F.col("rn") == 1)
    probes = assigned if n_queries is None else assigned.filter(
        F.col("vec_id") < n_queries
    )
    q, c = probes.alias("q"), corpus.alias("c")
    sim = F.expr(_dot_sql("q.v", "c.v", dim)) / (
        F.col("q.norm") * F.col("c.norm")
    )
    pairs = q.join(
        c,
        (F.col("q.cell") == F.col("c.cell"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("vec_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        sim.alias("sim"),
    )
    return finalize_and_unpersist(two_phase_topk(pairs, k), [assigned])


def embedding_cosine_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (vec_a < vec_b) whose
    cosine similarity ≥ threshold, with candidates restricted to vectors
    sharing an LSH bucket — the dedup-flavored sibling of ``lsh_topk``
    (threshold semantics instead of top-k; both sides the full corpus
    instead of a query set).

    Scale shape: the bucket equi-join replaces the O(n²) cross product —
    at 10^12 vectors all-pairs cosine is impossible, while same-bucket
    pairs are ~n·E[bucket size]. Recall < 1 by construction (a near-dup
    pair is missed iff any of the ``bits`` hyperplanes separates it:
    P[all agree] = (1 - θ/π)^bits, high exactly for the near-parallel
    pairs dedup cares about); ``bits`` trades recall for candidate
    volume. The bucketed+normed projection is persisted for the same
    reason as in lsh_topk (feeds both self-join sides); the operator
    owns the cleanup — the thresholded pair list materializes eagerly
    and the projection unpersists before return.
    """
    from pyspark import StorageLevel

    base = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("norm", F.expr(f"sqrt({_dot_sql('v', 'v', dim)})"))
        .withColumn("bucket", lsh_bucket("v", dim, bits))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = base.alias("a"), base.alias("b")
    sim = F.expr(_dot_sql("a.v", "b.v", dim)) / (
        F.col("a.norm") * F.col("b.norm")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(sim >= F.lit(float(threshold)))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
    )
    return finalize_and_unpersist(pairs, [base])
