"""Connected components over duplicate-pair edges — the step that turns
pairwise dedup verdicts into keep/drop decisions.

Near-duplicate detection (MinHash-LSH → Jaccard verify, or
embedding-cosine) emits PAIRS, but a training corpus needs CLUSTERS: if
A≈B and B≈C, all three are one duplicate group even when (A, C) never
surfaced as a candidate. This operator computes per-node component ids
by iterative min-label propagation:

    label(n) ← min(label(n), min over neighbors' labels)

repeated to fixpoint. Each round is one join + one map-side-combinable
min-aggregate — pure DataFrame ops, fully distributed; the driver only
orchestrates rounds and checks convergence (an intentional sync point,
the same pattern GraphX/GraphFrames use for iterative algorithms; Spark
has no native fixpoint operator).

Scale shape: rounds = graph diameter. Duplicate clusters are
near-cliques (LSH bands surface most intra-cluster pairs), so diameter
is 2-3 and the loop converges in a handful of rounds. For adversarial
long-chain graphs at 10^12 edges, swap the propagation body for the
large-star/small-star rewrite (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) — O(log n) rounds, same per-round
DataFrame shape, same fixpoint contract. Labels persist per round and
the superseded generation unpersists immediately, so block-manager
footprint is one label table, not one per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component_id) for every node in ``pairs``; component_id is
    the minimum node id in the component — deterministic, engine-exact
    (the DuckDB oracle's recursive reachability closure agrees value for
    value). Nodes not in any pair are absent (caller coalesces singleton
    docs to themselves). Raises after ``max_iter`` non-converged rounds
    rather than returning a partial labeling."""
    from pyspark import StorageLevel

    # persist the pair list FIRST: the symmetric union references it
    # twice, and Catalyst does not dedupe the (possibly expensive —
    # e.g. a full Jaccard verify) subtree across union branches
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    fwd = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        fwd.unionByName(
            pairs.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()  # materialize once, before the loop reuses it per round
    pairs.unpersist()
    # localCheckpoint (not persist) per generation: persist caches blocks
    # but the LOGICAL plan still nests every prior round — plan analysis
    # cost compounds per iteration, the classic iterative-Spark trap.
    # localCheckpoint(eager) truncates lineage to the materialized blocks.
    labels = (
        edges.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("component_id"))
        .localCheckpoint(eager=True)
    )

    def label_sum(df: DataFrame):
        # decimal(38,0): an int64 sum of 10^12 node ids would overflow
        return df.agg(
            F.sum(F.col("component_id").cast("decimal(38,0)"))
        ).first()[0]

    # min-label propagation strictly DECREASES the label sum until the
    # fixpoint, so convergence is one cheap aggregate per round instead
    # of a changed-rows join
    cur = label_sum(labels)
    try:
        for _ in range(max_iter):
            # neighbor labels flow along every (symmetric) edge, then the
            # per-node min folds them with the node's own label
            prop = edges.join(
                labels, edges["v"] == labels["node"]
            ).select(edges["u"].alias("node"), "component_id")
            labels = (
                labels.unionByName(prop)
                .groupBy("node")
                .agg(F.min("component_id").alias("component_id"))
                .localCheckpoint(eager=True)
            )
            new = label_sum(labels)
            if new == cur:
                return labels
            cur = new
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds "
            "(graph diameter exceeds max_iter — raise it, or use a "
            "large-star/small-star variant for long-chain graphs)"
        )
    finally:
        edges.unpersist()
