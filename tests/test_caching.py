"""Block-manager hygiene pins (caching.finalize_and_unpersist): every
operator that persists corpus-sized intermediates must free them before
returning — the round-4 invariant. After each operator call, at most ONE
new entry (the result's own localCheckpoint blocks, O(|result|)) may
remain in the block manager; the intermediates' MEMORY_AND_DISK blocks
must be gone, and the returned DataFrame must still be fully usable
(it is materialized, not lazily dependent on the freed blocks)."""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.spark


def _n_persisted(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


@pytest.fixture()
def emb(spark):
    rng = np.random.RandomState(3)
    return spark.createDataFrame(
        [(i, rng.randn(8).tolist()) for i in range(60)],
        ["vec_id", "embedding"],
    )


@pytest.fixture()
def docs(spark):
    import random

    rng = random.Random(11)
    rows = [
        (
            i,
            " ".join(
                "".join(rng.choice("abcdefghijklmnop") for _ in range(6))
                for _ in range(10)
            ),
            "en",
        )
        for i in range(20)
    ]
    rows += [(100, "an exact duplicate pair text", "en"),
             (101, "an exact duplicate pair text", "en")]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_ann_operators_free_intermediates(spark, emb):
    from tesseract_recognize_spark.operators.similarity import (
        embedding_cosine_pairs,
        ivf_topk,
        lsh_topk,
    )

    for build in (
        lambda: lsh_topk(emb, dim=8, k=3, bits=2),
        lambda: lsh_topk(emb, dim=8, k=3, bits=2, n_tables=3),
        lambda: ivf_topk(emb, dim=8, k=3, nprobe=2, centroid_stride=7),
        lambda: embedding_cosine_pairs(emb, dim=8, threshold=0.5, bits=2),
    ):
        before = _n_persisted(spark)
        out = build()
        rows = out.collect()
        assert len(rows) > 0
        # only the result's checkpoint blocks may be new — the persisted
        # projections (base / assigned) must be unpersisted already
        assert _n_persisted(spark) - before <= 1
        assert out.count() == len(rows)  # still usable post-cleanup


def test_ngram_jaccard_frees_intermediates(spark, docs):
    from tesseract_recognize_spark.operators.dedup import ngram_jaccard_pairs

    before = _n_persisted(spark)
    out = ngram_jaccard_pairs(docs, threshold=0.8)
    rows = out.collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(100, 101)}
    assert _n_persisted(spark) - before <= 1


def test_connected_components_frees_edges(spark):
    from pyspark.sql import Row

    from tesseract_recognize_spark.operators.components import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3)],
        "doc_a: bigint, doc_b: bigint",
    )
    for alg in ("label", "star"):
        before = _n_persisted(spark)
        out = connected_components(pairs, algorithm=alg)
        got = {r["node"]: r["component_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1}
        # edges/pairs persists freed; label/edge generations are
        # localCheckpoints cleaned by ContextCleaner (GC-based), so a
        # small constant of those (rounds+1 on this 2-hop graph) may
        # linger until the next sweep — never the explicit persists
        assert _n_persisted(spark) - before <= 5


def test_checkpoint_table_materialization_matches_persist(spark, emb, docs, tmp_path):
    """materialize="checkpoint_table" is result-identical to the default
    persist path, leaves NO new block-manager entries beyond the result
    checkpoint, and deletes its scratch directory before returning."""
    import os

    from tesseract_recognize_spark.operators.dedup import ngram_jaccard_pairs
    from tesseract_recognize_spark.operators.similarity import lsh_topk

    scratch = str(tmp_path / "ann_scratch")
    before = _n_persisted(spark)
    via_ckpt = lsh_topk(
        emb, dim=8, k=3, bits=2,
        materialize="checkpoint_table", scratch_dir=scratch,
    )
    got = {(r["vec_id"], r["neighbor_id"]) for r in via_ckpt.collect()}
    assert _n_persisted(spark) - before <= 1
    assert not os.path.exists(scratch)  # operator owns scratch cleanup

    via_persist = lsh_topk(emb, dim=8, k=3, bits=2)
    want = {(r["vec_id"], r["neighbor_id"]) for r in via_persist.collect()}
    assert got == want

    scratch2 = str(tmp_path / "sigs_scratch")
    pairs = ngram_jaccard_pairs(
        docs, threshold=0.8,
        materialize="checkpoint_table", scratch_dir=scratch2,
    )
    assert {(r["doc_a"], r["doc_b"]) for r in pairs.collect()} == {(100, 101)}
    assert not os.path.exists(scratch2)


def test_materialize_projection_rejects_bad_args(spark):
    from tesseract_recognize_spark.caching import materialize_projection

    df = spark.range(3)
    with pytest.raises(ValueError, match="scratch_dir"):
        materialize_projection(df, how="checkpoint_table")
    with pytest.raises(ValueError, match="unknown how"):
        materialize_projection(df, how="bogus")
