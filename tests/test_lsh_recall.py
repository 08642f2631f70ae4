"""Multi-table LSH recall on clustered embeddings.

The sf tables' embeddings are isotropic random — per-plane agreement
p≈0.6, so p^bits makes high recall impossible for ANY sub-linear ANN
family there (measured + closed-form in PLANS.md). On clustered data
(the shape real embedding neighborhoods have) the same operator must
reach high recall; this pins that, deterministically (fixed seed)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "scripts")

from tesseract_recognize_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

pytestmark = pytest.mark.spark


def test_clustered_recall_multi_table(spark):
    from lsh_recall import clustered_embeddings

    emb = clustered_embeddings(
        spark, n_clusters=30, per_cluster=8, dim=64, noise=0.25, seed=7
    )
    k, nq = 5, 30
    truth = {
        (r["vec_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, k=k, n_queries=nq, dim=64).collect()
    }
    got = {
        (r["vec_id"], r["neighbor_id"])
        for r in lsh_topk(
            emb, dim=64, k=k, bits=6, n_queries=nq, n_tables=4
        ).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall
    # single table at the same width must be strictly worse or equal —
    # the multi-table union can only add candidates
    got1 = {
        (r["vec_id"], r["neighbor_id"])
        for r in lsh_topk(
            emb, dim=64, k=k, bits=6, n_queries=nq, n_tables=1
        ).collect()
    }
    assert len(got1 & truth) <= len(got & truth)
