"""Fixpoint pins for connected_components (operators/components.py):
multi-hop label propagation, component isolation, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from tesseract_recognize_spark.operators.components import (
    connected_components,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in edges],
        "doc_a: bigint, doc_b: bigint",
    )


def test_chain_propagates_across_hops(spark):
    # 10-9-8-7 chain: min label 7 must travel 3 hops (strictly more
    # rounds than a single neighbor-join); 1-2 separate component
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(
            _pairs(spark, [(10, 9), (9, 8), (8, 7), (1, 2)])
        ).collect()
    }
    assert got == {7: 7, 8: 7, 9: 7, 10: 7, 1: 1, 2: 1}


def test_triangle_with_redundant_edges(spark):
    # near-clique (the LSH-pair shape) incl. duplicate/reversed edges
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(
            _pairs(spark, [(5, 6), (6, 7), (5, 7), (7, 5), (5, 6)])
        ).collect()
    }
    assert got == {5: 5, 6: 5, 7: 5}


def test_max_iter_raises_instead_of_partial(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(
            _pairs(spark, [(4, 3), (3, 2), (2, 1)]), max_iter=1
        )
