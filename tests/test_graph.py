"""Connected-components tests: transitivity, isolation, convergence —
exercised on BOTH execution paths (driver union-find for small edge
sets, distributed label propagation for large ones) by pinning the
threshold."""

from __future__ import annotations

import pytest

from presto_cached_examples_spark.operators import graph
from presto_cached_examples_spark.operators.graph import connected_components

BOTH_PATHS = pytest.mark.parametrize("threshold", [100_000, 0], ids=["driver", "distributed"])


def _cc(spark, edges, monkeypatch, threshold, **kw):
    monkeypatch.setattr(graph, "DRIVER_EDGE_THRESHOLD", threshold)
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.component for r in connected_components(df, **kw).collect()}


@BOTH_PATHS
def test_chain_collapses_transitively(spark, monkeypatch, threshold):
    # A-B, B-C, C-D: one component rooted at the minimum id
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)], monkeypatch, threshold)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


@BOTH_PATHS
def test_disjoint_components_stay_apart(spark, monkeypatch, threshold):
    got = _cc(spark, [(5, 6), (10, 11), (11, 12)], monkeypatch, threshold)
    assert got == {5: 5, 6: 5, 10: 10, 11: 10, 12: 10}


@BOTH_PATHS
def test_direction_is_ignored(spark, monkeypatch, threshold):
    # edges given "backwards" must not matter (undirected semantics)
    got = _cc(spark, [(9, 3), (7, 9)], monkeypatch, threshold)
    assert got == {3: 3, 9: 3, 7: 3}


def test_max_iter_raises_rather_than_lying(spark, monkeypatch):
    # distributed path: a long chain needs ~len rounds; forcing 1 round
    # must raise, not return a half-converged labeling
    chain = [(i, i + 1) for i in range(8)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, chain, monkeypatch, threshold=0, max_iter=1)


def test_dedup_near_clusters_are_transitive(spark):
    """The LSH pipeline's cluster ids must be closed under transitivity:
    two docs sharing a cluster member share the cluster."""
    from presto_cached_examples_spark.registry import queries
    from tests.conftest import SF_TINY

    rows = queries()["q_dedup_near"](spark, SF_TINY).collect()
    cluster = {r.doc_id: r.cluster_id for r in rows}
    # every cluster id is itself a member of that cluster (root exists)
    for doc, cid in cluster.items():
        assert cluster[cid] == cid, f"cluster root {cid} not canonical (via {doc})"
