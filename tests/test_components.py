"""Connected components / dedup clustering vs a pure-python union-find
oracle, including chain graphs (multi-round propagation) and random
edge sets via hypothesis."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from webcollector_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id labels
    out = {}
    for x in range(n_nodes):
        root = find(x)
        out[x] = min(
            y for y in range(n_nodes) if find(y) == root
        )
    return out


def test_chain_needs_multiple_rounds(spark):
    # 0-1-2-3-4-5 ... chain: min label must propagate the full length
    edges = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(10)}


def test_two_components_and_keeper_selection(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
    out = {r["doc_id"]: r for r in dedup_clusters(pairs, docs).collect()}
    assert out[1]["cluster"] == 1 and out[3]["cluster"] == 1
    assert out[10]["cluster"] == 10 and out[11]["cluster"] == 10
    assert out[99]["cluster"] == 99 and out[99]["cluster_size"] == 1
    keepers = {d for d, r in out.items() if r["is_keeper"]}
    assert keepers == {1, 10, 99}
    assert out[2]["cluster_size"] == 3


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
        max_size=20,
    )
)
@settings(max_examples=6, deadline=None)
def test_components_match_union_find(spark, edges):
    if not edges:
        return
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    want_all = _union_find(15, edges)
    touched = {x for e in edges for x in e}
    assert got == {x: want_all[x] for x in touched}
