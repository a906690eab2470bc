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


def test_semdedup_keepers_vs_numpy(spark):
    """SemDeDup composition (cells -> within-cell cosine edges ->
    components -> keeper) against a straight-line numpy + union-find
    recompute on the real sf0.001 embeddings table — independent of the
    DuckDB oracle, which exercises the same SQL both engines run."""
    import numpy as np

    from webcollector_spark.plans.queries import _SEMDEDUP_TAU, Q

    sf = "/root/testdata/sf0.001"
    rows = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]

    cents = V[ids < 8]
    cent_ids = ids[ids < 8]
    d2 = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    cell = cent_ids[np.argmin(d2, axis=1)]  # ties: lowest cid (argmin)

    norm = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = norm @ norm.T
    n = len(ids)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if cell[i] == cell[j] and sims[i, j] >= _SEMDEDUP_TAU:
                parent[find(j)] = find(i)
    comp = {int(ids[i]): int(ids[min(
        k for k in range(n) if find(k) == find(i)
    )]) for i in range(n)}

    got = {r["vec_id"]: r for r in Q["semdedup_keepers"](spark, sf).collect()}
    assert set(got) == set(comp)
    sizes = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    n_edges = 0
    for i, vid in enumerate(ids):
        r = got[int(vid)]
        assert r["cell"] == cell[i]
        assert r["sem_cluster"] == comp[int(vid)]
        assert r["sem_cluster_size"] == sizes[comp[int(vid)]]
        assert r["is_keeper"] == (int(vid) == comp[int(vid)])
    # the fixture threshold leaves a non-trivial edge set: some cluster
    # must be larger than a singleton or the test proves nothing
    assert max(sizes.values()) >= 2
