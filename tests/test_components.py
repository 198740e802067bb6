"""Connected components (large-star/small-star) vs brute-force union-find."""

from __future__ import annotations

import random

from teleharvest_spark.operators import components


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_components_simple_chain(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    for thr in (200_000, 0):
        got = {
            (r["node"], r["component"])
            for r in components.connected_components(e, driver_threshold=thr).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_components_string_nodes_driver_path(spark):
    e = spark.createDataFrame([("b", "a"), ("b", "c")], "src string, dst string")
    got = {
        (r["node"], r["component"])
        for r in components.connected_components(e).collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "a")}


def test_components_self_loops_dups_and_reversed_edges(spark):
    e = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 1), (1, 2), (3, 2)], "src long, dst long"
    )
    got = {
        (r["node"], r["component"])
        for r in components.connected_components(e).collect()
    }
    # pure self-loop node is dropped (no real edge); chain 1-2-3 merges
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_components_random_graphs_match_union_find(spark):
    """Both execution paths (driver union-find fast path AND the
    distributed star rounds) against an independent model."""
    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(5, 40)
        edges = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(rng.randint(1, 60))
        ]
        e = spark.createDataFrame(edges, "src long, dst long")
        model = {
            (n_, c) for n_, c in _uf_components(
                [(u, v) for u, v in edges if u != v]
            ).items()
        }
        for thr in (200_000, 0):  # fast path, then forced star rounds
            got = {
                (r["node"], r["component"])
                for r in components.connected_components(
                    e, driver_threshold=thr
                ).collect()
            }
            assert got == model, f"trial {trial} thr={thr}"


def test_canonical_docs_sizes(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    cc = components.connected_components(e)
    got = sorted(tuple(r) for r in components.canonical_docs(cc).collect())
    assert got == [
        (1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2),
    ]


def test_components_repeated_calls_stable(spark):
    """Repeated invocations stay correct and leave no SQL-cache
    entries (localCheckpoint block residue is ContextCleaner-reclaimed
    on GC — the repo-wide convention, see dedup._release)."""
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    results = []
    for _ in range(3):
        df = components.connected_components(e)
        results.append(df.count())
    assert results == [3, 3, 3]
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
