"""Differential tests for the graph operators: triangle counting
(degree-ordered orientation) and fixed-point PageRank are checked
against brute-force pure-Python references on randomized graphs —
the operator must agree exactly (integer outputs) for every seed."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import types as T

from distributed_mapreduce_p2p_spark.operators import graph as GR

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
    ]
)


def _random_edges(seed: int, n_nodes: int, n_edges: int):
    rnd = random.Random(seed)
    return [
        (rnd.randrange(n_nodes), rnd.randrange(n_nodes))
        for _ in range(n_edges)
    ]


def _brute_triangles(edges):
    adj: dict[int, set[int]] = {}
    eset = set()
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        if (a, b) in eset:
            continue
        eset.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    tri = 0
    for x, y, z in itertools.combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri += 1
    return len(nodes), len(eset), tri


def test_triangle_count_matches_brute_force(spark):
    for seed, n, m in [(1, 12, 30), (2, 20, 80), (3, 8, 28), (4, 30, 60)]:
        edges = _random_edges(seed, n, m)
        df = spark.createDataFrame(edges, EDGE_SCHEMA)
        got = GR.triangle_count(df, "src", "dst").collect()[0]
        want = _brute_triangles(edges)
        assert (got.n_nodes, got.n_edges, got.n_triangles) == want, (
            seed,
            want,
            got,
        )


def test_triangle_count_counts_each_triangle_once(spark):
    # K4: 4 triangles; plus a pendant edge that adds none.
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 9)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    got = GR.triangle_count(df, "src", "dst").collect()[0]
    assert (got.n_nodes, got.n_edges, got.n_triangles) == (5, 7, 4)


def _brute_pagerank_fp(edges, iters):
    e = sorted({(u, v) for u, v in edges if u != v})
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    outd: dict[int, int] = {}
    for u, _ in e:
        outd[u] = outd.get(u, 0) + 1
    n = len(nodes)
    r0 = GR.SCALE // n
    base = (15 * r0) // 100
    ranks = {v: r0 for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in e:
            s[v] += ranks[u] // outd[u]
        ranks = {v: base + (85 * s[v]) // 100 for v in nodes}
    return ranks


def test_pagerank_fixedpoint_matches_reference(spark):
    for seed, n, m, iters in [(7, 10, 40, 2), (8, 25, 120, 3), (9, 6, 14, 6)]:
        edges = _random_edges(seed, n, m)
        edges = [(u, v) for u, v in edges if u != v]
        if not edges:
            continue
        df = spark.createDataFrame(edges, EDGE_SCHEMA)
        got = {
            r.node: r.rank_fp
            for r in GR.pagerank_fixedpoint(df, iters=iters).collect()
        }
        want = _brute_pagerank_fp(edges, iters)
        assert got == want, (seed, iters)


def test_pagerank_mass_is_conserved_upper_bound(spark):
    # Fixed-point ranks never exceed SCALE in total (integer DIV only
    # truncates mass away; dangling mass is dropped by design).
    edges = _random_edges(11, 15, 60)
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    total = sum(
        r.rank_fp for r in GR.pagerank_fixedpoint(df, iters=4).collect()
    )
    assert 0 < total <= GR.SCALE


def test_bfs_levels_match_networkless_bruteforce(spark):
    """BFS levels vs a pure-Python BFS on a hand-built graph with a
    disconnected component (the unreached-node path)."""
    from collections import deque

    from distributed_mapreduce_p2p_spark.operators.graph import bfs_levels

    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.level for r in bfs_levels(df, 1).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {1: 0}
    q = deque([1])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in expect:
                expect[v] = expect[u] + 1
                q.append(v)
    assert got == expect          # only reached nodes; 5,6 absent
    assert 5 not in got and 6 not in got
