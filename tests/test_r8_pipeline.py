"""Round-8 plan changes: independent pure-Python recomputes for the
global_cumsum rewrites (the repo convention: every changed plan
carries a recompute of its math on real data, not just the DuckDB
oracle — the oracle could share a misreading; Python can't share a
Spark plan bug)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_equidepth_ntile_derivation_recompute(spark):
    """The r8 rewrite derives NTILE(10) from the global_cumsum rank
    with the first-r-buckets-take-q+1 integer arithmetic. Recompute
    the buckets from a plain sorted list: any off-by-one in the
    derivation (the classic NTILE fencepost) shifts a boundary row
    into the wrong bucket and flips n/lo/hi/total here."""
    from distributed_mapreduce_p2p_spark import registry
    from distributed_mapreduce_p2p_spark.sources.io import read_table

    rows = (
        read_table(spark, SF_SMALL, "orders")
        .select("o_totalprice", "o_orderkey")
        .collect()
    )
    # decimal(14,2) cast is exact for these 2-decimal literals; carry
    # cents as ints to keep the recompute float-free until the end
    vals = sorted(
        (round(float(r.o_totalprice) * 100), r.o_orderkey) for r in rows
    )
    n, b = len(vals), 10
    q, rr = divmod(n, b)
    expected = {}
    for i, (cents, _) in enumerate(vals, start=1):
        if i <= rr * (q + 1):
            bin_ = (i - 1) // (q + 1) + 1
        else:
            bin_ = rr + (i - 1 - rr * (q + 1)) // q + 1
        agg = expected.setdefault(bin_, [0, None, None, 0])
        agg[0] += 1
        agg[1] = cents if agg[1] is None else min(agg[1], cents)
        agg[2] = cents if agg[2] is None else max(agg[2], cents)
        agg[3] += cents
    got = {
        r.bin: [
            r.n,
            round(r.lo * 100),
            round(r.hi * 100),
            round(r.total * 100),
        ]
        for r in registry.QUERIES["equidepth_bins"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected
    # equal-population invariant: bucket sizes differ by at most 1
    sizes = [v[0] for v in expected.values()]
    assert max(sizes) - min(sizes) <= 1


def test_embedding_norm_outliers_rank_recompute(spark):
    """The r8 rewrite takes the global percentile rank from
    global_cumsum. Recompute the p1/p99 screen from a plain sorted
    norm list (the same pure-Python left-to-right fold the r5 test
    pinned, re-run against the NEW plan)."""
    from distributed_mapreduce_p2p_spark import registry
    from distributed_mapreduce_p2p_spark.sources.io import read_table

    emb = read_table(spark, SF_SMALL, "embeddings").collect()
    norms = []
    for r in emb:
        acc = 0.0
        for x in r.embedding:
            acc += float(x) * float(x)
        norms.append((acc, r.vec_id))
    norms.sort()
    n = len(norms)
    expected = {}
    for rk, (norm2, vid) in enumerate(norms, start=1):
        if rk * 100 <= n:
            expected[vid] = (norm2, "low")
        elif rk * 100 > n * 99:
            expected[vid] = (norm2, "high")
    got = {
        r.vec_id: (r.norm2, r.tag)
        for r in registry.QUERIES["embedding_norm_outliers"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected
    assert any(t == "low" for _, t in got.values())
    assert any(t == "high" for _, t in got.values())
