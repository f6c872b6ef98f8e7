"""Round-9 additions/changes: independent pure-Python recomputes
(the repo convention: every new or changed plan carries a recompute
of its math on real data, not just the DuckDB oracle — the oracle
could share a misreading; Python can't share a Spark plan bug)."""

from __future__ import annotations

import hashlib

from tests.conftest import SF_SMALL


def test_hll_distinct_estimate_recompute(spark):
    """The r9 HLL sketch recomputed from scratch: same portable
    48-bit md5 hash, top-8-bit register index, exact bit-length rho,
    scaled-integer harmonic sum, and the one pinned float expression
    for the estimate. Also pins the estimator's accuracy contract on
    the fixture (within 20% of exact for nations with >= 64 distinct
    orders; HLL's theoretical RSE at m=256 is ~6.5%) and the KMV
    cross-check (the two sketches run the same workload)."""
    from distributed_mapreduce_p2p_spark import registry
    from distributed_mapreduce_p2p_spark.sources.io import read_table

    li = read_table(spark, SF_SMALL, "lineitem").select(
        "l_suppkey", "l_orderkey"
    ).collect()
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in read_table(spark, SF_SMALL, "supplier").collect()
    }
    names = {
        r.n_nationkey: r.n_name
        for r in read_table(spark, SF_SMALL, "nation").collect()
    }

    pairs = {(sup[r.l_suppkey], r.l_orderkey) for r in li}
    hashes: dict[int, set[int]] = {}
    exact: dict[int, set[int]] = {}
    for nk, ok in pairs:
        hv = int(hashlib.md5(str(ok).encode()).hexdigest()[:12], 16)
        hashes.setdefault(nk, set()).add(hv)
        exact.setdefault(nk, set()).add(ok)

    expected = {}
    for nk, hs in hashes.items():
        regs: dict[int, int] = {}
        for hv in hs:
            r, rest = divmod(hv, 1 << 40)
            rho = 41 if rest == 0 else 41 - rest.bit_length()
            regs[r] = max(regs.get(r, 0), rho)
        s_scaled = sum(1 << (41 - m) for m in regs.values())
        s_scaled += (256 - len(regs)) * (1 << 41)
        est = (0.7213 / (1.0 + 1.079 / 256.0)) * float(1 << 57) / float(
            s_scaled
        )
        expected[names[nk]] = (
            len(hs),
            256 - len(regs),
            s_scaled,
            est,
        )

    got = {
        r.n_name: (
            r.n_exact_hashes,
            r.n_zero_registers,
            r.register_sum_scaled,
            r.hll_estimate,
        )
        for r in registry.QUERIES["hll_distinct_estimate"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected  # bit-exact, including the double

    # estimator sanity on real data: raw HLL within 20% of exact for
    # groups big enough that the small-range regime doesn't dominate
    checked = 0
    for name, (_, zeros, _, est) in expected.items():
        nk = next(k for k, v in names.items() if v == name)
        nd = len(exact[nk])
        if nd >= 64:
            assert abs(est - nd) / nd < 0.20, (name, est, nd)
            checked += 1
    assert checked > 0, "fixture degenerate: no nation with >=64"


def test_hll_register_sum_bounds():
    """The scaled harmonic sum is provably exact BIGINT arithmetic:
    every per-register term 2^(41-M) with M in [1, 41] and the empty-
    register term 2^41 are integers, and the worst-case total
    256 * 2^41 = 2^49 sits far under 2^63 — no overflow at any data
    size (the register COUNT is fixed; only values move)."""
    assert 256 * (1 << 41) == 1 << 49
    assert (1 << 49) < (1 << 63) - 1


def test_ivf_recall_curve_sims_cand_key_preserving(spark):
    """r9 ADVICE pin: ivf_recall_curve's cost axis counts the
    checkpointed `sims` table in place of `cand`, which is valid
    only while the q/c attach joins are key-preserving — i.e. while
    embeddings vec_id is unique. This test makes the module-wide
    unique-vec_id assumption a measured fact at the fixture AND
    compares the two counts at one nprobe so a duplicate-id fixture
    would fail here instead of silently inflating the cost axis."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_p2p_spark.operators import similarity as S
    from distributed_mapreduce_p2p_spark.sources.io import read_table

    emb = read_table(spark, SF_SMALL, "embeddings")
    dup = (
        emb.groupBy("vec_id").count().where(F.col("count") > 1).count()
    )
    assert dup == 0, "fixture broke the module-wide unique-vec_id bet"

    base = S.with_norm2(emb)
    cent = S._centroids(base, S.IVF_CELLS)
    cells = (
        S._rank_cells(base, cent)
        .where(F.col("rnk") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"))
    )
    probes = (
        S._rank_cells(
            base.where(F.col("vec_id") < 8), cent
        )
        .where(F.col("rnk") <= 4)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("cent_id").alias("cell"),
            F.col("rnk").alias("probe_rank"),
        )
    )
    cand_n = probes.join(cells, "cell").count()
    sims_n = (
        registry_sims_count(spark, probes, cells, base)
    )
    assert cand_n == sims_n


def registry_sims_count(spark, probes, cells, base):
    """|sims| the way ivf_recall_curve builds it: cand joined to the
    query and corpus embedding attaches."""
    from pyspark.sql import functions as F

    cand = probes.join(cells, "cell").select(
        "qid", F.col("vec_id").alias("cid"), "probe_rank"
    )
    q = base.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("q_n2"),
    )
    c = base.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("norm2").alias("c_n2"),
    )
    return cand.join(q, "qid").join(c, "cid").count()
