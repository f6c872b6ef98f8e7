"""Skew handling: AQE skew-join split, demonstrated not claimed.

SCALE.md's posture is that skewed join keys ride AQE's runtime
re-plan (`spark.sql.adaptive.skewJoin`) rather than hand-salting
every join. This test proves the mechanism actually engages: a
deliberately skewed build side (one key carrying ~98% of rows) is
joined under thresholds scaled down to testdata size, and the
executed AQE plan must show the skewed partition split
(``skew=true``) while the result stays exactly correct.

Complements `salted_wordcount` (explicit salting, the pre-AQE
pattern) in the registry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_p2p_spark.sources.io import scoped_conf


def test_aqe_splits_skewed_join_partition(spark):
    from contextlib import ExitStack

    # 200k rows on one hot key + 4k spread over 1000 cold keys. The
    # payload is scrambled because skew detection reads COMPRESSED
    # map-output bytes — a constant-key/sequential-payload partition
    # lz4-compresses to almost nothing and never crosses the
    # threshold (observed: the original sequential payload kept the
    # 3 MB logical partition under a 64 KB compressed threshold).
    hot = spark.range(200_000).select(
        F.lit(7).alias("k"),
        (F.col("id") * 2654435761 % 1000000007).alias("payload"),
    )
    cold = spark.range(4_000).select(
        (F.col("id") % 1000 + 100).alias("k"), F.col("id").alias("payload")
    )
    left = hot.unionAll(cold)
    right = spark.range(2_000).select(
        (F.col("id") % 1100).alias("k"), (F.col("id") * 10).alias("r")
    )

    with ExitStack() as st:
        for key, val in [
            # Force the shuffle join path (no broadcast shortcut) and
            # scale AQE's skew thresholds down to testdata bytes.
            ("spark.sql.autoBroadcastJoinThreshold", "-1"),
            ("spark.sql.adaptive.enabled", "true"),
            ("spark.sql.adaptive.skewJoin.enabled", "true"),
            ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2"),
            (
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "2048",
            ),
            ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2048"),
            ("spark.sql.adaptive.coalescePartitions.enabled", "false"),
        ]:
            st.enter_context(scoped_conf(spark, key, val))

        # NOTE: the post-join aggregate must NOT require the join
        # key's hash distribution (e.g. groupBy("k")) — AQE skips the
        # skew split when a downstream ENSURE_REQUIREMENTS would be
        # violated by re-partitioning. A global aggregate (or any
        # distribution-free sink) lets OptimizeSkewedJoin engage —
        # the same rule applies when composing real pipelines.
        joined = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("r").alias("s")
        )
        row = joined.collect()[0]
        plan = joined._jdf.queryExecution().executedPlan().toString()

    assert "skew=true" in plan, (
        "AQE did not split the skewed partition; plan:\n" + plan[:2000]
    )

    # Exact correctness after the split, computed independently:
    # every left row with key k matches right rows {i*10 : i%1100==k}.
    right_by_k: dict[int, list[int]] = {}
    for i in range(2_000):
        right_by_k.setdefault(i % 1100, []).append(i * 10)
    left_counts = {7: 200_000}
    for i in range(4_000):
        k = i % 1000 + 100
        left_counts[k] = left_counts.get(k, 0) + 1
    want_n = sum(
        c * len(right_by_k.get(k, [])) for k, c in left_counts.items()
    )
    want_s = sum(
        c * sum(right_by_k.get(k, [])) for k, c in left_counts.items()
    )
    assert (row.n, row.s) == (want_n, want_s)
