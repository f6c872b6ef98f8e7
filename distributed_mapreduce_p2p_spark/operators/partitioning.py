"""Partitioning and skew-handling operators (SURVEY.md §2.4).

H1 (FNV-hash bucketing, mapreduce/worker.go:31-35,119-122) and H2
(contiguous range splitting, replication/replication.go:100-150) are
Spark exchanges: ``repartition(n, key)`` and
``repartitionByRange(n, key)``. This module adds the piece Spark does
NOT do automatically for hand-written two-stage plans: salted
aggregation for skewed keys.

(For *joins*, AQE's skew-join handles it at runtime — enabled in
session.py. Salting matters for heavy-hitter aggregations where one
key dominates a partition; the word-count corpus here has ~31
distinct words across millions of tokens — exactly that shape.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_partition(df: DataFrame, n: int, *cols: str) -> DataFrame:
    """H1: explicit hash exchange (Murmur3 where the reference used
    FNV-32a — partition assignment differs, results identical)."""
    return df.repartition(n, *[F.col(c) for c in cols])


def range_partition(df: DataFrame, n: int, *cols: str) -> DataFrame:
    """H2: contiguous range exchange (the reference's AssignData
    splits an id range into <= 6 contiguous sub-ranges)."""
    return df.repartitionByRange(n, *[F.col(c) for c in cols])


def salted_count(
    df: DataFrame,
    key: str,
    salt_src: str | Column,
    n_salts: int = 16,
    out_col: str = "cnt",
) -> DataFrame:
    """Two-stage skew-safe count per key.

    Stage 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 sums the partial counts per key.
    The salt derives from a data column (deterministic, no rand()),
    and the result is independent of the salt by construction —
    equal to a plain ``groupBy(key).count()``.

    Note Spark's built-in partial aggregation already handles *count*
    skew when upstream partitions are balanced; explicit salting is
    the pattern for skewed high-cardinality partition keys and for
    aggs without map-side combine. It's exposed here as the
    reference-free demonstration of that plan shape.
    """
    salt = F.pmod(F.xxhash64(salt_src if isinstance(salt_src, Column) else F.col(salt_src)), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(
        F.sum("__partial").cast("long").alias(out_col)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: the (large, possibly skewed) left side
    gets a deterministic salt in [0, n_salts); the (smaller) right
    side is replicated n_salts times; the join key becomes
    (key, salt), spreading each hot key over n_salts reducers.
    Result set is provably identical to ``left.join(right, key)``.

    AQE's skew-join covers most cases at runtime; explicit salting is
    for static plans (e.g. writing pre-salted tables) or engines/
    stages where AQE can't split (aggregation buffers behind the
    join). The replicate-small-side cost is n_salts x |right|.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_s = left.withColumn("__salt", salt)
    r_s = right.crossJoin(
        left.sparkSession.range(n_salts).select(
            F.col("id").cast("int").alias("__salt")
        )
    )
    return l_s.join(r_s, [key, "__salt"]).drop("__salt")
