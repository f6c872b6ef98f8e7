"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB-equivalent
ANSI-SQL oracle string (driver contract, BASELINE.md).

Naming: keys carry the SURVEY.md §2 operator ids they demonstrate
(e.g. ``wordcount`` = P1+A1-A3, ``gap_detect`` = J3/R4) so coverage
is checkable line by line.

Determinism rules applied throughout (both sides identically):
- every computed column is aliased to the same name in Spark and SQL;
- money/metric aggregates are cast to DECIMAL before summing (exact,
  order-insensitive) and the result cast back to DOUBLE;
- ratios are derived from those exact sums with one double division;
- timestamps that are *computed* (truncated/bucketed) are formatted
  to strings; raw pass-through timestamps stay native.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_mapreduce_p2p_spark.operators import text as T
from distributed_mapreduce_p2p_spark.operators import relational as R

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


from distributed_mapreduce_p2p_spark.sources.io import read_table as _t  # noqa: E402


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's query (wc/wc.go:26-47) on documents.text."""
    return T.word_count_sorted(_t(spark, sf_dir, "documents"))


# =====================================================================
# Text / word count — the reference's entire query surface
# =====================================================================

@register(
    "wordcount",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(text, '[^A-Za-z]+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount(spark, sf_dir):
    """P1 tokenize + A1/A2/A3 partial+final count (wc/wc.go:26-47,
    mapreduce/worker.go:151-258)."""
    return T.word_count(_t(spark, sf_dir, "documents"))


@register(
    "wordcount_topk",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(text, '[^A-Za-z]+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 25
    """,
)
def q_wordcount_topk(spark, sf_dir):
    """Top-k extension over the flagship aggregate (SURVEY.md §2.6:
    no LIMIT exists in the reference; TakeOrdered partial top-k)."""
    return T.top_k_words(_t(spark, sf_dir, "documents"), 25)


@register(
    "wordcount_numbered",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY word) AS BIGINT) AS id,
           word, cnt
    FROM (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split_regex(text, '[^A-Za-z]+')) AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY word
    )
    """,
)
def q_wordcount_numbered(spark, sf_dir):
    """S4: the replication payload (id, word, cnt) — 1-based line
    number of the sorted result (replication/replication.go:524-550)."""
    return T.numbered_result(_t(spark, sf_dir, "documents"))


# =====================================================================
# Filters / projections (P2-P5) and ordering/dedup (O4)
# =====================================================================

@register(
    "range_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id BETWEEN 1000 AND 4999
    """,
)
def q_range_filter(spark, sf_dir):
    """P2/P3: inclusive id-range predicate (replication/replication.
    go:497-521); pushed down to the parquet scan."""
    return R.range_filter(
        _t(spark, sf_dir, "events"), "event_id", 1000, 4999
    ).select("event_id", "user_id", "event_type", "value")


@register(
    "staleness_filter",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
    """,
)
def q_staleness_filter(spark, sf_dir):
    """P4: event-time staleness cutoff (raft/raft.go:88 drops messages
    older than 2 s) — batch analog of a watermark."""
    return R.staleness_filter(
        _t(spark, sf_dir, "events"), "ts", "2024-01-25 00:00:00"
    ).select("event_id", "user_id", "event_type")


@register(
    "dedupe_keep_last",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_dedupe_keep_last(spark, sf_dir):
    """O4: keep-latest upsert (insertDataItemSorted, replication/
    replication.go:553-575). Latest event per user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "gap_detect",
    oracle="""
    WITH present AS (
      SELECT DISTINCT event_id AS id FROM events WHERE event_id % 5 <> 0
    ), x AS (
      SELECT id, LAG(id) OVER (ORDER BY id) AS prev FROM present
    )
    SELECT CAST(CASE WHEN prev IS NULL THEN 1 ELSE prev + 1 END AS BIGINT)
             AS gap_start,
           CAST(id - 1 AS BIGINT) AS gap_end
    FROM x
    WHERE (prev IS NOT NULL AND id - prev > 1) OR (prev IS NULL AND id > 1)
    """,
)
def q_gap_detect(spark, sf_dir):
    """J3/R4: missing-id-range detection (CheckAndDump, replication/
    replication.go:344-407) via window-lag — no sequence() explode, so
    it survives sparse 100 TB id domains. Gaps are simulated by
    dropping ids divisible by 5."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") % 5 != 0)
    return R.detect_gaps(ev, "event_id")


@register(
    "schema_on_read",
    oracle="""
    SELECT k, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k
    FROM (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    GROUP BY k
    """,
)
def q_schema_on_read(spark, sf_dir):
    """P5: schema-on-read line parse (MergeReduceOutputs re-parses
    'word count' text lines, mapreduce/worker.go:240-258) — here JSON
    props → typed column, aggregated."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


# =====================================================================
# Aggregations (A1-A4) on the star schema
# =====================================================================

@register(
    "agg_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(4,2)))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(4,2))
                    * CAST(1 + l_tax AS DECIMAL(4,2)))
                AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing(spark, sf_dir):
    """A1+A2+A3: hash group-by with partial+final aggregation
    (mapreduce/worker.go:151-258's two-level agg) — TPC-H-Q1-shaped
    pricing summary. DECIMAL sums are exact → order-insensitive."""
    li = _t(spark, sf_dir, "lineitem")
    dec2 = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    # Factors cast to exact low-scale DECIMAL *before* multiplying:
    # decimal arithmetic is exact and order-insensitive, so Spark and
    # the oracle agree bit-for-bit (double*10^s rounding at high scale
    # does not).
    disc = F.expr(
        "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
    )
    charge = F.expr(
        "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
        " * CAST(1 + l_tax AS DECIMAL(4,2))"
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (
                F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "sorted_runlength_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_sorted_runlength_agg(spark, sf_dir):
    """A4: the sequential oracle's sort-then-run-length aggregation
    (mrsequential.go:114-139). Declared as a plain groupBy — Catalyst
    picks hash vs sort aggregate; semantics identical."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


# =====================================================================
# Joins / set ops (J1-J3 + standard surface; reference has no joins)
# =====================================================================

@register(
    "union_all_scans",
    oracle="""
    SELECT src, COUNT(*) AS cnt FROM (
      SELECT 'odd' AS src, event_id FROM events WHERE event_id % 2 = 1
      UNION ALL
      SELECT 'even' AS src, event_id FROM events WHERE event_id % 2 = 0
    ) GROUP BY src
    """,
)
def q_union_all_scans(spark, sf_dir):
    """J1: union-all of per-source scans (mrsequential.go:104-105
    appends per-file map output)."""
    ev = _t(spark, sf_dir, "events")
    odd = ev.where(F.col("event_id") % 2 == 1).select(
        F.lit("odd").alias("src"), "event_id"
    )
    even = ev.where(F.col("event_id") % 2 == 0).select(
        F.lit("even").alias("src"), "event_id"
    )
    return odd.unionAll(even).groupBy("src").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "star_join_revenue",
    oracle="""
    SELECT r_name AS region, n_name AS nation,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
)
def q_star_join_revenue(spark, sf_dir):
    """Standard star join (SURVEY.md §2.7: our engine ships the full
    join surface). nation/region broadcast; fact join shuffles on
    orderkey/custkey — the plan that survives 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.expr(
        "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
)
def q_semi_join(spark, sf_dir):
    """Left-semi join (standard surface)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    """,
)
def q_anti_join(spark, sf_dir):
    """Left-anti join — the relational form of gap detection (J3:
    expected-minus-present, replication/replication.go:344-407)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "membership_merge",
    oracle="""
    SELECT COALESCE(l.k, r.k) AS nationkey,
           GREATEST(COALESCE(l.hb, r.hb), COALESCE(r.hb, l.hb)) AS hb
    FROM (SELECT c_nationkey AS k, MAX(c_acctbal) AS hb
          FROM customer GROUP BY c_nationkey) l
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, MAX(s_acctbal) AS hb
          FROM supplier GROUP BY s_nationkey) r
    ON l.k = r.k
    """,
)
def q_membership_merge(spark, sf_dir):
    """J2: gossip membership merge — full-outer merge-by-key, higher
    counter wins (MergeLeft, gossip/gossip.go:87-108)."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.max("c_acctbal").alias("lc"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.max("s_acctbal").alias("rc"))
    )
    return c.join(s, "k", "full_outer").select(
        F.col("k").alias("nationkey"),
        F.greatest(F.coalesce("lc", "rc"), F.coalesce("rc", "lc")).alias("hb"),
    )


@register(
    "set_ops",
    oracle="""
    SELECT 'both' AS tag, n FROM (
      SELECT c_nationkey AS n FROM customer
      INTERSECT
      SELECT s_nationkey AS n FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS tag, n FROM (
      SELECT c_nationkey AS n FROM customer
      EXCEPT
      SELECT s_nationkey AS n FROM supplier)
    """,
)
def q_set_ops(spark, sf_dir):
    """Set operations (standard surface): intersect + except over
    nation keys."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n"))
    both = c.intersect(s).select(F.lit("both").alias("tag"), "n")
    only = c.subtract(s).select(F.lit("customer_only").alias("tag"), "n")
    return both.unionAll(only)


# =====================================================================
# Windows (S4 generalization; reference has none — SURVEY.md §2.6)
# =====================================================================

@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def q_window_running_total(spark, sf_dir):
    """Window function surface: per-customer running total in order
    date order (exact DECIMAL accumulation)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window_agg(spark, sf_dir):
    """Batch analog of the streaming tumbling-window aggregation
    (SURVEY.md §2.8: reference has no windows; this is the idiomatic
    generalization of its 2 s cadence). Streaming twin lives in
    ``streaming/windows.py``."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
    )
