"""Sub-quadratic edit-distance similarity self-join.

Candidate generation uses q-gram PREFIX FILTERING — the public
approximate-string-join technique of Gravano et al. (VLDB'98 count
bound) with the prefix-filter candidate scheme of Chaudhuri/Xiao et
al. (ICDE'06 SSJoin, VLDB'08 Ed-Join). No code is taken from any
implementation; the operator is an original PySpark composition of
built-in expressions (the whole candidate pipeline stays in
whole-stage codegen; verification is the JVM banded ``levenshtein``).

Why it is COMPLETE (no pair with ed <= k is ever dropped):

1. A string ``s`` has ``m = len(s) - q + 1`` q-grams. One edit
   operation (insert/delete/substitute) changes at most ``q`` of them
   as a *multiset*, so ``ed(a, b) <= k`` implies the multiset
   intersection of their q-grams has size >= ``max(m_a, m_b) - q*k``.
2. Tagging every gram with its occurrence index among equal grams
   (``(gram, occ)``) turns multiset intersection into plain set
   intersection: matched tagged tokens per gram = min(count_a,
   count_b).
3. Prefix filter: sort each string's tagged tokens by one global
   total order and keep the first ``p = q*k + 1``. If two token sets
   of sizes m_a, m_b intersect in >= ``max(m_a, m_b) - q*k``
   elements, their (q*k+1)-prefixes under the SAME order must share
   at least one token (standard prefix-filter pigeonhole: a string
   can skip at most ``m - T`` of its own tokens before a shared one
   appears, and ``m - T <= q*k``).

The global order is ascending token frequency (ties by token value),
so prefixes prefer RARE grams — the join's bucket sizes, and hence
the candidate-pair count, collapse from the block-quadratic space to
the rare-token co-occurrence space. The frequency table is a tiny
aggregate (|distinct grams| rows) and is broadcast.

Verification runs the 3-arg banded ``levenshtein(a, b, k)``
(O(k*n) per pair, JVM codegen) on the deduplicated candidates, so
emitted distances are exactly those of the unfiltered quadratic join
(differential-tested in tests/test_ops.py).

Scale: every stage is an equi-shuffle or broadcast join — token
explode is a projection; the frequency aggregate is uniform; the
candidate join keys are (block-cols, rare token); no collect, no
cartesian. Skewed stop-grams are exactly what the frequency-ascending
prefix avoids indexing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _tagged_qgrams(str_col: str, q: int) -> F.Column:
    """Array of (gram, occ) structs: every q-gram of ``str_col``
    tagged with its 1-based occurrence index among equal grams (pure
    SQL expressions — stays in codegen; m^2 scan per string is ~300
    ops for typical name lengths). Empty for strings shorter than
    ``q`` — guarded explicitly because Spark's ``sequence(1, 0)``
    DESCENDS instead of returning empty."""
    return F.expr(
        f"""
        CASE WHEN length({str_col}) >= {q} THEN
        transform(
          sequence(1, length({str_col}) - {q - 1}),
          i -> struct(
            substring({str_col}, i, {q}) AS gram,
            CAST(size(filter(sequence(1, i),
                 j -> substring({str_col}, j, {q}) =
                      substring({str_col}, i, {q}))) AS INT) AS occ))
        ELSE array() END
        """
    )


def edit_distance_pairs(
    df: DataFrame,
    key_col: str,
    str_col: str,
    block_cols: Sequence[str] = (),
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs (key_a < key_b) within the same ``block_cols`` whose
    ``str_col`` values are within edit distance ``k``; output columns
    are the block cols plus (key_a, key_b, str_a, str_b, dist).

    Candidates come from the complete q-gram prefix filter described
    in the module docstring; ``dist`` comes from the exact banded
    ``levenshtein`` verify, so the result equals the plain blocked
    quadratic join's.

    SHORT-STRING PATCH (completeness): the count bound
    ``overlap >= max(m_a, m_b) - q*k`` is vacuous when
    ``max(m) <= q*k``, i.e. both strings shorter than ``q*(k+1)``
    ("ab" vs "ba" is within ed 2 with zero shared bigrams). Strings
    below that length are paired directly inside their block with
    every string within the length filter — a bounded bucket (both
    sides shorter than ``q*(k+1)+k`` chars), verified by the same
    banded levenshtein. Mixed long/short pairs are impossible
    (|len_a - len_b| > k) or satisfy the count bound, so the token
    path covers them.
    """
    p = q * k + 1
    min_len = q * (k + 1)
    blocks = list(block_cols)
    base = df.select(
        *blocks,
        F.col(key_col).alias("__key"),
        F.col(str_col).alias("__str"),
        F.explode(_tagged_qgrams(str_col, q)).alias("__tok"),
    )
    freq = base.groupBy("__tok").agg(F.count(F.lit(1)).alias("__freq"))
    w = Window.partitionBy("__key").orderBy(
        "__freq", F.col("__tok.gram"), F.col("__tok.occ")
    )
    prefix = (
        base.join(broadcast(freq), "__tok")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= p)
        .select(*blocks, "__tok", "__key", "__str")
    )

    a = prefix.select(
        *blocks,
        "__tok",
        F.col("__key").alias("key_a"),
        F.col("__str").alias("str_a"),
    )
    b = prefix.select(
        *blocks,
        "__tok",
        F.col("__key").alias("key_b"),
        F.col("__str").alias("str_b"),
    )
    cand = a.join(b, [*blocks, "__tok"]).where(
        (F.col("key_a") < F.col("key_b"))
        # length filter: |len_a - len_b| > k cannot be within k
        & (F.abs(F.length("str_a") - F.length("str_b")) <= k)
    )

    # short-string patch (see docstring): bounded bucket of strings
    # too short for the count bound, paired within their block
    sa = df.where(F.length(str_col) < min_len).select(
        *blocks,
        F.col(key_col).alias("key_a"),
        F.col(str_col).alias("str_a"),
    )
    sb = df.where(F.length(str_col) < min_len + k).select(
        *blocks,
        F.col(key_col).alias("key_b"),
        F.col(str_col).alias("str_b"),
    )
    short_pairs = (
        sa.join(sb, blocks) if blocks else sa.crossJoin(sb)
    ).where(
        (F.col("key_a") != F.col("key_b"))
        & (F.abs(F.length("str_a") - F.length("str_b")) <= k)
    ).select(
        *blocks,
        F.least("key_a", "key_b").alias("key_a"),
        F.greatest("key_a", "key_b").alias("key_b"),
        F.when(F.col("key_a") < F.col("key_b"), F.col("str_a"))
        .otherwise(F.col("str_b"))
        .alias("str_a"),
        F.when(F.col("key_a") < F.col("key_b"), F.col("str_b"))
        .otherwise(F.col("str_a"))
        .alias("str_b"),
    )

    cand = (
        cand.select(*blocks, "key_a", "key_b", "str_a", "str_b")
        .union(short_pairs)
        .distinct()
    )
    dist = F.levenshtein(F.col("str_a"), F.col("str_b"), k)
    return cand.where(dist >= 0).withColumn("dist", dist)


def _segments_expr(l_col: str, k: int) -> str:
    """k+1 disjoint segments of a length-``l_col`` string: segment j
    (0-based) has start ``j*base + min(j, rem) + 1`` (1-based) and
    length ``base + (j < rem)`` where base = l div (k+1), rem = l %
    (k+1) — the even partition PassJoin uses; any fixed scheme shared
    by index and probe sides preserves completeness."""
    kp1 = k + 1
    return f"""
        transform(sequence(0, {k}), j -> struct(
          j AS j,
          j * ({l_col} DIV {kp1}) + least(j, {l_col} % {kp1}) + 1 AS start,
          ({l_col} DIV {kp1}) +
            CASE WHEN j < {l_col} % {kp1} THEN 1 ELSE 0 END AS slen))
    """


def edit_distance_pairs_passjoin(
    df: DataFrame,
    key_col: str,
    str_col: str,
    block_cols: Sequence[str] = (),
    k: int = 2,
) -> DataFrame:
    """PassJoin-style edit-distance self-join (partition-based ed
    join, Li/Deng/Feng VLDB'11 — public algorithm; original PySpark
    composition): same output contract as ``edit_distance_pairs``.

    Completeness pigeonhole: partition one string of a pair into
    ``k+1`` DISJOINT segments; at most ``k`` edits touch at most
    ``k`` segments, so one segment survives untouched and its aligned
    image is an EXACT substring of the partner, shifted by at most
    ``k`` positions. So: index every string's k+1 segments; probe
    every string's substrings at each segment's (start ± k) window
    for every data length within ``k`` of its own; join on (block,
    indexed-length, segment-id, exact piece). Candidates then get the
    exact banded ``levenshtein`` verify.

    Versus the q-gram prefix filter: join keys are exact
    ``l/(k+1)``-char pieces — far more selective than q-grams when
    strings share a small alphabet or long common prefixes (q-gram
    frequencies collapse there); probe fan-out is a fixed
    ``(k+1)(2k+1)`` per candidate length, independent of data skew.
    Every stage is a projection, a broadcast join against the tiny
    distinct-length table, or an equi-shuffle on selective keys — no
    collect, no cartesian, no frequency pass.
    """
    blocks = list(block_cols)

    # tiny distinct-length table (broadcast): probe only lengths that
    # actually occur — no driver collect.
    lens = df.select(F.length(str_col).cast("int").alias("__l")).distinct()

    # Index side: each string's k+1 segments for ITS length.
    seg = F.explode(F.expr(_segments_expr("__l", k))).alias("__seg")
    idx = (
        df.select(
            *blocks,
            F.col(key_col).alias("key_b"),
            F.col(str_col).alias("str_b"),
            F.length(str_col).cast("int").alias("__l"),
        )
        .select(*blocks, "key_b", "str_b", "__l", seg)
        .select(
            *blocks,
            "key_b",
            "str_b",
            "__l",
            F.col("__seg.j").alias("__j"),
            F.expr("substring(str_b, __seg.start, __seg.slen)").alias("__piece"),
        )
    )

    # Probe side: for every data length within k of our own, extract
    # substrings of that length's segment sizes at starts within +-k
    # of the segment position (clamped; empty windows guarded — Spark
    # sequence(hi, lo) would DESCEND, not return empty).
    probe = (
        df.select(
            *blocks,
            F.col(key_col).alias("key_a"),
            F.col(str_col).alias("str_a"),
            F.length(str_col).cast("int").alias("__la"),
        )
        .join(broadcast(lens), F.abs(F.col("__la") - F.col("__l")) <= k)
        .select(*blocks, "key_a", "str_a", "__la", "__l", seg)
        .select(
            *blocks,
            "key_a",
            "str_a",
            "__l",
            F.col("__seg.j").alias("__j"),
            F.col("__seg.slen").alias("__slen"),
            F.greatest(F.col("__seg.start") - k, F.lit(1)).alias("__lo"),
            F.least(
                F.col("__seg.start") + k,
                F.col("__la") - F.col("__seg.slen") + 1,
            ).alias("__hi"),
        )
        .where(F.col("__lo") <= F.col("__hi"))
        .select(
            *blocks,
            "key_a",
            "str_a",
            "__l",
            "__j",
            F.explode(F.expr("sequence(__lo, __hi)")).alias("__st"),
            "__slen",
        )
        .select(
            *blocks,
            "key_a",
            "str_a",
            "__l",
            "__j",
            F.expr("substring(str_a, __st, __slen)").alias("__piece"),
        )
    )

    cand = (
        probe.join(idx, [*blocks, "__l", "__j", "__piece"])
        .where(F.col("key_a") != F.col("key_b"))
        .select(
            *blocks,
            F.least("key_a", "key_b").alias("key_a2"),
            F.greatest("key_a", "key_b").alias("key_b2"),
            F.when(F.col("key_a") < F.col("key_b"), F.col("str_a"))
            .otherwise(F.col("str_b"))
            .alias("str_a2"),
            F.when(F.col("key_a") < F.col("key_b"), F.col("str_b"))
            .otherwise(F.col("str_a"))
            .alias("str_b2"),
        )
        .distinct()
        .select(
            *blocks,
            F.col("key_a2").alias("key_a"),
            F.col("key_b2").alias("key_b"),
            F.col("str_a2").alias("str_a"),
            F.col("str_b2").alias("str_b"),
        )
    )
    dist = F.levenshtein(F.col("str_a"), F.col("str_b"), k)
    return cand.where(dist >= 0).withColumn("dist", dist)
