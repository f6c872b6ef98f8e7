"""Tokenization and word count — the reference's one and only query.

Reference pipeline (SURVEY.md §3.1/§3.2): chunk scan → Map tokenizer
(wc/wc.go:26-39, split on non-letters, emit {word,"1"}) → FNV hash
shuffle (mapreduce/worker.go:117-143) → per-key count reduce
(wc/wc.go:44-47) → per-partition sort (worker.go:191-210) → global
merge re-sum + sort (worker.go:218-272). Output: 26,010 sorted
``word count`` lines, byte-identical to the sequential oracle
(mrsequential.go:80-142).

Spark expression: the whole distributed pipeline is one declarative
plan — ``explode(split(...)) → groupBy(word).count() → orderBy`` —
where Catalyst gives partial+final aggregation (A3) automatically and
the exchange subsumes the shuffle-file machinery. Stays entirely in
whole-stage codegen (no Python in the hot path).

Tokenizer parity note (SURVEY.md §7): Go ``FieldsFunc(unicode.
IsLetter)`` is Unicode-aware; we standardize on ``[^A-Za-z]+`` which
both Spark and the DuckDB oracle implement identically. Spark's
``split`` yields empty strings at boundaries where Go drops them, so
the non-empty filter is required for parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SEP = "[^A-Za-z]+"
#: Exact Go-parity separator: ``FieldsFunc(unicode.IsLetter)`` ==
#: split on non-letters, Unicode-aware (Java ``\p{L}``). Verified
#: byte-identical to the reference's checked-in ``mr-out-final``
#: golden output (tests/test_reference_golden.py). The ASCII TOKEN_SEP
#: is the default because the DuckDB oracle shares it.
TOKEN_SEP_UNICODE = r"[^\p{L}]+"


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
    sep: str = TOKEN_SEP,
) -> DataFrame:
    """P1: flat-map each row's text into one row per token.

    Case-preserving by default like the reference (wc/wc.go:26-39).
    """
    col: Column = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return df.select(F.explode(F.split(col, sep)).alias("word")).where(
        F.col("word") != ""
    )


def word_count(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
    sep: str = TOKEN_SEP,
) -> DataFrame:
    """A1+A2+A3: count per token. Returns (word, cnt), unordered.

    Catalyst plans this as partial_count → hash exchange on word →
    final count (exactly the reference's map-side emit / reduce-side
    count / merge re-sum split, worker.go:151-258), with map-side
    combine so the shuffle carries one row per (partition, word) —
    the property that makes this survive 100 TB of text.
    """
    return tokenize(df, text_col, lowercase, sep).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def word_count_sorted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """O3: globally key-sorted counts — the ``mr-out-final`` shape
    (worker.go:261-265). Range exchange + sort; at scale keep the sort
    but never coalesce to one partition."""
    return word_count(df, text_col).orderBy("word")


def numbered_result(df: DataFrame, text_col: str = "text") -> DataFrame:
    """S4 analog: the replication payload ``(id, word, cnt)`` where id
    is the 1-based line number of the sorted result
    (replication/replication.go:13-16, 524-550).

    DEMO FORM — reference-faithful, NOT the scale path.
    ``row_number`` over a global order funnels the whole result
    through ONE partition; acceptable only because the reference's
    result table is small (26k rows). For any large result use
    ``numbered_result_scalable`` (partition-offset numbering,
    identical output, every stage partition-parallel — its plan is
    asserted single-partition-exchange-free in tests/test_plans.py).
    """
    w = Window.orderBy("word")
    return word_count(df, text_col).withColumn(
        "id", F.row_number().over(w).cast("long")
    ).select("id", "word", "cnt")


def top_k_words(df: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Top-k extension (no LIMIT/top-k exists in the reference —
    SURVEY.md §2.6). TakeOrdered pattern: partial top-k per partition,
    merged on the driver — no global sort materialization."""
    return (
        word_count(df, text_col)
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(k)
    )


def numbered_result_scalable(
    df: DataFrame, text_col: str = "text", n_parts: int = 8
) -> DataFrame:
    """S4 at 100 TB: global 1-based numbering WITHOUT a
    single-partition window — the partition-offset (zipWithIndex)
    pattern in pure DataFrame ops.

    Two passes over the range-partitioned data: (1) per-partition row
    counts (tiny) -> running-total offsets (window over n_parts rows);
    (2) per-partition ``row_number`` (parallel windows) + broadcast
    offset join. Identical output to ``numbered_result`` for any
    unique key set; every stage is partition-parallel.
    """
    wc = (
        word_count(df, text_col)
        .repartitionByRange(n_parts, "word")
        .withColumn("pid", F.spark_partition_id())
    )
    # lineage guard: pid must not be recomputed under a different plan
    wc = wc.localCheckpoint()
    counts = wc.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    off_w = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "pid",
        (F.sum("n").over(off_w) - F.col("n")).alias("offset"),
    )
    in_part = Window.partitionBy("pid").orderBy("word")
    return (
        wc.join(F.broadcast(offsets), "pid")
        .withColumn(
            "id",
            (F.row_number().over(in_part) + F.col("offset")).cast("long"),
        )
        .select("id", "word", "cnt")
    )


def _bpe_merge_fold(a: str, b: str) -> str:
    """SQL fold expression applying ONE merge (a,b) -> ab to a
    ``symbols`` array column, left-to-right non-overlapping (the BPE
    application rule). Symbols are ASCII letters + '_' so the
    literals embed safely."""
    ab = a + b
    return (
        "aggregate(symbols, cast(array() as array<string>),"
        " (acc, x) -> CASE WHEN size(acc) > 0"
        f" AND element_at(acc, -1) = '{a}' AND x = '{b}'"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array('{ab}'))"
        " ELSE concat(acc, array(x)) END)"
    )


def bpe_learn(docs: DataFrame, rounds: int = 8) -> DataFrame:
    """Learn ``rounds`` BPE merges over the corpus and return the
    merge table ``(round, pair, freq)`` — the iterative
    subword-tokenizer training step of an LLM data pipeline (Sennrich
    et al. 2016), alongside PageRank the repo's second driver-looped
    iterative algorithm.

    Scale shape: the working state is the DISTINCT-WORD frequency
    table with symbol arrays — vocabulary-bounded, NOT corpus-bounded
    (a 100 TB corpus and a 100 GB corpus with the same vocabulary
    train on the same state after the one corpus-wide word count).
    Each round is one partial+final pair-count aggregation over the
    vocab plus a single argmax ROW collected to the driver (the same
    1-row-collect class as the audited scalar attaches); the merge
    itself is a JVM higher-order fold over each symbol array —
    left-to-right non-overlapping, the BPE application rule. Lineage
    is truncated with an eager ``localCheckpoint`` per round (the
    PageRank pattern, operators/graph.py:110-166) so round N's plan
    does not nest N HOF rewrites.

    Symbols are ASCII letters plus the ``_`` end-of-word marker, so
    merged tokens embed safely in the fold expression literals.
    """
    spark = docs.sparkSession
    return spark.createDataFrame(
        bpe_learn_merges(docs, rounds),
        "round: bigint, pair: string, freq: bigint",
    )


def bpe_learn_merges(
    docs: DataFrame, rounds: int = 8
) -> list[tuple[int, str, int]]:
    """The training loop behind ``bpe_learn``, returning the merge
    list ``[(round, "a+b", freq), ...]`` as plain Python — the form
    ``bpe_token_counts`` (the APPLY side) consumes."""
    words = word_count(docs)
    syms = words.select(
        "cnt",
        F.expr(
            "concat(filter(split(word, ''), x -> x <> ''), array('_'))"
        ).alias("symbols"),
    ).localCheckpoint(eager=True)
    out = []
    for rnd in range(1, rounds + 1):
        pairs = (
            syms.select(
                "cnt",
                F.explode(
                    F.expr("sequence(1, size(symbols) - 1)")
                ).alias("i"),
                F.col("symbols"),
            )
            .select(
                "cnt",
                F.expr("element_at(symbols, i)").alias("a"),
                F.expr("element_at(symbols, i + 1)").alias("b"),
            )
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("f"))
        )
        best = (
            pairs.orderBy(F.col("f").desc(), "a", "b").limit(1).collect()
        )
        if not best:
            break
        a, b, f = best[0].a, best[0].b, best[0].f
        out.append((rnd, f"{a}+{b}", int(f)))
        syms = syms.select(
            "cnt",
            F.expr(_bpe_merge_fold(a, b)).alias("symbols"),
        )
        # Checkpoint every OTHER round: two nested HOF folds are
        # cheap to plan, and halving the eager materialization jobs
        # matters when each round is job-scheduling-bound (the vocab
        # table is tiny). Lineage still never nests more than 2 folds.
        if rnd % 2 == 0:
            syms = syms.localCheckpoint(eager=True)
    return out


def bpe_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """APPLY a learned merge list: per distinct word, the token count
    under the BPE vocabulary — ``(word, n_tokens)``. This is the
    inference side of ``bpe_learn`` (tokenizer application), and like
    training it is vocabulary-bounded: the folds run once per
    DISTINCT word, never per corpus occurrence; callers join the
    resulting map back to the corpus (broadcast — the vocab is tiny
    relative to the corpus even at 100 TB)."""
    syms = tokenize(docs).distinct().select(
        "word",
        F.expr(
            "concat(filter(split(word, ''), x -> x <> ''), array('_'))"
        ).alias("symbols"),
    )
    # Sequential narrow projections: 8 chained JVM folds, one stage,
    # no shuffle between them.
    for a, b in merges:
        syms = syms.select(
            "word", F.expr(_bpe_merge_fold(a, b)).alias("symbols")
        )
    return syms.select("word", F.size("symbols").cast("long").alias("n_tokens"))
