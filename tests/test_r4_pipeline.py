"""Structural property tests for the round-4 pipeline queries —
invariants the DuckDB hash parity can't express (coverage,
permutation completeness, interval disjointness)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _q(name):
    from distributed_mapreduce_p2p_spark import registry

    return registry.QUERIES[name]


def test_global_shuffle_is_a_permutation(spark):
    """Every doc appears exactly once, and positions within each
    bucket are exactly 1..bucket_size (a true permutation — no gap,
    no collision)."""
    out = _q("global_shuffle_order")(spark, SF_SMALL)
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    per_bucket = out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("npos"),
    )
    bad = per_bucket.where(
        (F.col("lo") != 1)
        | (F.col("hi") != F.col("n"))
        | (F.col("npos") != F.col("n"))
    )
    assert bad.count() == 0


def test_mixture_reweight_invariants(spark):
    rows = _q("mixture_reweight")(spark, SF_SMALL).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0.0 < r.weight <= 4.0
        assert math.isclose(r.expected_tokens, r.weight * r.bucket_tokens)
    # uncapped buckets land exactly on the uniform target
    corpus = sum(r.bucket_tokens for r in rows)
    target = corpus / len(rows)
    for r in rows:
        if r.weight < 4.0:
            assert math.isclose(r.weight * r.bucket_tokens, target)


def test_scd2_intervals_partition_each_user_timeline(spark):
    out = _q("scd2_history")(spark, SF_SMALL)
    rows = out.orderBy("user_id", "valid_from").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        # exactly one open row, and it is the last one
        currents = [r for r in ivs if r.is_current]
        assert len(currents) == 1 and ivs[-1].is_current
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # gapless
            assert a.valid_from < a.valid_to  # non-empty, ordered
            assert a.event_type != b.event_type  # collapsed runs


def test_doc_chunking_covers_every_token(spark):
    """Chunk grid: ceil(n/48) chunks per doc, each n_tokens =
    min(64, n - 48*idx) — together the windows cover [0, n) with the
    designed 16-token overlap."""
    chunks = _q("doc_chunking")(spark, SF_SMALL)
    toks = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id",
        F.expr(r"size(filter(split(text, '[\\s]+'), x -> x <> ''))").alias(
            "n"
        ),
    )
    joined = (
        chunks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .join(toks, "doc_id")
    )
    bad = joined.where(
        F.col("n_chunks") != F.ceil(F.col("n") / 48).cast("long")
    )
    assert bad.count() == 0
    per_chunk_bad = chunks.join(toks, "doc_id").where(
        F.col("n_tokens")
        != F.least(F.lit(64), F.col("n") - F.col("chunk_idx") * 48)
    )
    assert per_chunk_bad.count() == 0


def test_source_reputation_accounts_for_all_docs(spark):
    out = _q("source_reputation")(spark, SF_SMALL)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    assert out.agg(F.sum("n_docs")).first()[0] == docs.count()
    assert out.count() == docs.select("source").distinct().count()
    rows = out.collect()
    assert all((r.mean_chars >= 300.0) == r.keep for r in rows)


def test_span_dedup_reconstruction_matches_local_recompute(spark):
    """Full independent recompute of span_dedup_clean in plain Python
    (no Spark, no SQL): same span grid, same >2-distinct-docs cut,
    same in-order reconstruction — md5s must agree doc-for-doc."""
    import hashlib
    from collections import defaultdict

    out = {
        r.doc_id: r
        for r in _q("span_dedup_clean")(spark, SF_SMALL).collect()
    }
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    spans_by_doc = {}
    span_docs = defaultdict(set)
    for d in docs:
        toks = [t for t in d.text.split() if t]
        spans = [
            " ".join(toks[i : i + 3]) for i in range(0, len(toks), 3)
        ]
        spans_by_doc[d.doc_id] = spans
        for s in spans:
            span_docs[s].add(d.doc_id)
    assert set(out) == set(spans_by_doc)
    for doc_id, spans in spans_by_doc.items():
        dup = [len(span_docs[s]) > 2 for s in spans]
        clean = " ".join(s for s, is_dup in zip(spans, dup) if not is_dup)
        r = out[doc_id]
        assert r.n_spans == len(spans)
        assert r.n_removed == sum(dup)
        assert r.clean_md5 == hashlib.md5(clean.encode()).hexdigest()


def test_k_anonymity_audit_invariants(spark):
    out = _q("k_anonymity_audit")(spark, SF_SMALL)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    rows = out.collect()
    assert all(r.suppress == (r.k_users < 5) for r in rows)
    assert all(0 < r.k_users <= r.n_rows for r in rows)
    assert sum(r.n_rows for r in rows) == ev.count()
    assert out.count() == ev.select(
        "event_type", F.to_date("ts")
    ).distinct().count()


def test_priority_sample_matches_local_recompute(spark):
    """Exact pure-Python recompute of the Duffield-Lund-Thorup
    priority sample: same md5-derived uniform, same u/w priority,
    same per-source top-20 — the winning doc set must be identical
    (and IEEE double priorities equal bit-for-bit)."""
    import hashlib

    out = _q("priority_sample_per_source")(spark, SF_SMALL).collect()
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    by_source: dict[str, list] = {}
    for d in docs:
        h = int(
            hashlib.md5(f"psamp:{d.doc_id}".encode()).hexdigest()[:13], 16
        )
        pri = (h / 4503599627370496.0) / float(d.n_chars)
        by_source.setdefault(d.source, []).append((pri, d.doc_id))
    expect = {}
    for src, lst in by_source.items():
        for pri, doc_id in sorted(lst)[:20]:
            expect[(src, doc_id)] = pri
    got = {(r.source, r.doc_id): r.priority for r in out}
    assert got == expect


def test_source_token_drift_matches_local_recompute(spark):
    """Pure-Python recompute of the TVD drift metric with unbounded
    ints for the sum and the SAME IEEE operation order for the final
    division — values must match bit-for-bit."""
    import re
    from collections import Counter

    out = {r.source: r for r in _q("source_token_drift")(spark, SF_SMALL).collect()}
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    cs: dict[str, Counter] = {}
    cw: Counter = Counter()
    for d in docs:
        words = [w for w in re.split("[^A-Za-z]+", d.text) if w]
        cs.setdefault(d.source, Counter()).update(words)
        cw.update(words)
    n = sum(cw.values())
    assert set(out) == set(cs)
    for src, counter in cs.items():
        n_s = sum(counter.values())
        s = sum(abs(counter[w] * n - c_w * n_s) for w, c_w in cw.items())
        tvd = float(s) / (float(n_s) * float(n)) / 2.0
        r = out[src]
        assert r.n_tokens == n_s
        assert r.tvd == tvd
        assert 0.0 <= r.tvd <= 1.0
