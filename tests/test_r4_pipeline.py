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


def test_hdr_sketch_error_bound_vs_exact(spark):
    """The sketch's reported bucket lower bound must sit within the
    designed relative error of the exact rank statistic: for the
    HDR scheme (16 linear sub-buckets per octave) the true quantile
    x lies in [lb, lb * 17/16) for lb >= 16, so lb <= x_exact and
    x_exact < lb * 1.0625 (+1 for the integer ceiling)."""
    out = {r.event_type: r for r in _q("hdr_quantile_sketch")(spark, SF_SMALL).collect()}
    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select(
            "event_type",
            (F.col("value").cast("decimal(14,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .collect()
    )
    from collections import defaultdict

    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(r.cents)
    assert set(out) == set(groups)
    for et, vals in groups.items():
        vals.sort()
        n = len(vals)
        r = out[et]
        assert r.n == n
        for q, lb in ((50, r.p50_cents_lb), (95, r.p95_cents_lb), (99, r.p99_cents_lb)):
            # the sketch picks the bucket containing the ceil(q*n/100)-th
            # order statistic; its lower bound brackets the exact value
            exact = vals[-(-q * n // 100) - 1]
            assert lb <= exact, (et, q, lb, exact)
            upper = lb + 1 if lb < 16 else (lb * 17) // 16 + 1
            assert exact < upper, (et, q, lb, exact)


def test_int8_topk_recall_vs_float_baseline(spark):
    """Quantized int8 top-3 must substantially agree with the exact
    float-dot top-3 (recall >= 0.6 on the test corpus), and every
    reported qdot must equal a local recompute of the quantized dot
    product."""
    import numpy as np

    out = _q("int8_quantized_topk")(spark, SF_SMALL).collect()
    rows = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    codes = {}
    for vid, v in vecs.items():
        m = np.max(np.abs(v))
        codes[vid] = (
            np.zeros_like(v, dtype=np.int64)
            if m == 0
            else np.trunc(127.0 * v / m).astype(np.int64)
        )
    got = {}
    for r in out:
        assert r.qdot == int(np.dot(codes[r.query_id], codes[r.vec_id]))
        got.setdefault(r.query_id, []).append(r.vec_id)
    hits = total = 0
    for qid in got:
        exact = sorted(
            (v for v in vecs if v != qid),
            key=lambda v: (-float(np.dot(vecs[qid], vecs[v])), v),
        )[:3]
        hits += len(set(got[qid]) & set(exact))
        total += 3
    assert total == 15
    assert hits / total >= 0.6, hits / total


def test_bloom_prune_has_no_false_negatives(spark):
    """Bloom filters overapproximate: every exact member must pass
    (bloom_pass >= exact_members per nation, false_pos >= 0 and
    consistent), and the filter must actually prune (global pass
    count well below the full customer count)."""
    out = _q("bloom_prune_accounting")(spark, SF_SMALL).collect()
    n_cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    assert len(out) > 0
    for r in out:
        assert r.false_pos >= 0
        assert r.bloom_pass == r.exact_members + r.false_pos
    total_pass = sum(r.bloom_pass for r in out)
    total_exact = sum(r.exact_members for r in out)
    assert total_pass >= total_exact
    assert total_pass < n_cust  # the filter prunes


def test_bm25_matches_local_recompute(spark):
    """Pure-Python recompute of the fixed-point BM25 with unbounded
    ints for every factor and the SAME IEEE operation order — values
    must match bit-for-bit."""
    import re
    from collections import Counter

    out = {r.doc_id: r for r in _q("bm25_scores")(spark, SF_SMALL).collect()}
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    tf: dict[int, Counter] = {}
    for d in docs:
        words = [w for w in re.split("[^A-Za-z]+", d.text) if w]
        tf[d.doc_id] = Counter(words)
    n = len(docs)
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    t = sum(sum(c.values()) for c in tf.values())
    qterms = sorted(
        ((w, d) for w, d in df.items() if len(w) >= 4),
        key=lambda wd: (-wd[1], wd[0]),
    )[:3]
    expect_docs = {
        did for did, c in tf.items() if any(w in c for w, _ in qterms)
    }
    assert set(out) == expect_docs
    for did in expect_docs:
        dl = sum(tf[did].values())
        ss = []
        for w, dfw in qterms:
            f = tf[did][w]
            if f == 0:
                ss.append(0.0)
                continue
            idf_fp = ((2 * (n - dfw) + 1) * 1000000) // (2 * dfw + 1)
            ss.append(float(idf_fp * 22 * f * t) / float(10 * f * t + 3 * t + 9 * dl * n))
        r = out[did]
        assert (r.s1, r.s2, r.s3) == tuple(ss)
        assert r.bm25 == (ss[0] + ss[1]) + ss[2]


def test_pii_redaction_leaves_no_residual_matches(spark):
    """After redaction the corpus must contain ZERO residual
    email/IP matches (the invariant the hash parity can't state),
    and the planted counts must match the residue-class arithmetic."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = _q("pii_redact_stats")(spark, SF_SMALL).collect()
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    assert sum(r.emails_redacted for r in out) == sum(
        1 for i in ids if i % 3 != 0
    )
    assert sum(r.ips_redacted for r in out) == sum(
        1 for i in ids if i % 2 == 0
    )
    email_pat = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip_pat = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
    aug = docs.select(
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 != 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail-"),
                    F.col("source"),
                    F.lit(".com"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".0."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                ),
            ).otherwise(""),
        ).alias("t")
    )
    residual = aug.select(
        F.regexp_replace(
            F.regexp_replace("t", email_pat, "<EMAIL>"), ip_pat, "<IP>"
        ).alias("rt")
    ).where(
        F.col("rt").rlike(email_pat) | F.col("rt").rlike(ip_pat)
    )
    assert residual.count() == 0


def test_bpe_merges_match_local_recompute(spark):
    """Pure-Python BPE (word-freq table, argmax pair with the same
    (freq desc, a asc, b asc) tie-break, left-to-right non-overlapping
    merge) must produce the identical 8-row merge table."""
    import re
    from collections import Counter

    out = [
        (r.round, r.pair, r.freq)
        for r in _q("bpe_merges")(spark, SF_SMALL).collect()
    ]
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    wc = Counter()
    for d in docs:
        wc.update(w for w in re.split("[^A-Za-z]+", d.text) if w)
    syms = {tuple(w) + ("_",): c for w, c in wc.items()}
    expect = []
    for rnd in range(1, 9):
        pc = Counter()
        for s, c in syms.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (a, b), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rnd, f"{a}+{b}", f))
        merged = {}
        for s, c in syms.items():
            acc = []
            for x in s:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            t = tuple(acc)
            merged[t] = merged.get(t, 0) + c
        syms = merged
    assert sorted(out) == expect


def test_leakage_safe_split_has_no_cross_split_pairs(spark):
    """THE invariant: no near-dup (LSH) pair may span the train/val
    boundary, and the split ratio must be roughly 90/10."""
    from distributed_mapreduce_p2p_spark.operators import dedup as DD

    out = _q("leakage_safe_split")(spark, SF_SMALL)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    pairs = DD.minhash_lsh_pairs(docs, 0.5).select("doc_a", "doc_b")
    sp = out.select("doc_id", "split")
    crossing = (
        pairs.join(sp.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("split", "split_a")
        .join(sp.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .where(F.col("split_a") != F.col("split"))
    )
    assert crossing.count() == 0
    counts = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    total = sum(counts.values())
    assert total == docs.count()
    assert 0.75 <= counts.get("train", 0) / total <= 0.99
