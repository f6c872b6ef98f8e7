"""Structural/exact-recompute tests for the round-5 queries —
invariants and independent pure-Python recomputes on top of the
DuckDB hash parity (which tests/test_oracle_parity.py already runs
for every one of these)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _q(name):
    from distributed_mapreduce_p2p_spark import registry

    return registry.QUERIES[name]


def test_merge_upsert_matches_local_recompute(spark):
    """Apply the same deterministic change batch in pure Python
    (decimal cents, no floats) and compare per-status aggregates."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    state = {}
    for r in orders:
        cents = round(r.o_totalprice * 100)
        if r.o_orderkey % 7 != 0:
            state[r.o_orderkey] = (r.o_orderstatus, cents)
    for r in orders:
        if r.o_orderkey % 3 != 0:
            continue
        if r.o_orderkey % 9 == 0:
            state.pop(r.o_orderkey, None)
        else:
            state[r.o_orderkey] = (
                r.o_orderstatus,
                round(r.o_totalprice * 100) + 100,
            )
    expect = {}
    for k, (st, cents) in state.items():
        n, tot, ks = expect.get(st, (0, 0, 0))
        expect[st] = (n + 1, tot + cents, ks + k)
    got = {
        r.o_orderstatus: (r.n, round(r.total_price * 100), r.key_checksum)
        for r in _q("merge_upsert_batch")(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_interval_islands_match_local_recompute(spark):
    """Sweep-line interval union per customer in pure Python."""
    import datetime

    epoch = datetime.date(1990, 1, 1)
    rows = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_custkey", "o_orderdate")
        .collect()
    )
    per_cust = {}
    for r in rows:
        d = r.o_orderdate.date() if hasattr(r.o_orderdate, "date") else r.o_orderdate
        s = (d - epoch).days
        per_cust.setdefault(r.o_custkey, []).append((s, s + 30))
    expect = {}
    for cust, ivs in per_cust.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expect[cust] = (len(islands), sum(e - s for s, e in islands))
    got = {
        r.o_custkey: (r.n_islands, r.covered_days)
        for r in _q("interval_merge_islands")(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_time_weighted_avg_matches_local_recompute(spark):
    """Exact integer cents*µs recompute with the identical final
    float ops — results must be bit-equal, not just close."""
    rows = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    per_type = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
    expect = {}
    for et, rs in per_type.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        s = d = 0
        for a, b in zip(rs, rs[1:]):
            dur = round((b.ts - a.ts).total_seconds() * 1_000_000)
            s += round(a.value * 100) * dur
            d += dur
        expect[et] = ((float(s) / float(d)) / 100.0, d)
    got = {
        r.event_type: (r.twap, r.total_us)
        for r in _q("time_weighted_avg")(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_ngram_lm_table_shape(spark):
    """rnk is 1..3 per context, counts are non-increasing within a
    context, and every (w1, w2) count matches an independent Spark
    bigram count."""
    out = _q("ngram_lm_next_token")(spark, SF_SMALL)
    rows = out.collect()
    per_ctx = {}
    for r in rows:
        per_ctx.setdefault(r.w1, []).append((r.rnk, r.cnt, r.w2))
    for w1, lst in per_ctx.items():
        lst.sort()
        assert [r for r, _, _ in lst] == list(range(1, len(lst) + 1))
        cnts = [c for _, c, _ in lst]
        assert cnts == sorted(cnts, reverse=True)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    import re
    from collections import Counter

    bg = Counter()
    for d in docs:
        ws = [w for w in re.split("[^a-z]+", d.text.lower()) if w]
        bg.update(zip(ws, ws[1:]))
    for r in rows:
        assert bg[(r.w1, r.w2)] == r.cnt


def test_tokenizer_apply_totals(spark):
    """Word totals must equal the corpus word count per source, and
    BPE can only shorten: n_words <= n_tokens <= letters+1 per word
    implies per-source bounds."""
    out = {
        r.source: (r.n_words, r.n_tokens)
        for r in _q("tokenizer_apply_bpe")(spark, SF_SMALL).collect()
    }
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    words = docs.select(
        "source", F.explode(F.split("text", "[^A-Za-z]+")).alias("w")
    ).where(F.col("w") != "")
    expect_words = {
        r.source: r.n
        for r in words.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    max_tokens = {
        r.source: r.m
        for r in words.groupBy("source")
        .agg(F.sum(F.length("w") + 1).alias("m"))
        .collect()
    }
    assert set(out) == set(expect_words)
    for src, (nw, nt) in out.items():
        assert nw == expect_words[src]
        assert nw <= nt <= max_tokens[src]


def test_equidepth_bins_are_equal_population(spark):
    out = _q("equidepth_bins")(spark, SF_SMALL).collect()
    total = spark.read.parquet(f"{SF_SMALL}/orders.parquet").count()
    assert sorted(r.bin for r in out) == list(range(1, 11))
    assert sum(r.n for r in out) == total
    sizes = [r.n for r in out]
    assert max(sizes) - min(sizes) <= 1
    by_bin = sorted(out, key=lambda r: r.bin)
    for a, b in zip(by_bin, by_bin[1:]):
        assert a.hi <= b.lo
        assert a.lo <= a.hi


def test_audio_resample_round_trip_one_asset(spark):
    """Cross-check one asset against a direct stdlib decode of the
    generated WAV, decimated in numpy."""
    import io as _io
    import wave

    import numpy as np

    from distributed_mapreduce_p2p_spark.operators import multimodal as MM

    out = {r.asset_id: r for r in _q("audio_resample_checksum")(spark, SF_SMALL).collect()}
    aid = sorted(out)[0]
    rate, ch, ns = 8000 + (aid % 5) * 1000, 1 + aid % 2, 100 + aid % 400
    payload = MM.encode_wav(rate, ch, ns, aid)
    with wave.open(_io.BytesIO(payload), "rb") as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    kept = pcm.reshape(ns, ch)[::2].astype(np.int64)
    r = out[aid]
    assert (r.in_rate, r.out_rate) == (rate, rate // 2)
    assert (r.n_in, r.n_out) == (ns, math.ceil(ns / 2))
    assert r.sample_sum == int(kept.sum())
    assert r.peak == int(np.abs(kept).max())


def test_image_channel_stats_one_asset(spark):
    """Cross-check one asset against a direct decode of the real BMP."""
    import numpy as np

    from distributed_mapreduce_p2p_spark.operators import multimodal as MM

    out = {r.asset_id: r for r in _q("image_channel_stats")(spark, SF_SMALL).collect()}
    aid = sorted(out)[0]
    w, h = 4 + aid % 29, 3 + aid % 17
    px, ww, hh = MM.bmp_pixels(MM.encode_bmp(w, h, aid))
    arr = px.astype(np.int64)
    r = out[aid]
    assert (r.width, r.height) == (w, h) == (ww, hh)
    assert r.c0_sum == int(arr[:, 0::3].sum())
    assert r.c1_sum == int(arr[:, 1::3].sum())
    assert r.c2_sum == int(arr[:, 2::3].sum())


def test_trade_components_consistent_with_edges(spark):
    """Both endpoints of every trade edge share a component; the
    component id is the component's minimum member; label set matches
    a pure-Python union-find over the same edges."""
    labels = {
        r.n_nationkey: r.component_id
        for r in _q("trade_graph_components")(spark, SF_SMALL).collect()
    }
    tri = _q("trade_graph_triangles")(spark, SF_SMALL).collect()[0]
    # recompute edges with the same rule, in Python, from the trade matrix
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    c = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    s = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    trade = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("c_nationkey", "s_nationkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
            ).alias("vol")
        )
        .collect()
    )
    und = {}
    for r in trade:
        if r.c_nationkey == r.s_nationkey:
            continue
        k = (min(r.c_nationkey, r.s_nationkey), max(r.c_nationkey, r.s_nationkey))
        und[k] = und.get(k, 0) + r.vol
    total = sum(und.values())
    n_pairs = len(und)
    edges = [k for k, v in und.items() if float(v) * n_pairs > float(total)]
    assert len(edges) == tri.n_edges
    parent = {n: n for n in labels}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: min(m for m in labels if find(m) == find(n)) for n in labels}
    assert labels == expect


def test_kmeans_assignment_properties(spark):
    """Every cluster id is one of the 16 seeds, members sum to the
    table size, and each vector really is nearest (cosine) to its
    assigned centroid — checked in numpy with the same fold order."""
    import numpy as np

    out = _q("kmeans_assign_iter")(spark, SF_SMALL).collect()
    clusters = {r.cluster_id for r in out}
    assert clusters <= set(range(16))
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    n_vec = len(emb)
    # n_members is repeated per dim; dim count must be constant
    dims = {r.dim for r in out}
    assert dims == set(range(1, 65))
    total = sum(r.n_members for r in out if r.dim == 1)
    assert total == n_vec
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    cents = {i: vecs[i] for i in range(16)}

    def cos(a, b):
        return float(a @ b) / (
            (float(a @ a) ** 0.5) * (float(b @ b) ** 0.5)
        )

    # spot-check 25 vectors' nearest centroid against member counts:
    # recompute the full assignment and compare per-cluster counts
    counts = {}
    for vid, v in vecs.items():
        best = max(
            ((cos(v, c), -cid) for cid, c in cents.items()),
        )
        cid = -best[1]
        counts[cid] = counts.get(cid, 0) + 1
    got = {r.cluster_id: r.n_members for r in out if r.dim == 1}
    assert got == counts


def test_event_paths_match_local_recompute(spark):
    from collections import Counter

    rows = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    paths = Counter()
    for rs in per_user.values():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        ets = [r.event_type for r in rs]
        for i in range(len(ets) - 2):
            paths[">".join(ets[i : i + 3])] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.path, r.n)
        for r in sorted(
            _q("event_path_topk")(spark, SF_SMALL).collect(),
            key=lambda r: r.rnk,
        )
    ]
    assert got == expect


def test_hapax_ratio_bounds_and_counts(spark):
    import re
    from collections import Counter

    out = {
        r.source: (r.n_distinct, r.n_hapax)
        for r in _q("hapax_ratio_per_source")(spark, SF_SMALL).collect()
    }
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    per_src = {}
    for d in docs:
        c = per_src.setdefault(d.source, Counter())
        c.update(w for w in re.split("[^a-z]+", d.text.lower()) if w)
    expect = {
        s: (len(c), sum(1 for f in c.values() if f == 1))
        for s, c in per_src.items()
    }
    assert out == expect


def test_trimmed_mean_drops_extremes(spark):
    """The trimmed mean must sit strictly inside [min, max] and be
    computed over exactly the middle-8-decile population."""
    out = _q("trimmed_mean_group")(spark, SF_SMALL).collect()
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    from pyspark.sql import functions as SF

    stats = {
        r.pri: r
        for r in orders.groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(
            SF.count(SF.lit(1)).alias("n"),
            SF.min("o_totalprice").alias("lo"),
            SF.max("o_totalprice").alias("hi"),
            SF.avg("o_totalprice").alias("mean"),
        )
        .collect()
    }
    for r in out:
        s = stats[r.o_orderpriority]
        assert s.lo < r.trimmed_mean < s.hi
        # ntile leaves ~80% after dropping bins 1 and 10
        assert abs(r.n_kept - 0.8 * s.n) <= 2


def test_table_profile_matches_direct_counts(spark):
    out = {
        r.col: (r.n_nulls, r.n_distinct)
        for r in _q("table_profile")(spark, SF_SMALL).collect()
    }
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    for c in orders.columns:
        nn = orders.where(F.col(c).isNull()).count()
        nd = orders.select(c).distinct().count()
        assert out[c] == (nn, nd), c


def test_json_quarantine_partitions_the_feed(spark):
    """The three classes partition the events exactly, and the id
    checksums reconstruct the total."""
    out = {r.status: r for r in _q("json_quarantine_audit")(spark, SF_SMALL).collect()}
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    total = ev.count()
    id_sum = ev.agg(F.sum("event_id")).collect()[0][0]
    assert set(out) == {"ok", "parse_fail", "missing_field"}
    assert sum(r.n for r in out.values()) == total
    assert sum(r.id_checksum for r in out.values()) == id_sum
    # the carve rates: ~1/13 parse_fail, ~(1/11 of the rest) missing
    assert out["parse_fail"].n > 0 and out["missing_field"].n > 0
    assert out["ok"].k_sum > 0
    assert out["parse_fail"].k_sum == 0 and out["missing_field"].k_sum == 0


def test_pointintime_join_is_lossless_and_lagged(spark):
    """Every event appears exactly once (left join against disjoint
    intervals), and an event whose user had no state an hour earlier
    lands in NONE."""
    out = _q("scd2_pointintime_join")(spark, SF_SMALL).collect()
    total = spark.read.parquet(f"{SF_SMALL}/events.parquet").count()
    assert sum(r.n for r in out) == total
    assert any(r.state_1h_ago == "NONE" for r in out)
    types = {r.event_type for r in out}
    states = {r.state_1h_ago for r in out} - {"NONE"}
    assert states <= types


def test_norm_outliers_are_the_rank_extremes(spark):
    import numpy as np

    out = _q("embedding_norm_outliers")(spark, SF_SMALL).collect()
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    norms = {}
    for r in emb:
        v = np.array(r.embedding, dtype=np.float64)
        # same left-to-right fold as the shared _COSINE dot
        acc = 0.0
        for x in r.embedding:
            acc = acc + float(x) * float(x)
        norms[r.vec_id] = acc
    n = len(norms)
    ranked = sorted(norms.items(), key=lambda kv: (kv[1], kv[0]))
    lows = {vid for i, (vid, _) in enumerate(ranked, 1) if i * 100 <= n}
    highs = {vid for i, (vid, _) in enumerate(ranked, 1) if i * 100 > n * 99}
    got_low = {r.vec_id for r in out if r.tag == "low"}
    got_high = {r.vec_id for r in out if r.tag == "high"}
    assert got_low == lows and got_high == highs


def test_cumulative_distinct_users_totals(spark):
    out = sorted(
        _q("cumulative_distinct_users")(spark, SF_SMALL).collect(),
        key=lambda r: r.day,
    )
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert out[-1].cumulative_users == n_users
    run = 0
    for r in out:
        run += r.new_users
        assert r.cumulative_users == run


def test_token_budget_sample_semantics(spark):
    """Each source's kept set must (a) follow the deterministic hash
    order, (b) stop at the first doc crossing the 2000-token budget."""
    import hashlib
    import re

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    per_src = {}
    for d in docs:
        ntok = len([w for w in re.split("[^A-Za-z]+", d.text) if w])
        per_src.setdefault(d.source, []).append(
            (hashlib.md5(str(d.doc_id).encode()).hexdigest(), d.doc_id, ntok)
        )
    expect = {}
    for src, lst in per_src.items():
        lst.sort()
        cum = n = tok = chk = 0
        for _, did, ntok in lst:
            if cum >= 2000:
                break
            cum += ntok
            n += 1
            tok += ntok
            chk += did
        expect[src] = (n, tok, chk)
    got = {
        r.source: (r.n_docs, r.tokens_kept, r.doc_checksum)
        for r in _q("token_budget_sample")(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_fm_windowed_cells_merge_to_global(spark):
    """Mergeability: pairwise-MAX of the per-day cells must equal the
    global sketch's cells (recomputed via the same hash)."""
    from pyspark.sql import functions as SF

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    hashed = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr(
            "cast(conv(substring(md5(concat('fm:', cast(user_id as string))), 1, 10),"
            " 16, 10) as bigint)"
        ).alias("h"),
    )
    per_day_cells = (
        hashed.where(F.expr("h div 64 <> 0"))
        .groupBy("day", F.expr("h % 64").alias("bucket"))
        .agg(F.expr("max(cast(log2((h div 64) & (-(h div 64))) as bigint))").alias("mtz"))
    )
    merged = (
        per_day_cells.groupBy("bucket").agg(SF.max("mtz").alias("mtz"))
    )
    global_cells = (
        hashed.where(F.expr("h div 64 <> 0"))
        .groupBy(F.expr("h % 64").alias("bucket"))
        .agg(F.expr("max(cast(log2((h div 64) & (-(h div 64))) as bigint))").alias("mtz"))
    )
    a = {r.bucket: r.mtz for r in merged.collect()}
    b = {r.bucket: r.mtz for r in global_cells.collect()}
    assert a == b
    # and the query's per-day sums are consistent with its cells
    out = _q("fm_sketch_windowed")(spark, SF_SMALL).collect()
    assert all(r.n_buckets <= 64 and r.sum_max_tz >= 0 for r in out)


def test_mad_by_group_matches_statistics_median(spark):
    """Low-median recompute in pure Python over exact cents."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    per = {}
    for r in orders:
        per.setdefault(r.o_orderpriority, []).append(round(r.o_totalprice * 100))
    expect = {}
    for pri, cs in per.items():
        cs.sort()
        med = cs[(len(cs) + 1) // 2 - 1]
        devs = sorted(abs(c - med) for c in cs)
        mad = devs[(len(devs) + 1) // 2 - 1]
        expect[pri] = (med / 100.0, mad / 100.0)
    got = {
        r.o_orderpriority: (r.median_price, r.mad_price)
        for r in _q("mad_by_group")(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_dataset_card_consistency(spark):
    """Card invariants: docs sum to the corpus, dup counts match an
    md5 group recount, pass rate within [0,1], top_lang is a real
    mode."""
    from collections import Counter

    out = {r.source: r for r in _q("source_dataset_card")(spark, SF_SMALL).collect()}
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    assert sum(r.n_docs for r in out.values()) == len(docs)
    per_src_langs = {}
    per_src_texts = {}
    for d in docs:
        per_src_langs.setdefault(d.source, Counter())[d.lang] += 1
        per_src_texts.setdefault(d.source, []).append(d.text)
    for src, r in out.items():
        lc = per_src_langs[src]
        best = min(lc.items(), key=lambda kv: (-kv[1], kv[0]))
        assert r.top_lang == best[0]
        assert r.n_langs == len(lc)
        texts = per_src_texts[src]
        assert r.n_exact_dups == len(texts) - len(set(texts))
        assert 0.0 <= r.pass_rate <= 1.0
        assert r.quality_pass <= r.n_docs


def test_priority_mix_drift_bounds_and_recompute(spark):
    """TVD in [0,1]; exact integer numerator matches a Counter
    recompute."""
    from collections import Counter

    out = {r.o_year: r for r in _q("priority_mix_drift")(spark, SF_SMALL).collect()}
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    cell = Counter((r.o_orderdate.year, r.o_orderpriority) for r in orders)
    ny = Counter(y for (y, _p) in cell.elements())
    cp = Counter(p for (_y, p) in cell.elements())
    n = sum(cell.values())
    for y, r in out.items():
        dn = sum(
            abs(c * n - cp[p] * ny[y])
            for (yy, p), c in cell.items()
            if yy == y
        )
        assert r.drift_num == dn
        assert r.n_orders == ny[y]
        assert 0.0 <= r.tvd <= 1.0
