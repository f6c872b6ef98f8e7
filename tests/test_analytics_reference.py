"""Pure-Python reference checks for the round-2 analytics queries.

The DuckDB oracle is an independent *engine*, but its SQL mirrors the
Spark formulation; these tests add a third, algorithmically naive
implementation on tiny in-memory data so a shared formulation error
in both mirrors can't survive. Registry functions are exercised
through a staged parquet dir with the same table names."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from tests.conftest import SF_SMALL


def _stage(spark, tmp_path, name, df):
    path = tmp_path / name
    df.write.parquet(str(path.with_suffix(".parquet")))
    return str(tmp_path)


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """A tiny documents table with controlled vocabulary."""
    tmp = tmp_path_factory.mktemp("tiny_sf")
    rows = [
        (1, "alpha beta beta gamma", "en", "s", 21),
        (2, "alpha alpha delta", "en", "s", 17),
        (3, "beta gamma gamma gamma epsilon", "en", "s", 30),
        (4, "delta epsilon", "en", "s", 13),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


def test_tfidf_matches_python_reference(spark, docs_dir):
    from distributed_mapreduce_p2p_spark import registry

    got = {
        (r.doc_id, r.word): (r.tf, r.df, r.score, r.rk)
        for r in registry.QUERIES["tfidf_top_terms"](spark, docs_dir).collect()
    }
    texts = {
        1: "alpha beta beta gamma",
        2: "alpha alpha delta",
        3: "beta gamma gamma gamma epsilon",
        4: "delta epsilon",
    }
    n_docs = len(texts)
    tf = {d: Counter(t.split()) for d, t in texts.items()}
    df_ = Counter(w for c in tf.values() for w in c)
    want = {}
    for d, c in tf.items():
        scored = sorted(
            (
                (w, n, df_[w], n * ((n_docs * 1000000) // df_[w]))
                for w, n in c.items()
            ),
            key=lambda t: (-t[3], t[0]),
        )
        for rk, (w, n, dfw, sc) in enumerate(scored[:3], 1):
            want[(d, w)] = (n, dfw, sc, rk)
    assert got == want


def test_transition_matrix_probabilities_sum_to_one(spark):
    from distributed_mapreduce_p2p_spark import registry

    rows = registry.QUERIES["event_transition_matrix"](
        spark, SF_SMALL
    ).collect()
    by_src = defaultdict(float)
    for r in rows:
        assert r.prob == pytest.approx(r.n / sum(x.n for x in rows if x.src == r.src))
        by_src[r.src] += r.prob
    for src, total in by_src.items():
        assert total == pytest.approx(1.0), src


def test_sliding_distinct_brute_force(spark):
    import duckdb

    from distributed_mapreduce_p2p_spark import registry

    got = {
        r.window_start: r.n_users
        for r in registry.QUERIES["sliding_distinct_users"](
            spark, SF_SMALL
        ).collect()
    }
    con = duckdb.connect()
    raw = con.sql(
        f"SELECT user_id, date_trunc('day', ts) AS d"
        f" FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    days = sorted({d for _, d in raw})
    for ws_str, n in got.items():
        # window [ws, ws+7d) expressed through the explode rule:
        # an event at day d lands in windows d-6 .. d.
        import datetime as dt

        ws = dt.datetime.strptime(ws_str, "%Y-%m-%d")
        ws = ws.date() if raw and not isinstance(raw[0][1], dt.datetime) else ws
        users = {
            u
            for u, d in raw
            if ws <= d <= ws + dt.timedelta(days=6)
        }
        assert n == len(users), ws_str
    # every day that any event maps to appears as a window start
    import datetime as dt

    expect_ws = {
        (d - dt.timedelta(days=k)).strftime("%Y-%m-%d")
        for d in days
        for k in range(7)
    }
    assert set(got) == expect_ws


def test_cosine_topk_matches_brute_force(spark):
    from distributed_mapreduce_p2p_spark import registry

    got = [
        (r.src, r.dst, r.co, r.cosine, r.rk)
        for r in registry.QUERIES["supplier_cosine_topk"](
            spark, SF_SMALL
        ).collect()
    ]
    import duckdb

    con = duckdb.connect()
    inc = con.sql(
        f"SELECT DISTINCT l_suppkey, l_partkey FROM '{SF_SMALL}/lineitem.parquet'"
    ).fetchall()
    parts = defaultdict(set)
    deg = Counter()
    for s, p in inc:
        parts[p].add(s)
        deg[s] += 1
    co = Counter()
    for p, ss in parts.items():
        ss = sorted(ss)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                co[(a, b)] += 1
    sym = defaultdict(list)
    for (a, b), c in co.items():
        sym[a].append((b, c))
        sym[b].append((a, c))
    want = []
    for src, nbrs in sym.items():
        scored = sorted(
            (
                (dst, c, c / math.sqrt(deg[src] * deg[dst]))
                for dst, c in nbrs
            ),
            key=lambda t: (-t[2], t[0]),
        )
        for rk, (dst, c, cos) in enumerate(scored[:3], 1):
            want.append((src, dst, c, cos, rk))
    assert sorted(got) == sorted(want)


def test_cm_sketch_estimates_bound_true_counts(spark):
    from distributed_mapreduce_p2p_spark import registry

    rows = registry.QUERIES["cm_sketch_heavy_hitters"](
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 10
    for r in rows:
        # count-min never underestimates
        assert r.est_cnt >= r.cnt, r
