"""Property-based tests (hypothesis) for the pure/deterministic
operator logic — the reference has zero automated tests (SURVEY.md
§5); randomized properties harden ours beyond fixed fixtures."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    start=st.integers(min_value=-100, max_value=10**6),
    length=st.integers(min_value=0, max_value=10**4),
    n=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_split_range_properties(start, length, n):
    """H2 (AssignData): contiguity, coverage, bounded count, balance
    within 1."""
    from distributed_mapreduce_p2p_spark.operators.relational import split_range

    end = start + length - 1
    parts = split_range(start, end, n)
    if length == 0:
        assert parts == []
        return
    assert 1 <= len(parts) <= min(n, length)
    # contiguous, covering, in order
    cur = start
    for s, e in parts:
        assert s == cur and e >= s
        cur = e + 1
    assert cur == end + 1
    sizes = [e - s + 1 for s, e in parts]
    assert max(sizes) - min(sizes) <= 1


def test_detect_gaps_boundary_stitch_deterministic(spark):
    """The r7 two-phase lag must stitch gaps ACROSS range-partition
    boundaries: with ids 1..9000 minus every 3rd id, every one of the
    n_parts partitions both opens and closes on a gap, so every
    partition's first row depends on the broadcast prev-partition max
    (not its local lag). Also exercises a run of missing ids at the
    very start (1..10 absent)."""
    from distributed_mapreduce_p2p_spark.operators.relational import (
        detect_gaps,
    )

    ids = [i for i in range(11, 9001) if i % 3 != 0]
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = set()
    for r in detect_gaps(df, "id").collect():
        got |= set(range(r.gap_start, r.gap_end + 1))
    # gaps are reported within [1, max(present)] — a trailing run of
    # missing ids has no successor row to anchor it (CheckAndDump
    # semantics: the max id defines the known range)
    expected = set(range(1, max(ids) + 1)) - set(ids)
    assert got == expected


@given(
    ids=st.sets(st.integers(min_value=1, max_value=60), min_size=1, max_size=40)
)
@settings(max_examples=25, deadline=None)
def test_detect_gaps_matches_bruteforce(spark, ids):
    """J3: the window-lag gap detector must report exactly the
    missing integers in [1, max(ids)]."""
    from distributed_mapreduce_p2p_spark.operators.relational import detect_gaps

    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = set()
    for r in detect_gaps(df, "id").collect():
        got |= set(range(r.gap_start, r.gap_end + 1))
    expected = set(range(1, max(ids) + 1)) - ids
    assert got == expected


def _ed(a: str, b: str) -> int:
    """Reference Levenshtein DP."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@given(
    strings=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=8),
        min_size=2,
        max_size=8,
        unique=True,
    )
)
# 8 adversarial examples x 2 operators cost 45 s of the default suite
# (each example runs two Spark joins); the r11 budget gate keeps 2 by
# default and restores 8 under SPARK_GRAFT_FULL_SUITE=1 (round close).
@settings(
    max_examples=8 if os.environ.get("SPARK_GRAFT_FULL_SUITE") else 2,
    deadline=None,
)
def test_edjoin_variants_match_bruteforce_dp(spark, strings):
    """Both complete ed-join operators must emit EXACTLY the
    brute-force DP pair set on adversarial inputs: tiny alphabet
    (every gram collides), lengths 0..8 (short-string patch, empty
    strings, unequal lengths)."""
    from distributed_mapreduce_p2p_spark.operators.edjoin import (
        edit_distance_pairs,
        edit_distance_pairs_passjoin,
    )

    k = 2
    rows = [(i, s) for i, s in enumerate(strings)]
    expected = {
        (ia, ib, _ed(sa, sb))
        for ia, sa in rows
        for ib, sb in rows
        if ia < ib and _ed(sa, sb) <= k
    }
    df = spark.createDataFrame(rows, "key long, s string")
    for fn in (edit_distance_pairs, edit_distance_pairs_passjoin):
        got = {
            (r.key_a, r.key_b, r.dist)
            for r in fn(df, "key", "s", k=k).collect()
        }
        assert got == expected, (fn.__name__, sorted(got), sorted(expected))


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None)
def test_star_cc_matches_union_find(spark, edges):
    """Alternating-star connected components must equal a reference
    union-find on arbitrary small graphs (self-loops, duplicates,
    multi-component, chains)."""
    from distributed_mapreduce_p2p_spark.operators.dedup import (
        connected_components,
    )

    nodes = sorted({n for e in edges for n in e} | {0, 15})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    expected = {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}

    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    edf = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    labels, _ = connected_components(edf, ndf)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got == expected


@given(
    left=st.dictionaries(
        st.integers(0, 10), st.integers(-100, 100), max_size=8
    ),
    right=st.dictionaries(
        st.integers(0, 10), st.integers(-100, 100), max_size=8
    ),
)
@settings(max_examples=20, deadline=None)
def test_membership_merge_matches_dict_semantics(spark, left, right):
    """J2 (gossip MergeLeft): merged[k] = max(left.get(k), right.get(k))
    over present values."""
    from distributed_mapreduce_p2p_spark.operators.relational import membership_merge

    if not left and not right:
        return
    ldf = spark.createDataFrame(
        [(k, v) for k, v in left.items()] or [(None, None)], "k int, hb int"
    ).where("k is not null")
    rdf = spark.createDataFrame(
        [(k, v) for k, v in right.items()] or [(None, None)], "k int, hb int"
    ).where("k is not null")
    out = {
        r.k: r.hb for r in membership_merge(ldf, rdf, "k", "hb").collect()
    }
    expected = {
        k: max(
            [v for v in (left.get(k), right.get(k)) if v is not None]
        )
        for k in set(left) | set(right)
    }
    assert out == expected


@settings(max_examples=60, deadline=None)
@given(
    toks=st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", exclude_characters=" \x00"
            ),
            min_size=0,
            max_size=12,
        ),
        min_size=0,
        max_size=40,
    ),
    chunk=st.integers(min_value=1, max_value=37),
)
def test_aligned_range_covers_every_byte_once(tmp_path_factory, toks, chunk):
    """Pure-python property for the S2 boundary rule: for ANY corpus
    and ANY chunk size, concatenating the per-chunk payloads plus one
    delimiter between non-empty neighbors reproduces the token
    multiset exactly — no split tokens, no duplicated or lost bytes
    (mapreduce/worker.go:37-89 semantics)."""
    from collections import Counter

    from distributed_mapreduce_p2p_spark.sources.io import (
        read_aligned_range,
    )

    corpus = " ".join(toks)
    d = tmp_path_factory.mktemp("chunks")
    p = d / "c.txt"
    p.write_bytes(corpus.encode("utf-8"))
    size = len(corpus.encode("utf-8"))

    got: Counter = Counter()
    for s in range(0, max(size, 1), chunk):
        payload = read_aligned_range(str(p), s, min(s + chunk, size))
        got.update(t for t in payload.decode("utf-8").split(" ") if t)
    want = Counter(t for t in corpus.split(" ") if t)
    assert got == want


@given(
    keys=st.sets(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=1,
        max_size=60,
    ),
    n_parts=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=12, deadline=None)
def test_global_rank_scalable_is_the_sorted_index(spark, keys, n_parts):
    """The partition-offset global rank must equal the 1-based sorted
    index for ANY unique key set and ANY range-partition count —
    including n_parts > number of rows (empty partitions)."""
    from distributed_mapreduce_p2p_spark.operators.relational import (
        global_rank_scalable,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k: long")
    out = global_rank_scalable(df, ["k"], out="rk", n_parts=n_parts)
    got = {r.k: r.rk for r in out.collect()}
    expect = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == expect


@given(
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # key
            st.integers(min_value=0, max_value=60),     # start
            st.integers(min_value=1, max_value=25),     # length
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=20, deadline=None)
def test_merge_islands_matches_sweep_line(spark, intervals):
    """Gaps-and-islands union == pure-Python sweep line, for random
    overlapping/touching/nested intervals of VARIABLE length (the
    registry query only exercises the fixed-30-day case)."""
    from distributed_mapreduce_p2p_spark.operators.relational import (
        merge_islands,
    )

    rows = [(k, s, s + ln) for k, s, ln in intervals]
    df = spark.createDataFrame(rows, "key long, s long, e long")
    got = {
        r.key: (r.n_islands, r.covered)
        for r in merge_islands(df, "key", "s", "e").collect()
    }
    expect = {}
    per = {}
    for k, s, e in rows:
        per.setdefault(k, []).append((s, e))
    for k, ivs in per.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expect[k] = (len(islands), sum(e - s for s, e in islands))
    assert got == expect


@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=99),
        max_size=15,
    ),
    changes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.sampled_from(["D", "U"]),
            st.one_of(
                st.none(), st.integers(min_value=100, max_value=199)
            ),
        ),
        max_size=15,
        unique_by=lambda c: c[0],
    ),
)
@settings(max_examples=20, deadline=None)
def test_apply_cdc_matches_dict_apply(spark, base, changes):
    """MERGE semantics == dict apply: deletes remove, upserts
    replace-or-insert (INCLUDING updates to NULL — a change row's
    value wins even when None), untouched base rows pass through."""
    from distributed_mapreduce_p2p_spark.operators.relational import (
        apply_cdc,
    )

    bdf = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)],
        "k long, v long",
    ).where("k is not null")
    cdf = spark.createDataFrame(
        changes or [(None, None, None)], "k long, op string, v long"
    ).where("k is not null")
    got = {r.k: r.v for r in apply_cdc(bdf, cdf).collect()}
    state = dict(base)
    for k, op, v in changes:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    ),
    merges=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "_"]),
            st.sampled_from(["a", "b", "c", "_"]),
        ),
        max_size=4,
    ),
)
@settings(max_examples=15, deadline=None)
def test_bpe_token_counts_match_python_fold(spark, words, merges):
    """The JVM fold chain applying arbitrary merge sequences must
    match the pure-Python left-to-right non-overlapping fold for
    every distinct word (includes pathological self-merges like
    (a, a) over 'aaaa')."""
    from distributed_mapreduce_p2p_spark.operators.text import (
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(" ".join(words),)], "text string"
    )
    got = {
        r.word: r.n_tokens
        for r in bpe_token_counts(docs, merges).collect()
    }
    expect = {}
    for w in set(words):
        acc = []
        for x in list(w) + ["_"]:
            acc.append(x)
        for a, b in merges:
            res = []
            for x in acc:
                if res and res[-1] == a and x == b:
                    res[-1] = a + b
                else:
                    res.append(x)
            acc = res
        expect[w] = len(acc)
    assert got == expect


@given(
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=1, max_value=30),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=25, deadline=None)
def test_max_concurrent_matches_bruteforce_sweep(spark, intervals):
    """Sweep-line peak concurrency equals a brute-force per-point
    count over half-open [s, e) intervals, per key — including
    duplicate endpoints, fully-nested and touching intervals."""
    from distributed_mapreduce_p2p_spark.operators.relational import (
        max_concurrent,
    )

    rows = [(f"k{k}", s, s + d) for s, d, k in intervals]
    df = spark.createDataFrame(rows, ["key", "s", "e"])
    got = {
        r.key: (r.max_concurrent, r.n_intervals)
        for r in max_concurrent(df, "key", "s", "e").collect()
    }
    from collections import defaultdict

    by_k = defaultdict(list)
    for k, s, e in rows:
        by_k[k].append((s, e))
    for k, iv in by_k.items():
        brute = max(
            sum(1 for s, e in iv if s <= t < e)
            for t in {s for s, _ in iv}
        )
        assert got[k] == (brute, len(iv))


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=60,
    ),
    n_parts=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=25, deadline=None)
def test_global_cumsum_is_sorted_prefix_sum(spark, vals, n_parts):
    """The two-phase partition-offset cumulative sum equals the
    Python prefix sum over the totally-ordered rows for ANY
    partition count, including negative values and duplicates
    (tie-broken by the unique id)."""
    from distributed_mapreduce_p2p_spark.operators.relational import (
        global_cumsum,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = global_cumsum(df, "v", ["v", "id"], n_parts=n_parts).collect()
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    prefix = {}
    run = 0
    for i, v in ordered:
        run += v
        prefix[i] = run
    assert len(out) == len(rows)
    for r in out:
        assert r._cum == prefix[r.id]
        assert r._total == sum(vals)
