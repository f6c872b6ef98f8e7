"""Property-based tests (hypothesis) for the pure/deterministic
operator logic — the reference has zero automated tests (SURVEY.md
§5); randomized properties harden ours beyond fixed fixtures."""

from __future__ import annotations

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
