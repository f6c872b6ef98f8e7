"""Round-7 additions: pure-Python recomputes for the two new
curation queries (the repo convention: every registered query carries
an independent recompute of its math on real data, not just the
DuckDB oracle)."""

from __future__ import annotations

import math
import re

from tests.conftest import SF_SMALL


def _docs(spark):
    from distributed_mapreduce_p2p_spark.sources.io import read_table

    return read_table(spark, SF_SMALL, "documents")


def test_gopher_repetition_flags_recompute(spark):
    """Per-source flag counts must equal a pure-Python recompute of
    the Gopher repetition rules (top repeated-bigram char mass > 20%,
    duplicated-trigram char mass > 18%, cross-multiplied integers) —
    independent of both Spark and DuckDB."""
    from distributed_mapreduce_p2p_spark import registry

    rows = _docs(spark).select("doc_id", "source", "text").collect()
    expected: dict[str, list[int]] = {}
    for r in rows:
        w = [x for x in re.split(r"\s+", r.text) if x != ""]
        nchars = len(r.text)
        g2: dict[str, int] = {}
        for i in range(len(w) - 1):
            g = w[i] + " " + w[i + 1]
            g2[g] = g2.get(g, 0) + 1
        g3: dict[str, int] = {}
        for i in range(len(w) - 2):
            g = w[i] + " " + w[i + 1] + " " + w[i + 2]
            g3[g] = g3.get(g, 0) + 1
        top2 = max(
            (c * len(g) for g, c in g2.items() if c >= 2), default=0
        )
        dup3 = sum(c * len(g) for g, c in g3.items() if c >= 2)
        f2 = top2 * 5 > nchars
        f3 = dup3 * 100 > 18 * nchars
        agg = expected.setdefault(r.source, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += int(f2)
        agg[2] += int(f3)
        agg[3] += int(f2 and f3)

    got = {
        r.source: [r.n_docs, r.flag_top2, r.flag_dup3, r.flag_both]
        for r in registry.QUERIES["gopher_repetition_flags"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected
    # the corpus must actually exercise the rules somewhere, or the
    # test proves nothing
    assert sum(v[1] for v in expected.values()) > 0, (
        "no doc trips the top-bigram rule at this SF — weaken the "
        "fixture claim or pick another corpus"
    )


def test_temperature_mixture_recompute_and_invariants(spark):
    """sample_ppm must equal floor(sqrt(tokens)*1e6)-mass shares
    recomputed in pure Python (IEEE sqrt is correctly rounded, so
    math.sqrt == the engines' sqrt bit-for-bit below 2^53), and the
    alpha=0.5 temperature property must hold: every below-average
    source is upsampled (uplift > 1e6), every above-average source
    downsampled."""
    from distributed_mapreduce_p2p_spark import registry

    rows = registry.QUERIES["temperature_mixture"](
        spark, SF_SMALL
    ).collect()
    toks = {}
    for r in _docs(spark).select("source", "text").collect():
        n = len([x for x in re.split(r"\s+", r.text) if x != ""])
        toks[r.source] = toks.get(r.source, 0) + n
    isq = {s: math.floor(math.sqrt(t) * 1_000_000) for s, t in toks.items()}
    isq_sum = sum(isq.values())
    corpus = sum(toks.values())
    for r in rows:
        assert r.tokens == toks[r.source]
        assert r.sample_ppm == isq[r.source] * 1_000_000 // isq_sum
        assert r.share_ppm == toks[r.source] * 1_000_000 // corpus
    # sqrt temperature flattens the mixture: sample shares are
    # ordered WITH token shares but strictly compressed toward
    # uniform at the extremes
    n_src = len(rows)
    uniform = 1_000_000 // n_src
    for r in rows:
        if r.share_ppm < uniform - n_src:
            assert r.sample_ppm > r.share_ppm, r
        if r.share_ppm > uniform + n_src:
            assert r.sample_ppm < r.share_ppm, r
