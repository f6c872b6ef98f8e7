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


def test_dsir_importance_weights_recompute(spark):
    """The full DSIR-surrogate pipeline recomputed in pure Python on
    the same parquet (hashed-bigram buckets, add-one smoothing, the
    two-factor cross-multiplied ppm ratio, length-normalized doc
    weight, top-2 per source with the (weight DESC, doc_id) tie
    break) must match the Spark output row for row — independent of
    both Spark and DuckDB."""
    import hashlib

    from distributed_mapreduce_p2p_spark import registry

    rows = _docs(spark).select(
        "doc_id", "source", "lang", "text"
    ).collect()

    def bucket(bgm: str) -> int:
        h = hashlib.md5(("ds:" + bgm).encode()).hexdigest()[:10]
        return int(h, 16) % 128

    per_doc: dict[int, tuple[str, list[int]]] = {}
    ct = {b: 1 for b in range(128)}
    cr = {b: 1 for b in range(128)}
    seen = set()
    for r in rows:
        wl = [x for x in re.split(r"[^a-z]+", r.text.lower()) if x != ""]
        bs = [bucket(wl[i] + " " + wl[i + 1]) for i in range(len(wl) - 1)]
        if bs:
            per_doc[r.doc_id] = (r.source, bs)
        for b in bs:
            seen.add(b)
            cr[b] += 1
            if r.lang == "en":
                ct[b] += 1
    # only buckets that occur exist in the engines' feature table
    t_tot = sum(v for b, v in ct.items() if b in seen)
    r_tot = sum(v for b, v in cr.items() if b in seen)
    ratio = {
        b: (ct[b] * 1_000_000 // cr[b])
        * (r_tot * 1_000_000 // t_tot)
        // 1_000_000
        for b in seen
    }
    scored: dict[str, list[tuple[int, int, int]]] = {}
    for doc_id, (source, bs) in per_doc.items():
        score = sum(ratio[b] for b in bs)
        w = score // len(bs)
        scored.setdefault(source, []).append((-w, doc_id, len(bs)))
    expected = set()
    for source, lst in scored.items():
        for rn, (negw, doc_id, nb) in enumerate(sorted(lst)[:2], 1):
            expected.add((source, doc_id, nb, -negw, rn))

    got = {
        (r.source, r.doc_id, r.n_bigrams, r.weight_ppm, r.rn)
        for r in registry.QUERIES["dsir_importance_weights"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected
    # fixture must exercise the math: weights are positive and NOT
    # all equal (otherwise the ranking proves nothing)
    weights = {w for (_, _, _, w, _) in got}
    assert all(w > 0 for w in weights)
    assert len(weights) > 1, "degenerate fixture: all weights equal"


def test_ivf_recall_curve_recompute_and_monotonicity(spark):
    """The recall curve recomputed in pure Python (same left-to-right
    double fold — Python floats ARE IEEE doubles, so the fold
    sequence is bit-identical) must match Spark, and the curve must
    be monotone: more probes never lose recall and never scan fewer
    candidates."""
    from distributed_mapreduce_p2p_spark import registry
    from distributed_mapreduce_p2p_spark.sources.io import read_table

    import math as _m

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in read_table(spark, SF_SMALL, "embeddings").collect()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    n2 = {i: dot(v, v) for i, v in emb.items()}

    def sim(qi, ci):
        return dot(emb[qi], emb[ci]) / (_m.sqrt(n2[qi]) * _m.sqrt(n2[ci]))

    cents = [i for i in sorted(emb) if i < 16]
    # rank of every cell per vector (sim DESC, cent_id ASC)
    cell_rank = {
        v: sorted(cents, key=lambda c: (-sim(v, c), c)) for v in emb
    }
    home = {v: cell_rank[v][0] for v in emb}
    queries = [v for v in sorted(emb) if v < 8]
    exact = {
        q: set(
            sorted(emb, key=lambda c: (-sim(q, c), c))[:10]
        )
        for q in queries
    }
    expected = {}
    for np_ in (1, 2, 4):
        hits = 0
        n_cand = 0
        for q in queries:
            probed = set(cell_rank[q][:np_])
            cand = [c for c in emb if home[c] in probed]
            n_cand += len(cand)
            top = sorted(cand, key=lambda c: (-sim(q, c), c))[:10]
            hits += len(set(top) & exact[q])
        expected[np_] = (8, hits, hits * 1_000_000 // 80, n_cand)

    got = {
        r.nprobe: (r.n_queries, r.hits, r.recall_ppm, r.candidates)
        for r in registry.QUERIES["ivf_recall_curve"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected
    # monotone recall and cost in nprobe
    assert got[1][1] <= got[2][1] <= got[4][1]
    assert got[1][3] <= got[2][3] <= got[4][3]
    # every query finds itself (sim=1 in its own home cell)
    assert got[1][1] >= 8


def test_semdedup_prune_recompute(spark):
    """The SemDeDup census recomputed in pure Python (same
    left-to-right double fold, same nearest-centroid assignment,
    same keep-the-edge-example rule) must match Spark cell for
    cell; at least one vector must survive per cell (the cell's
    minimal (csim, vec_id) element can never lose a pair), and the
    fixture must actually drop something."""
    from distributed_mapreduce_p2p_spark import registry
    from distributed_mapreduce_p2p_spark.sources.io import read_table

    import math as _m

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in read_table(spark, SF_SMALL, "embeddings").collect()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    n2 = {i: dot(v, v) for i, v in emb.items()}

    def sim(qi, ci):
        return dot(emb[qi], emb[ci]) / (_m.sqrt(n2[qi]) * _m.sqrt(n2[ci]))

    # r9: the registered call site derives n_cells by the measured
    # sqrt rule (similarity.semdedup_cells); the recompute derives
    # it independently so a silent fallback to fixed 16 fails.
    k = max(16, _m.isqrt(len(emb)))
    assert k == 22, "fixture drifted: sqrt rule not exercised"
    cents = [i for i in sorted(emb) if i < k]
    home = {}
    csim = {}
    for v in emb:
        best = min(cents, key=lambda c: (-sim(v, c), c))
        home[v] = best
        csim[v] = sim(v, best)
    cells: dict[int, list[int]] = {}
    for v, cell in home.items():
        cells.setdefault(cell, []).append(v)
    expected = {}
    total_dropped = 0
    for cell, members in cells.items():
        dropped = set()
        ms = sorted(members)
        for i, va in enumerate(ms):
            for vb in ms[i + 1:]:
                if sim(va, vb) > 0.4:
                    loser = (
                        va
                        if (csim[va], va) > (csim[vb], vb)
                        else vb
                    )
                    dropped.add(loser)
        n = len(members)
        d = len(dropped)
        expected[cell] = (n, d, (n - d) * 1_000_000 // n)
        total_dropped += d

    got = {
        r.cell: (r.n_vecs, r.n_dropped, r.kept_ppm)
        for r in registry.QUERIES["semdedup_prune"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected
    assert all(d < n for _, (n, d, _) in expected.items())
    assert total_dropped > 0, "degenerate fixture: nothing dropped"
