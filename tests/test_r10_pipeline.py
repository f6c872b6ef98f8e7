"""Round-10 additions: independent pure-Python recomputes (the repo
convention: every new or changed plan carries a recompute of its math
on real data, not just the DuckDB oracle — the oracle could share a
misreading; Python can't share a Spark plan bug)."""

from __future__ import annotations

import math

from tests.conftest import SF_SMALL


def _load_emb(spark):
    from distributed_mapreduce_p2p_spark.sources.io import read_table

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
        return dot(emb[qi], emb[ci]) / (
            math.sqrt(n2[qi]) * math.sqrt(n2[ci])
        )

    return emb, sim


def _ann_routing(emb, sim, nprobe):
    """The two-level assignment recomputed from scratch: super set,
    centroid->super homes, per-vector top-nprobe super probes,
    candidate centroids, exact rank within candidates."""
    k = max(16, math.isqrt(len(emb)))
    ks = max(4, math.isqrt(k))
    cents = [i for i in sorted(emb) if i < k]
    sups = [i for i in sorted(emb) if i < ks]
    cent_home = {
        c: min(sups, key=lambda s: (-sim(c, s), s)) for c in cents
    }
    members: dict[int, list[int]] = {}
    for c, s in cent_home.items():
        members.setdefault(s, []).append(c)
    probes = {
        v: sorted(sups, key=lambda s: (-sim(v, s), s))[:nprobe]
        for v in emb
    }
    cand = {
        v: [c for s in probes[v] for c in members.get(s, [])]
        for v in emb
    }
    home, csim = {}, {}
    for v in emb:
        best = min(cand[v], key=lambda c: (-sim(v, c), c))
        home[v] = best
        csim[v] = sim(v, best)
    return k, ks, cand, home, csim


def test_semdedup_prune_ann_recompute(spark):
    """The ANN-assignment SemDeDup census recomputed in pure Python:
    same super-cell derivation (max(4, isqrt(n_cells))), same
    two-level routing with (sim DESC, id) tie-breaks, same
    keep-the-edge-example prune. Also pins that the twin is a REAL
    approximation on this fixture — at least one vector must land in
    a different cell than the exact assignment (otherwise the twin
    silently degenerates into the exact path and the recall query
    measures nothing)."""
    from distributed_mapreduce_p2p_spark import registry

    emb, sim = _load_emb(spark)
    k, ks, _, home, csim = _ann_routing(emb, sim, nprobe=2)
    assert (k, ks) == (22, 4), "fixture drifted: two-level rule idle"

    cells: dict[int, list[int]] = {}
    for v, cell in home.items():
        cells.setdefault(cell, []).append(v)
    expected = {}
    for cell, ms in cells.items():
        dropped = set()
        ms = sorted(ms)
        for i, va in enumerate(ms):
            for vb in ms[i + 1:]:
                if sim(va, vb) > 0.4:
                    dropped.add(
                        va if (csim[va], va) > (csim[vb], vb) else vb
                    )
        n, d = len(ms), len(dropped)
        expected[cell] = (n, d, (n - d) * 1_000_000 // n)

    got = {
        r.cell: (r.n_vecs, r.n_dropped, r.kept_ppm)
        for r in registry.QUERIES["semdedup_prune_ann"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected

    # the approximation must be live on the fixture: some vector's
    # ANN home differs from its exact nearest centroid
    cents = [i for i in sorted(emb) if i < k]
    exact = {
        v: min(cents, key=lambda c: (-sim(v, c), c)) for v in emb
    }
    assert any(home[v] != exact[v] for v in emb), (
        "ANN assignment degenerated into the exact assignment — "
        "the twin is not exercising its approximation"
    )


def test_semdedup_ann_assignment_recall_recompute(spark):
    """The assignment-agreement curve recomputed in pure Python for
    both probe depths; pins the cost contract (candidates scored
    strictly below the exact path's n x n_cells at every depth, and
    non-decreasing in depth) and the agreement contract (n_agree
    non-decreasing in depth — depth-2 candidates are a superset)."""
    from distributed_mapreduce_p2p_spark import registry

    emb, sim = _load_emb(spark)
    k = max(16, math.isqrt(len(emb)))
    cents = [i for i in sorted(emb) if i < k]
    exact = {
        v: min(cents, key=lambda c: (-sim(v, c), c)) for v in emb
    }
    expected = {}
    for p in (1, 2):
        _, _, cand, home, _ = _ann_routing(emb, sim, nprobe=p)
        n_agree = sum(1 for v in emb if home[v] == exact[v])
        n_cand = sum(len(cs) for cs in cand.values())
        expected[p] = (
            len(emb),
            n_agree,
            n_agree * 1_000_000 // len(emb),
            n_cand,
        )

    got = {
        r.nprobe: (r.n_vecs, r.n_agree, r.agree_ppm, r.candidates)
        for r in registry.QUERIES["semdedup_ann_assignment_recall"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected
    assert got[1][3] <= got[2][3] < len(emb) * k, (
        "cost contract broken: ANN must scan fewer sims than the "
        "exact n x n_cells assignment"
    )
    assert got[1][1] <= got[2][1], "agreement must grow with depth"
