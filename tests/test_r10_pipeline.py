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


def test_quantile_sketch_ranks_recompute(spark):
    """The deterministic rank-sample quantile sketch recomputed in
    pure Python: same cents cast, same (cents, o_orderkey) sort,
    same power-of-two stride via bit_length, same target-rank snap.
    Also pins the guarantee the docstring sells: every estimate's
    TRUE rank is within stride of the target rank."""
    from distributed_mapreduce_p2p_spark import registry
    from distributed_mapreduce_p2p_spark.sources.io import read_table

    rows = read_table(spark, SF_SMALL, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    ).collect()
    per_key: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        per_key.setdefault(r.o_orderpriority, []).append(
            (int(math.floor(r.o_totalprice * 100)), r.o_orderkey)
        )
    expected = {}
    for key, vals in per_key.items():
        vals.sort()
        n = len(vals)
        m = (n + 31) // 32
        stride = 1 if m <= 1 else 1 << (m - 1).bit_length()
        for q in (50, 90, 99):
            target = max(1, n * q // 100)
            kept_rank = (target - 1) // stride * stride + 1
            est = vals[kept_rank - 1][0]
            expected[(key, q)] = (n, stride, target, est)
            assert abs(kept_rank - target) < stride

    got = {
        (r.priority, r.q): (r.n, r.stride, r.target_rank, r.est_cents)
        for r in registry.QUERIES["quantile_sketch_ranks"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expected
    assert len(got) == 15 and any(s > 1 for _, s, _, _ in got.values())


def test_quantile_sketch_merge_bound():
    """The MERGEABILITY claim demonstrated end-to-end in pure
    Python (no Spark needed — this is the sketch algebra itself):
    split each key's stream into two arbitrary halves, build each
    half's systematic rank sample independently (own n, own stride,
    per-element weight = covered rank span), merge the two weighted
    samples, and answer quantiles from cumulative weight. The
    merged estimate's TRUE rank in the full sorted stream must be
    within stride1 + stride2 of the target — rank errors add under
    merge, the deterministic-mergeable-sketch guarantee."""
    import random

    rng = random.Random(10)
    vals = sorted(rng.randrange(10**6) for _ in range(3000))

    def sketch(stream):
        stream = sorted(stream)
        n = len(stream)
        m = (n + 31) // 32
        stride = 1 if m <= 1 else 1 << (m - 1).bit_length()
        out = []
        for i in range(0, n, stride):
            out.append((stream[i], min(stride, n - i)))
        return out, stride

    # adversarial split: interleaved, so both halves span the range
    h1, h2 = vals[::2], vals[1::2]
    s1, stride1 = sketch(h1)
    s2, stride2 = sketch(h2)
    merged = sorted(s1 + s2)
    n = len(vals)
    for q in (50, 90, 99):
        target = max(1, n * q // 100)
        cum = 0
        est = None
        for v, wt in merged:
            cum += wt
            if cum >= target:
                est = v
                break
        assert est is not None
        # true rank span of est in the full stream
        lo = 1 + sum(1 for v in vals if v < est)
        hi = sum(1 for v in vals if v <= est)
        err = 0 if lo <= target <= hi else min(
            abs(lo - target), abs(hi - target)
        )
        assert err <= stride1 + stride2, (q, err, stride1, stride2)


def test_streaming_dedup_ttl_expiry(spark, tmp_path):
    """The semantics the registered streaming_dedup_ttl query cannot
    show on its own fixture (its 35-day delay outlives the stream):
    dropDuplicatesWithinWatermark state really EXPIRES. Three
    checkpointed availableNow runs against the same source dir give
    deterministic batch boundaries: (1) key a@t0 emits and enters
    state; (2) a@t0+2h arrives while state is alive (watermark was
    still t0-30m) -> DROPPED, then the advancing watermark
    (t0+90m) evicts a's state; (3) a@t0+3h finds no state ->
    RE-EMITTED. Emitted set = {a@t0, b@t0, a@t0+3h} — the
    TTL-bounded-state contract: duplicates inside the horizon are
    exact, state is bounded by arrival-rate x TTL, and a re-arrival
    after expiry is a fresh key."""
    import datetime as dt

    from distributed_mapreduce_p2p_spark.sources.io import scoped_conf

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def run_batch(idx, rows):
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        df.coalesce(1).write.parquet(str(src / f"b{idx}"))
        with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
            q = (
                spark.readStream.schema("k string, ts timestamp")
                .option("recursiveFileLookup", "true")
                .parquet(str(src))
                .withWatermark("ts", "30 minutes")
                .dropDuplicatesWithinWatermark(["k"])
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)

    run_batch(1, [("a", t0), ("b", t0)])
    run_batch(2, [("a", t0 + dt.timedelta(hours=2))])
    run_batch(3, [("a", t0 + dt.timedelta(hours=3))])
    got = {
        (r.k, r.ts) for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("a", t0),
        ("b", t0),
        ("a", t0 + dt.timedelta(hours=3)),
    }, got
