#!/usr/bin/env python
"""Sweep every registry query for HINTED broadcasts of unfiltered
fact-table scans — the r8 ADVICE bug class, made mechanical.

A `broadcast()` hint forces the build side regardless of size, so a
hint on a table that GROWS with the data (lineitem, orders, events,
documents, embeddings, part, customer, supplier) is an executor OOM
deferred to production scale even when results are correct —
exactly what ivf_recall_curve shipped in r7. Size-based planning
(no hint) broadcasts the same table while it is small and falls back
to a shuffle join at scale, so the fix is usually to DELETE the hint
(SCALE.md's stated policy hints only nation/region/top-k slices/
aggregates).

Method: plan each query with spark.sql.autoBroadcastJoinThreshold=-1
so ONLY hinted BroadcastExchanges remain, then flag any broadcast
subtree that scans a fact table without (a) an Aggregate /
TakeOrderedAndProject above the scan (bounds the rows) or (b) one
comparison Filter per fact scan (a slice). The r8 sweep found 20
sites: 16 were fixed in place (all in the never-driver-sampled
window, so no CORRECTNESS row went stale); the 8 deferred sites were
de-hinted in r9 with plan-identity proof (tools/plan_identity.py).

KNOWN HEURISTIC GAPS (shared with plans/explain.py's
window_input_bounded, documented there too):
  * A hint inside a localCheckpoint'ed subtree is INVISIBLE to this
    sweep — the checkpoint executes at plan-build time and the
    visible plan reads `Scan ExistingRDD`. The r9 wave-2 sweep found
    two such hidden hinted fact broadcasts this way (promo_diff_in_
    diff's unfiltered part projection, tpch_q11's supplier slice) by
    SOURCE inspection, not planning; the closed-set source guard
    tests/test_plans.py::test_broadcast_hint_args_closed_set is the
    mechanical cover for this gap.
  * An Aggregate grouped by a FACT-SCALE key (e.g. groupBy custkey)
    bounds nothing — output cardinality still scales with the data —
    yet (a) above treats any Aggregate as bounding.  Today every
    hinted aggregate in the registry groups by a dimension-like key
    (nation/brand/band id) or is a global/top-k reduce; a reviewer
    adding a hinted groupBy-custkey broadcast must not rely on this
    sweep to catch it.
  * A comparison Filter counts as a slice regardless of
    selectivity; `l_quantity > 0` would pass.  Both gaps trade
    false-negatives for zero false-positives on the current
    registry; tighten if either shape ever ships.

Writes AUDIT_BROADCASTS.md. Run: python tools/audit_hinted_broadcasts.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from distributed_mapreduce_p2p_spark import registry  # noqa: E402
from distributed_mapreduce_p2p_spark.plans.explain import (  # noqa: E402
    explain_str,
    node_subtrees,
)
from distributed_mapreduce_p2p_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
FACT = (
    "lineitem",
    "orders",
    "events",
    "documents",
    "embeddings",
    "part.parquet",
    "partsupp",
    "customer",
    "supplier",
)

# name -> reason a hinted fact broadcast is tolerated this round.
# EMPTY since r9: the 8 sites deferred at r8 close (tpch_q5/q8/q9/
# q10/q14/q15/q20, kmv_distinct_estimate) were de-hinted along with
# the shared _trade_und helper and the agg-bounded-so-unflagged
# tpch_q3/hits_hubs hints, WITHOUT rotating their green driver rows:
# tools/plan_identity.py proved every physical plan unchanged
# (normalized explain-string identity, two same-code snapshots vs
# the pre-edit tree — see PLAN_IDENTITY.md). Any future entry here
# is scheduled debt with a written reason, not an endorsement.
DEFERRED: dict[str, str] = {}

AGG = re.compile(r"^(\*\(\d+\) )?((Hash|Sort|ObjectHash)Aggregate|TakeOrderedAndProject)")
SLICE = re.compile(r"^(\*\(\d+\) )?Filter .*[<>=]")


def flag_plan(plan: str) -> list[str]:
    """First lines of hinted broadcast subtrees that ship an
    unbounded fact scan."""
    out = []
    for sub in node_subtrees(plan, lambda s: s.startswith("BroadcastExchange")):
        if not sub or AGG.match(sub[0]):
            continue
        if any(AGG.match(line) for line in sub):
            continue
        scans = [
            l for l in sub
            if "FileScan parquet" in l and any(t in l for t in FACT)
        ]
        if not scans:
            continue
        if len([l for l in sub if SLICE.match(l)]) < len(scans):
            out.append(sub[0][:80])
    return out


def main() -> None:
    spark = get_spark(
        app_name="audit_hinted_broadcasts", cores=8, shuffle_partitions=8
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    rows, bad = [], []
    for name, fn in registry.QUERIES.items():
        plags = flag_plan(explain_str(fn(spark, SF), "simple"))
        if not plags:
            continue
        if name in DEFERRED:
            rows.append((name, f"deferred: {DEFERRED[name]}"))
        else:
            rows.append((name, "FLAGGED — fix or defer with a reason"))
            bad.append(name)
    out = [
        "# AUDIT — hinted fact-table broadcasts (threshold=-1, sf0.001)",
        "",
        "Generated by `tools/audit_hinted_broadcasts.py`. A broadcast",
        "HINT on a data-scaled table forces the build side at every",
        "scale (executor OOM deferred to production — the r8 ADVICE",
        "class); this sweep plans all queries with auto-broadcast",
        "disabled so only hints remain, and flags hinted subtrees that",
        "ship an unbounded fact scan. `deferred` rows are scheduled",
        "r10 de-hints on green-driver-row queries (see tool header).",
        "",
        "| query | status |",
        "|---|---|",
    ]
    out += [f"| {n} | {s} |" for n, s in rows]
    out += [
        "",
        f"**{len(registry.QUERIES)} queries swept; "
        f"{len(rows)} hinted-fact sites ({len(bad)} flagged"
        f"{': ' + ', '.join(bad) if bad else ''}, "
        f"{len(rows) - len(bad)} deferred).**",
        "",
    ]
    (REPO / "AUDIT_BROADCASTS.md").write_text("\n".join(out))
    print(
        f"wrote AUDIT_BROADCASTS.md ({len(rows)} sites, {len(bad)} flagged)"
    )
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
