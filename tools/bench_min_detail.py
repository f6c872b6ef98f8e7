#!/usr/bin/env python
"""Write a MIN-over-runs composite bench detail (r11, from the r10
ADVICE): the committed BENCH_DETAIL.json is the regression gate's
baseline (tools/bench_regress.py diffs future runs against it), and
a single ambient-inflated run as baseline masks real regressions up
to the inflation factor once host throughput recovers. This tool
takes each query's MIN across N same-tree runs — the stall-resistant
estimator the r10 forensics settled on — and writes it in the exact
BENCH_DETAIL.json schema, annotated with the source runs and an
ambient calibration reading so the gate can normalize mechanically.

Job counts are taken from the run that contributed the (first)
minimum for that query when available.

Usage:
  python tools/bench_min_detail.py OUT.json RUN1.json RUN2.json [...]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out_p, run_ps = Path(sys.argv[1]), [Path(p) for p in sys.argv[2:]]
    assert len(run_ps) >= 2, "need >= 2 runs for a min composite"
    runs = [json.loads(p.read_text()) for p in run_ps]
    sfs = {r.get("sf") for r in runs}
    assert len(sfs) == 1, f"mixed SFs: {sfs}"
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        assert set(r["queries"]) == names, "query sets differ across runs"

    queries: dict[str, float] = {}
    jobs: dict[str, int] = {}
    for n in runs[0]["queries"]:
        best_i = min(
            range(len(runs)), key=lambda i: runs[i]["queries"][n]
        )
        queries[n] = runs[best_i]["queries"][n]
        if runs[best_i].get("jobs", {}).get(n) is not None:
            jobs[n] = runs[best_i]["jobs"][n]
        else:  # older runs without job counts: take any run that has one
            for r in runs:
                if r.get("jobs", {}).get(n) is not None:
                    jobs[n] = r["jobs"][n]
                    break

    try:
        cal = subprocess.run(
            [sys.executable, str(REPO / "tools" / "ambient_calib.py")],
            capture_output=True,
            text=True,
            timeout=120,
        )
        ambient = json.loads(cal.stdout.strip().splitlines()[-1])
    except Exception:  # noqa: BLE001
        ambient = None

    total = round(sum(queries.values()), 4)
    out_p.write_text(
        json.dumps(
            {
                "metric": "all_queries_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "jobs": jobs,
                "ambient": ambient,
                "sf": runs[0]["sf"],
                "composite_min_of": [p.name for p in run_ps],
            },
            indent=1,
        )
    )
    print(f"wrote {out_p}: min-of-{len(runs)} total {total}s "
          f"({len(queries)} queries)")


if __name__ == "__main__":
    main()
