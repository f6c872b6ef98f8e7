#!/usr/bin/env python
"""100x targeted rehearsal wave (r10 verdict item 6).

The standing base report measures every headline query at 10x; only
the SemDeDup family had 100x rows. This tool extends the measurement
one decade further for the WORST-exponent queries whose output is
flat (non-output-growth — the shapes where a high exponent cannot be
excused as "the answer itself grew"): build the full star-schema
replica fixture at 100x (the scale_rehearsal re-keying rules,
REPLICAS patched to 100) and record 1x vs 100x wall with the
exponent re-derived at base 100, beside the 10x exponent the base
table recorded. The claim under test: the 10x exponent HOLDS a
decade further (exponent_100x <= exponent_10x + noise) — a query
whose exponent RISES with scale has a super-linear term the 10x run
was too small to expose.

Run on an idle host:  python tools/targeted_100x_rehearsal.py
Appends `## 100x targeted wave (r10)` to SCALE_REHEARSAL.md.
"""

from __future__ import annotations

import math
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import scale_rehearsal as SR  # noqa: E402

from distributed_mapreduce_p2p_spark.session import get_spark  # noqa: E402

# the worst 10x exponents among flat-output queries in the base
# table (r9 refresh), with their recorded 10x exponents. Wave 1 =
# the top 5; wave 2 (same round) extends to the next pair.
TARGETS = [
    ("winnow_fingerprints", 0.83),
    ("token_cooccurrence_lift", 0.83),
    ("dsir_importance_weights", 0.83),
    ("kmv_distinct_estimate", 0.79),
    ("xyz_demand_variability", 0.74),
    ("price_index_fisher", 0.74),
    ("feature_hash_vectors", 0.74),
]


def main() -> None:
    spark = get_spark(app_name="targeted_100x")
    SR.REPLICAS = 100  # build_scaled and re-keying read the global
    # pass an existing fixture dir to skip the (expensive) build and
    # keep it for follow-up probes; without one, build fresh + clean
    keep = len(sys.argv) > 1
    tmp = sys.argv[1] if keep else tempfile.mkdtemp(prefix="rehearse_100x_")
    try:
        if not (Path(tmp) / "documents.parquet").exists():
            print("building 100x fixture...", flush=True)
            SR.build_scaled(spark, tmp)
        lines = [
            "## 100x targeted wave (r10)",
            "",
            "The 5 worst 10x-exponent NON-output-growth queries from",
            "the base table, re-measured a decade further on the full",
            "100x star replica (same re-keying rules; nation/region",
            "fixed). exp100 = log(t100/t1)/log(100); the pass",
            "criterion is exp100 <= exp10 + ~0.1 (the exponent holds",
            "— no hidden super-linear term), with wall-clock context:",
            "this 32-core box saturates, so exponents compress toward",
            "1.0 as tasks outnumber cores; a HOLD here is strong",
            "evidence, a small rise is adjudicated per query below.",
            "",
            "| query | 1x s | 100x s | ratio | exp100 | exp10 (base) |"
            " rows 1x | rows 100x |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for name, exp10 in TARGETS:
            t1, n1 = SR.time_query(spark, name, SR.SF)
            t100, n100 = SR.time_query(spark, name, tmp)
            ratio = t100 / t1
            exp = math.log(max(ratio, 1e-9)) / math.log(100)
            lines.append(
                f"| {name} | {t1:.2f} | {t100:.2f} | {ratio:.1f}x"
                f" | {exp:.2f} | {exp10:.2f} | {n1:,} | {n100:,} |"
            )
            print(lines[-1], flush=True)
    finally:
        if not keep:
            shutil.rmtree(tmp, ignore_errors=True)
    from md_sections import upsert_section

    path = REPO / "SCALE_REHEARSAL.md"
    path.write_text(
        upsert_section(path.read_text(), lines[0], "\n".join(lines))
    )
    print("upserted 100x targeted wave in SCALE_REHEARSAL.md")


if __name__ == "__main__":
    main()
