"""Driver-faithful oracle sweep at an arbitrary SF.

The pytest parity sweep runs at sf0.001 for speed; the grading driver
runs at sf0.01. This tool replays the exact driver compare (pandas
canonicalization, dtype-sensitive hash inputs — tests/oracle.py) over
every registered oracle at the given SF so sf-dependent mismatches
(tie-breaking, float accumulation order) surface before the round is
graded.

Usage: python tools/sweep_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from distributed_mapreduce_p2p_spark import registry
from distributed_mapreduce_p2p_spark.session import get_spark
from tests.oracle import compare, duck_con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="sweep-oracles")
    con = duck_con(sf_dir)
    # finalize_oracles = static ORACLES + the generated (dynamic)
    # oracles rendered for THIS sf — without it the sweep silently
    # skipped bpe_merges/tokenizer_apply_bpe, which the driver checks.
    oracles = registry.finalize_oracles(sf_dir)
    names = [n for n in registry.QUERIES if n in oracles]
    if only:
        names = [n for n in names if n in only]
    bad = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            issues = compare(df, con, oracles[name], name)
        except Exception as e:  # surface, keep sweeping
            issues = [f"{name}: EXC {type(e).__name__}: {e}"]
        dt = time.time() - t0
        status = "ok" if not issues else "FAIL"
        print(f"[{i + 1}/{len(names)}] {status} {name} ({dt:.1f}s)", flush=True)
        if issues:
            bad.extend(issues)
    print(f"\n{len(names) - len(bad)}/{len(names)} parity at {sf_dir}")
    for b in bad:
        print("  ", b)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
