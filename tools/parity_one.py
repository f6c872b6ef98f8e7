#!/usr/bin/env python
"""Quick single-query oracle parity check (local replica of the
driver compare). Usage:

    python tools/parity_one.py [--sf SF_DIR] name1 name2 ...

Runs each named registry entry in Spark and its oracle in DuckDB on
the same parquet and prints PASS/FAIL per query.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from oracle import compare, duck_con  # noqa: E402

from distributed_mapreduce_p2p_spark import registry  # noqa: E402
from distributed_mapreduce_p2p_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    names = args or list(registry.QUERIES)
    spark = get_spark(app_name="parity_one")
    con = duck_con(sf)
    oracles = registry.finalize_oracles(sf)
    failed = []
    for name in names:
        df = registry.QUERIES[name](spark, sf)
        issues = compare(df, con, oracles[name], name)
        n = df.count()
        if issues:
            failed.append(name)
            print(f"FAIL {name}: {issues}")
        else:
            print(f"PASS {name} ({n} rows)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
