"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship word-count query (the reference's only
query, wc/wc.go:26-47) at sf0.001. ``queries()`` — one entry per
implemented operator from SURVEY.md §2 (+ north-star LLM-pipeline
ops); ``oracle_sql()`` — the DuckDB-equivalent ANSI SQL for each.
Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from distributed_mapreduce_p2p_spark.registry import (  # noqa: E402
    QUERIES,
    finalize_oracles,
    flagship,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # The driver compares Spark vs DuckDB at sf=0.01, so dynamic
    # (generated expected-value) oracles render against that path.
    return finalize_oracles("/root/testdata/sf0.01")
