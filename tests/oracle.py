"""Local replica of the driver's DuckDB-oracle compare.

Runs each ``queries()`` entry in Spark and its ``oracle_sql()`` twin
in DuckDB on the same parquet, then compares row count, column names,
and order-insensitive values (columns sorted by name, rows sorted).
Catching a mismatch here is cheap; catching it in CORRECTNESS_r{N}
costs a round.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of the exact double — mismatch in last ulp must surface
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except ImportError:  # pragma: no cover
        pass
    return v


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    issues: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d = con.sql(sql)
    d_cols = list(d.columns)
    d_rows = [tuple(r) for r in d.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        issues.append(f"{name}: columns {sorted(s_cols)} != {sorted(d_cols)}")
        return issues
    if len(s_rows) != len(d_rows):
        issues.append(f"{name}: rowcount {len(s_rows)} != {len(d_rows)}")
    sc, dc = canon(s_rows, s_cols), canon(d_rows, d_cols)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b]
        issues.append(
            f"{name}: {len(diffs)} differing rows of {len(sc)}; "
            f"first: spark={diffs[0][0] if diffs else '?'} "
            f"duck={diffs[0][1] if diffs else '?'}"
        )
    return issues
