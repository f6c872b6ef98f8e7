"""Local replica of the driver's DuckDB-oracle compare.

Runs each ``queries()`` entry in Spark and its ``oracle_sql()`` twin
in DuckDB on the same parquet, then compares row count, column names,
and order-insensitive values. Catching a mismatch here is cheap;
catching it in CORRECTNESS_r{N} costs a round.

DRIVER-FAITHFUL (round-4 rewrite): the grading driver converts BOTH
sides to pandas (Spark ``toPandas()``, DuckDB ``.df()``), sorts
columns by name, ``sort_values`` over all columns, then hashes the
values. Two consequences the old ``fetchall()`` harness was blind to:

1. DuckDB ``SUM(BIGINT)`` returns HUGEINT; ``.df()`` lowers it to
   float64 while Spark emits int64 — equal values, different hash
   (the r3 ``json_props_stats`` red). ``fetchall()`` kept the exact
   Python int, hiding it.
2. A list/array output column crashes pandas ``sort_values``
   (``TypeError: unhashable type: 'list'`` — the r3
   ``array_agg_sorted`` err). ``fetchall()`` tuple-ized it, hiding it.

So this harness goes through the same pandas path and compares cells
with a DTYPE-SENSITIVE repr: ``99111`` (int64) != ``99111.0``
(float64), and array cells raise, reported as an issue.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb
import numpy as _np

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
    # Spill outside the repo (DuckDB's default temp dir is
    # cwd-relative .tmp/ — a memory-heavy oracle once left 6.3 GB
    # there and git add tried to object-hash it) and bound memory so
    # an infeasible oracle fails fast instead of thrashing the box.
    con.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.sql("SET memory_limit='24GB'")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _cell(v):
    """Dtype-sensitive canonical string for one pandas cell.

    int-typed and float-typed cells must NOT compare equal even when
    numerically identical — the driver's value hash distinguishes
    them (r3 ``json_props_stats``). Array-like cells raise TypeError,
    mirroring the driver's canonicalizer crash (r3
    ``array_agg_sorted``).
    """
    if v is None:
        return "NULL"
    if isinstance(v, (bool, _np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (float, _np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else "f:" + repr(f)
    if isinstance(v, (int, _np.integer)):
        return "i:" + repr(int(v))
    if isinstance(v, _dt.datetime):
        # pd.Timestamp subclasses datetime; NaT.isoformat() == 'NaT'
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, (list, tuple, set, dict, _np.ndarray)):
        raise TypeError(
            f"unhashable array/map cell ({type(v).__name__}) — the "
            "driver's pandas canonicalizer crashes on these; "
            "array_join/serialize the column to a string"
        )
    try:
        if v is not v:  # pd.NA / NaT-like
            return "NaN"
    except Exception:
        pass
    return repr(v)


def _canon_pdf(pdf):
    """The driver's canonicalization: columns sorted by name, rows
    sorted by all columns (this is where list cells explode, exactly
    like the driver), then dtype-sensitive cell strings."""
    cols = sorted(pdf.columns)
    df = pdf[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")
    df = df.reset_index(drop=True)
    rows = [
        tuple(_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    # cell strings are the real compare key; re-sort on them so the
    # two sides' tie-breaking inside sort_values can't differ
    rows.sort()
    return rows


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    issues: list[str] = []
    s_pdf = spark_df.toPandas()
    d_pdf = con.sql(sql).df()

    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        issues.append(f"{name}: columns {s_cols} != {d_cols}")
        return issues
    if len(s_pdf) != len(d_pdf):
        issues.append(f"{name}: rowcount {len(s_pdf)} != {len(d_pdf)}")
    try:
        sc = _canon_pdf(s_pdf)
    except TypeError as e:
        issues.append(f"{name}: spark-side canonicalizer crash: {e}")
        return issues
    try:
        dc = _canon_pdf(d_pdf)
    except TypeError as e:
        issues.append(f"{name}: oracle-side canonicalizer crash: {e}")
        return issues
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b]
        issues.append(
            f"{name}: {len(diffs)} differing rows of {len(sc)}; "
            f"first: spark={diffs[0][0] if diffs else '?'} "
            f"duck={diffs[0][1] if diffs else '?'}"
        )
    return issues
