"""Generic data-quality profiling: the per-column fingerprint an
ingest pipeline records for every load (null counts, exact distinct
counts), over ANY DataFrame.

One scan: all aggregates run in a single ``agg`` — Catalyst plans the
multiple exact count-distincts through one Expand (row blowup =
#distinct aggregates), then a ``stack`` unpivot emits long format.
At 100 TB, swap ``countDistinct`` for ``approx_count_distinct``
(HLL++ sketches merge map-side, no Expand) — identical plan shape and
output schema; exact is the default because a differential oracle can
hash-check it. Exposed as the ``table_profile`` registry query (on
``orders``) and the ``profile`` CLI subcommand (any table/parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, approx: bool = False) -> DataFrame:
    """Per-column ``(col, n_nulls, n_distinct)`` in ONE scan.

    Column names only ever appear through the Column API and
    positional aliases (``nn_0``/``nd_0``) — a column named
    ``user.id``, ``first name`` or ``it's`` profiles fine; the label
    literal in the stack() is quote-escaped.
    """
    cols = df.columns
    distinct = F.approx_count_distinct if approx else F.countDistinct
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(df[c]).alias(f"nn_{i}") for i, c in enumerate(cols)],
        *[distinct(df[c]).alias(f"nd_{i}") for i, c in enumerate(cols)],
    )
    stack = ", ".join(
        "'{}', n_rows - nn_{}, nd_{}".format(
            # backslashes BEFORE quotes, or a name ending in \ eats
            # the closing quote of its own label literal
            c.replace("\\", "\\\\").replace("'", "\\'"),
            i,
            i,
        )
        for i, c in enumerate(cols)
    )
    return agg.select(
        F.expr(f"stack({len(cols)}, {stack}) AS (col, n_nulls, n_distinct)")
    ).select(
        "col",
        F.col("n_nulls").cast("long"),
        F.col("n_distinct").cast("long"),
    )
