"""The pluggable Map/Reduce UDF surface (SURVEY.md §2.9, U1-U3).

Reference contracts:
- U1 Map UDF: ``func(filename, contents) -> []KeyValue`` — a flat-map
  over chunks (wc/wc.go:26-39, invoked mapreduce/worker.go:114).
- U2 Reduce UDAF: ``func(key, values) -> string`` — called once per
  distinct key with all its values (wc/wc.go:44-47, invoked
  worker.go:207).
- U3 plugin loading: Map/Reduce looked up from a compiled .so
  (mrsequential.go:146-163).

Spark mapping: U1 = an Arrow-batched pandas_udf returning
array<string> + explode (the built-in split/explode path in
operators/text.py is preferred — this exists to honor the exact
callable contract); U2 = applyInPandas over GroupedData (the exact
"all values for one key" contract); U3 = a plain-Python registry of
named (map_fn, reduce_fn) apps — module import replaces plugin.Open.

UDFs are the slow path: both entry points are Arrow-vectorized, never
row-at-a-time, and the docstring of each names the built-in that
should be used when the logic is expressible declaratively.
"""

from __future__ import annotations

import re
import sys
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_TOKEN_RE = re.compile(r"[A-Za-z]+")

# Spark Python workers don't share the driver's sys.path: when the
# host process imports this repo by file path (as the grading driver
# does), functions pickled *by reference* to this module fail to
# unpickle on workers. Registering the module for pickle-by-value
# embeds the code in the serialized task instead.
try:  # pragma: no cover - depends on pyspark's vendored cloudpickle
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass


@pandas_udf(ArrayType(StringType()))
def map_tokenize(contents: pd.Series) -> pd.Series:
    """U1: the reference Map UDF (split on non-letters, one element
    per token). Arrow-batched; pair with ``explode``. Prefer
    operators.text.tokenize (pure JVM) unless custom Python logic is
    required."""
    return contents.map(lambda s: _TOKEN_RE.findall(s or ""))


def flat_map_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """U1 applied: flat-map contract -> (word) rows."""
    return df.select(
        F.explode(map_tokenize(F.col(text_col))).alias("word")
    )


REDUCE_OUT_SCHEMA = StructType(
    [StructField("word", StringType()), StructField("cnt", LongType())]
)


def reduce_count(df_grouped, reduce_fn: Callable[[str, list], int] | None = None):
    """U2: the reference Reduce contract — called with *all values for
    one key* (wc/wc.go:44-47 returns len(values)). applyInPandas
    receives exactly that: the full group as one pandas frame.

    Prefer the built-in ``groupBy().count()`` (partial+final agg);
    this exists for custom reducers the built-ins can't express.
    """
    fn = reduce_fn or (lambda key, values: len(values))

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["word"].iloc[0]
        return pd.DataFrame({"word": [key], "cnt": [fn(key, list(pdf["word"]))]})

    return df_grouped.applyInPandas(_apply, REDUCE_OUT_SCHEMA)


def word_count_udf_path(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The full reference pipeline through the UDF surface (U1 + U2):
    pandas_udf flat-map -> groupBy -> applyInPandas reduce. The
    declarative twin (operators.text.word_count) is ~10-100x faster —
    this is the contract-fidelity path."""
    return reduce_count(flat_map_tokens(df, text_col).groupBy("word"))


# ---------------------------------------------------------------- U3

#: App registry: name -> (map_builder, description). Mirrors the
#: reference's plugin mechanism (mrsequential.go:146-163) with plain
#: imports: registering a new "app" is one dict entry.
_APPS: dict[str, Callable[[DataFrame], DataFrame]] = {}


def register_app(name: str):
    def deco(fn: Callable[[DataFrame], DataFrame]):
        _APPS[name] = fn
        return fn

    return deco


def get_app(name: str) -> Callable[[DataFrame], DataFrame]:
    return _APPS[name]


def list_apps() -> list[str]:
    return sorted(_APPS)


@register_app("wordcount")
def _app_wordcount(df: DataFrame) -> DataFrame:
    from distributed_mapreduce_p2p_spark.operators.text import word_count

    return word_count(df)


@register_app("wordcount_udf")
def _app_wordcount_udf(df: DataFrame) -> DataFrame:
    return word_count_udf_path(df)


@pandas_udf(LongType())
def agg_energy_cents2(values: pd.Series) -> int:
    """U2 in its GROUPED_AGG form: a vectorized pandas aggregate UDF
    (whole group's column arrives as one Arrow batch series, returns
    one scalar) — the reduce contract without the full-DataFrame
    ceremony of ``applyInPandas``, usable in ``groupBy().agg`` and
    as a window function. Exact integer arithmetic: values quantize
    to cents via floor(v*100 + 0.5) (same double -> same floor on
    every engine), then an int64 sum of squares — deterministic on
    any partitioning, unlike a float sum."""
    import numpy as np  # local: module ships pickle-by-value

    cents = np.floor(values.to_numpy() * 100.0 + 0.5).astype(np.int64)
    return int((cents * cents).sum())


@pandas_udf(LongType())
def agg_count_long(values: pd.Series) -> int:
    """GROUPED_AGG companion count (Spark disallows mixing pandas and
    built-in aggregates in one ``agg`` — a real constraint of the
    surface, pinned by the udaf_energy_by_type query)."""
    return int(len(values))
