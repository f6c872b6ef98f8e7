"""Differential golden-output testing (SURVEY.md §5.1): every
registered query vs its DuckDB oracle — the reference's
seq-mr-out-0 == mr-out-final methodology, generalized."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import compare, duck_con


def _pairs():
    from distributed_mapreduce_p2p_spark import registry

    return sorted(registry.finalize_oracles(SF_SMALL).keys())


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", _pairs())
def test_parity(spark, con, name):
    from distributed_mapreduce_p2p_spark import registry

    df = registry.QUERIES[name](spark, SF_SMALL)
    oracle = registry.finalize_oracles(SF_SMALL)[name]
    issues = compare(df, con, oracle, name)
    assert not issues, "\n".join(issues)


def test_all_queries_return_rows(spark):
    from distributed_mapreduce_p2p_spark import registry

    for name, fn in registry.QUERIES.items():
        n = fn(spark, SF_SMALL).count()
        assert n >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
