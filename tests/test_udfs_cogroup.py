"""Cogrouped applyInPandas — the two-input generalization of the
reference's Reduce contract (U2): both groups' full value sets
delivered to one Python function."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_cogroup_apply_in_pandas(spark):
    import pandas as pd

    from distributed_mapreduce_p2p_spark.sources.io import read_table

    ev = read_table(spark, SF_SMALL, "events").select("user_id", "value")
    o = read_table(spark, SF_SMALL, "orders").select(
        "o_custkey", "o_totalprice"
    )

    def summarize(key, evs: pd.DataFrame, ords: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(evs)],
                "n_orders": [len(ords)],
                "ev_sum": [float(evs["value"].sum()) if len(evs) else 0.0],
            }
        )

    out = (
        ev.groupBy("user_id")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            summarize, "user_id long, n_events long, n_orders long, ev_sum double"
        )
    )
    rows = {r.user_id: (r.n_events, r.n_orders) for r in out.collect()}
    # reconcile against plain counts
    ev_counts = {r.user_id: r.cnt for r in ev.groupBy("user_id").count().withColumnRenamed("count", "cnt").collect()}
    for uid, (ne, _) in rows.items():
        assert ne == ev_counts.get(uid, 0)
    assert sum(ne for ne, _ in rows.values()) == ev.count()
