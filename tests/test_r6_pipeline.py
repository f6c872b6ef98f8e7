"""Round-6 additions: table-maintenance lifecycle, local-FS guard on
the space-aligned chunk grid, publish/time-travel crash-gap ordering,
CDC within-batch conflict semantics, profiling label escaping."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- io


def test_maintain_table_lifecycle(spark, tmp_path):
    """publish N fragmented versions -> maintain_table compacts the
    live version into a NEW published version and vacuums history ->
    readers converge on identical rows, fewer files, and vacuumed
    versions fail loudly (the OPTIMIZE+VACUUM round trip)."""
    import os

    from distributed_mapreduce_p2p_spark.sources import io as IO

    root = str(tmp_path / "tbl")
    base = spark.range(1000).withColumnRenamed("id", "k")
    # three published versions, the live one deliberately fragmented
    IO.publish_atomic(base.limit(10), root)
    IO.publish_atomic(base.limit(100), root, expected_version=1)
    IO.publish_atomic(base.repartition(16), root, expected_version=2)
    assert IO.read_manifest(root)["version"] == 3
    before = IO.read_published(spark, root)
    assert len(before.inputFiles()) == 16

    new_m, removed = IO.maintain_table(
        spark, root, target_bytes=1 << 30, keep=2
    )
    # compaction committed as version 4, one near-target file
    assert new_m["version"] == 4
    assert len(new_m["files"]) == 1
    # retention kept v3+v4, removed v1+v2
    assert removed == [1, 2]
    # readers converge: identical row multiset
    after = IO.read_published(spark, root)
    assert after.count() == 1000
    assert (
        after.agg(F.sum("k")).collect()[0][0]
        == before.agg(F.sum("k")).collect()[0][0]
    )
    # time travel: v3 retained, v1 vacuumed -> loud failure
    assert IO.read_published(spark, root, version=3).count() == 1000
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        IO.read_published(spark, root, version=1)
    # vacuum removed the data directories, not just manifests
    assert not os.path.exists(os.path.join(root, "v=1"))
    # concurrent-writer safety: maintain pins the version it compacted
    # (a publish that lands mid-compaction wins; the compaction raises)


def test_space_aligned_chunks_reject_remote_uri(spark, tmp_path):
    """The chunk-grid builder and its task-side reader are local-FS
    only; an hdfs:// path must produce the documented error naming
    the chunktext DataSource, not a worker stack trace."""
    from distributed_mapreduce_p2p_spark.sources import io as IO

    with pytest.raises(ValueError, match="chunktext"):
        IO.read_text_chunks_space_aligned(
            spark, "hdfs://nn:8020/corpus/a.txt"
        )
    # file:// is the local scheme — accepted and stripped
    p = tmp_path / "c.txt"
    p.write_text("alpha beta gamma")
    rows = IO.read_text_chunks_space_aligned(
        spark, f"file://{p}"
    ).collect()
    assert "".join(r.text for r in rows).split() == [
        "alpha",
        "beta",
        "gamma",
    ]


def test_read_published_rejects_uncommitted_version(spark, tmp_path):
    """The per-version manifest is written AFTER the live-pointer
    commit; read_published must (a) refuse versions beyond the live
    pointer and (b) serve the live version from the live manifest
    even when its per-version manifest is missing (publisher crashed
    in the gap)."""
    import os

    from distributed_mapreduce_p2p_spark.sources import io as IO

    root = str(tmp_path / "tbl")
    IO.publish_atomic(spark.range(50).withColumnRenamed("id", "k"), root)
    # (a) a version beyond the live pointer is unreadable even if a
    # stray per-version manifest exists
    import json

    stray = dict(IO.read_manifest(root), version=9, dir="v=9")
    with open(os.path.join(root, "_MANIFEST.v9.json"), "w") as fh:
        json.dump(stray, fh)
    with pytest.raises(FileNotFoundError, match="never committed live"):
        IO.read_published(spark, root, version=9)
    # (b) crash in the gap: live manifest committed, per-version
    # manifest lost -> the live version still time-travels
    os.remove(os.path.join(root, "_MANIFEST.v1.json"))
    assert IO.read_published(spark, root, version=1).count() == 50


# ----------------------------------------------------------- profiling


def test_profile_handles_backslash_and_quote_columns(spark):
    """Column names containing backslashes and quotes profile
    correctly — the stack() label literal escapes backslashes BEFORE
    quotes (r5 advice)."""
    from distributed_mapreduce_p2p_spark.operators.profiling import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None)], ["end\\", "it's"]
    )
    got = {r.col: (r.n_nulls, r.n_distinct) for r in profile(df).collect()}
    assert got == {"end\\": (0, 2), "it's": (1, 1)}


# ------------------------------------------------------------- CDC sink


def test_cdc_sink_conflicting_batch_raises(spark, tmp_path):
    """A micro-batch carrying two DIFFERENT ops for one key without a
    seq column must raise (nondeterministic keep-last is a silent
    corruption); exact duplicate rows (at-least-once replay) are
    still collapsed silently."""
    from distributed_mapreduce_p2p_spark.streaming.replication import (
        CdcParquetSink,
    )

    sink = CdcParquetSink(str(tmp_path / "sink"), key="k")
    dup = spark.createDataFrame(
        [(1, "U", 10), (1, "U", 10), (2, "U", 20)], "k long, op string, v long"
    )
    sink.apply_cdc_batch(dup, 0)
    got = {r.k: r.v for r in sink.read(spark).collect()}
    assert got == {1: 10, 2: 20}

    conflict = spark.createDataFrame(
        [(1, "U", 11), (1, "D", 11)], "k long, op string, v long"
    )
    with pytest.raises(ValueError, match="seq"):
        sink.apply_cdc_batch(conflict, 1)


def test_cdc_sink_seq_keep_last(spark, tmp_path):
    """With a seq ordering column, keep-last per key is by seq (the
    Debezium/LSN pattern): U then D in one batch deletes; D then U
    upserts."""
    from distributed_mapreduce_p2p_spark.streaming.replication import (
        CdcParquetSink,
    )

    sink = CdcParquetSink(str(tmp_path / "sink"), key="k")
    batch = spark.createDataFrame(
        [
            (1, "U", 10, 1),
            (1, "D", 10, 2),  # U then D -> key 1 deleted
            (2, "D", 0, 1),
            (2, "U", 22, 2),  # D then U -> key 2 = 22
            (3, "U", 33, 1),
        ],
        "k long, op string, v long, seq long",
    )
    sink.apply_cdc_batch(batch, 0)
    got = {r.k: r.v for r in sink.read(spark).collect()}
    assert got == {2: 22, 3: 33}
