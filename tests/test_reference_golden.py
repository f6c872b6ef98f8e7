"""Differential test against the reference's own golden output.

The reference checks in ``mr-out-final`` / ``seq-mr-out-0`` — the
word count of its 8-file Gutenberg corpus, byte-identical between its
distributed and sequential engines (SURVEY.md §5.1). Our engine, with
the Unicode-parity tokenizer (``[^\\p{L}]+`` == Go
``FieldsFunc(unicode.IsLetter)``), must reproduce that exact result:
same 26,010 words, same counts.
"""

from __future__ import annotations

import os

import pytest

REF_DATA = "/root/reference/data"
REF_GOLDEN = "/root/reference/mr-out-final"

# client.go:28-37 — the fixed input corpus.
REF_FILES = [
    "19626.txt",
    "pg-being_ernest.txt",
    "pg-metamorphosis.txt",
    "pg1342.txt",
    "pg1513.txt",
    "pg16389.txt",
    "pg2701.txt",
    "pg84.txt",
]


@pytest.mark.skipif(
    not os.path.isfile(REF_GOLDEN), reason="reference checkout not present"
)
def test_wordcount_matches_reference_golden_output(spark):
    from distributed_mapreduce_p2p_spark.operators.text import (
        TOKEN_SEP_UNICODE,
        word_count,
    )
    from distributed_mapreduce_p2p_spark.sources.io import read_text_corpus

    corpus = read_text_corpus(
        spark, [f"{REF_DATA}/{f}" for f in REF_FILES]
    )
    ours = {
        r.word: r.cnt
        for r in word_count(corpus, "value", sep=TOKEN_SEP_UNICODE).collect()
    }

    golden = {}
    with open(REF_GOLDEN) as fh:
        for line in fh:
            word, cnt = line.rstrip("\n").rsplit(" ", 1)
            golden[word] = int(cnt)

    assert len(golden) == 26010  # BASELINE.md result cardinality
    assert ours == golden


@pytest.mark.skipif(
    not os.path.isfile(REF_GOLDEN), reason="reference checkout not present"
)
def test_chunked_scan_matches_whole_file_scan(spark):
    """S1/S2: reading with reference-sized 100 KiB splits must give
    the same tokens as one-partition reads (boundary alignment is the
    file source's job — this pins it)."""
    from distributed_mapreduce_p2p_spark.operators.text import (
        TOKEN_SEP_UNICODE,
        word_count,
    )
    from distributed_mapreduce_p2p_spark.sources.io import (
        REFERENCE_CHUNK_BYTES,
        files_split_size,
        read_text_corpus,
    )

    paths = [f"{REF_DATA}/{f}" for f in REF_FILES]
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")

    # Split size is consulted at action planning time, so the chunked
    # word count must be *executed* (collected) inside the scope —
    # otherwise both sides plan with the same (later) conf value and
    # the differential test compares whole vs whole.
    with files_split_size(spark, REFERENCE_CHUNK_BYTES):
        chunked = read_text_corpus(spark, paths)
        n_parts = chunked.rdd.getNumPartitions()
        a = {
            (r.word, r.cnt)
            for r in word_count(chunked, "value", sep=TOKEN_SEP_UNICODE).collect()
        }
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == prev

    whole = read_text_corpus(spark, paths)
    b = {
        (r.word, r.cnt)
        for r in word_count(whole, "value", sep=TOKEN_SEP_UNICODE).collect()
    }
    assert a == b
    assert n_parts > 8, f"100KiB splits should yield >8 partitions, got {n_parts}"


def test_cli_wordcount_matches_golden(spark, tmp_path):
    """The drop-in CLI surface: ``python -m distributed_mapreduce_p2p_spark
    wordcount data/* -o out`` must emit the reference's checked-in
    ``mr-out-final`` byte-for-byte, through BOTH scan paths (newline
    text source and the reference's space-aligned chunk source).
    Runs in-process (main(argv)) to reuse the test JVM."""
    import glob

    from distributed_mapreduce_p2p_spark.__main__ import main

    inputs = sorted(glob.glob("/root/reference/data/*.txt"))
    golden = open(REF_GOLDEN).read()

    out1 = str(tmp_path / "wc.txt")
    assert main(["wordcount", *inputs, "-o", out1]) == 0
    assert open(out1).read() == golden

    out2 = str(tmp_path / "wc-chunked.txt")
    assert main(["wordcount", "--chunked", *inputs, "-o", out2]) == 0
    assert open(out2).read() == golden
