"""``chunktext`` — the reference's chunked text scan as a first-class
Spark data source (PySpark 4 Python DataSource API).

The reference grids files into CHUNK_SIZE byte ranges on the
coordinator and hands each range to a worker that realigns both ends
at spaces (chunks/chunks.go:18-47, mapreduce/worker.go:37-89). This
source expresses that contract the way Spark wants it expressed: each
chunk range IS an ``InputPartition``, so the scheduler owns task
placement/retry for chunks exactly as it does for parquet row groups,
and the scan composes with every DataFrame operator:

    spark.dataSource.register(ChunkTextDataSource)
    df = (spark.read.format("chunktext")
          .option("chunk_bytes", 102400)
          .load("/data/corpus.txt"))

Schema: (path string, chunk_id long, start long, end long,
text string) — [start, end) is the grid range; ``text`` the
space-aligned payload (no token split, every byte exactly once; same
guarantee as io.py::read_text_chunks_space_aligned, shared realign
code).

The driver touches file *metadata* only (one os.path.getsize per
file); payload bytes are read by executors inside ``read``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from distributed_mapreduce_p2p_spark.sources.io import (
    REFERENCE_CHUNK_BYTES,
    read_aligned_range,
)


class ChunkRange(InputPartition):
    def __init__(self, path: str, chunk_id: int, start: int, end: int):
        self.path = path
        self.chunk_id = chunk_id
        self.start = start
        self.end = end


class ChunkTextReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("chunktext requires a path: .load('/file.txt')")
        self.paths = [path]
        self.chunk_bytes = int(
            options.get("chunk_bytes", REFERENCE_CHUNK_BYTES)
        )
        self.delimiter = options.get("delimiter", " ").encode("utf-8")
        if len(self.delimiter) != 1:
            raise ValueError("delimiter must be a single byte")

    def partitions(self) -> Sequence[InputPartition]:
        out: list[InputPartition] = []
        for p in self.paths:
            if os.path.isdir(p):
                files = sorted(
                    os.path.join(p, f)
                    for f in os.listdir(p)
                    if os.path.isfile(os.path.join(p, f))
                )
            else:
                files = [p]
            for fp in files:
                size = os.path.getsize(fp)
                cid = 0
                for s in range(0, max(size, 1), self.chunk_bytes):
                    out.append(
                        ChunkRange(fp, cid, s, min(s + self.chunk_bytes, size))
                    )
                    cid += 1
        return out

    def read(self, partition: ChunkRange) -> Iterator[tuple]:
        buf = read_aligned_range(
            partition.path, partition.start, partition.end, self.delimiter
        )
        yield (
            partition.path,
            partition.chunk_id,
            partition.start,
            partition.end,
            buf.decode("utf-8", errors="replace"),
        )


class ChunkTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chunktext"

    def schema(self) -> str:
        return "path string, chunk_id long, start long, end long, text string"

    def reader(self, schema) -> ChunkTextReader:
        return ChunkTextReader(self.options)
