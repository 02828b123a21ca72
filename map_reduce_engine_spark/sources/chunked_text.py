"""Chunked line-oriented text source — the reference's ingestion model as a
Spark 4 Python DataSource.

The reference splits every input file into chunks of ``NUM_RECORDS_PER_CHUNK``
consecutive lines, each chunk becoming one schedulable map task
(``MasterNode.java:89-126``, ``config.txt:12``; "reading one record is
equivalent to reading a line", ``RecordReader.java:22-29``). Spark's native
text reader splits by *bytes* (``spark.sql.files.maxPartitionBytes``) — this
source reproduces the reference's *record-count* split exactly: one Spark
input partition per chunk, rows carrying (chunk_id, record_id, value)
provenance.

Usage::

    spark.dataSource.register(ChunkedTextDataSource)
    df = (spark.read.format("chunked_text")
          .option("records_per_chunk", "100").load("/data/dir"))

Scale note: this is the COMPAT surface, not the 100 TB path — ``partitions()``
enumerates line offsets driver-side (one sequential metadata pass per file),
faithful to the reference where the master also reads every file while
splitting (``MasterNode.java:100-115``). Real ingest at scale is
``spark.read.text`` with byte splits. The reference's empty-tail-chunk quirk
(``MasterNode.java:117-120``) is NOT replicated — empty chunks schedule no
work here.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class ChunkPartition(InputPartition):
    def __init__(self, chunk_id: int, path: str, start_record: int, n_records: int):
        self.chunk_id = chunk_id
        self.path = path
        self.start_record = start_record
        self.n_records = n_records


class ChunkedTextReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("chunked_text requires a path (load(<dir-or-file>))")
        self.path = path
        self.records_per_chunk = int(options.get("records_per_chunk", "1000"))

    def _files(self) -> list[Path]:
        p = Path(self.path)
        if p.is_dir():
            # plain files only, sorted — JobConfiguration.readFiles() semantics
            # (JobConfiguration.java:52-69 skips subdirectories)
            return sorted(f for f in p.iterdir() if f.is_file())
        return [p]

    def partitions(self) -> list[ChunkPartition]:
        parts: list[ChunkPartition] = []
        chunk_id = 0
        for f in self._files():
            with open(f, "rb") as fh:
                n_lines = sum(1 for _ in fh)
            for start in range(0, n_lines, self.records_per_chunk):
                n = min(self.records_per_chunk, n_lines - start)
                parts.append(ChunkPartition(chunk_id, str(f), start, n))
                chunk_id += 1
        # a fully empty input still needs one (empty) partition for a valid scan
        return parts or [ChunkPartition(0, str(self._files()[0]), 0, 0)] if self._files() else []

    def read(self, partition: ChunkPartition):
        end = partition.start_record + partition.n_records
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            for i, line in enumerate(fh):
                if i < partition.start_record:
                    continue
                if i >= end:
                    break
                yield (partition.chunk_id, i, line.rstrip("\n").rstrip("\r"))


class ChunkedTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chunked_text"

    def schema(self) -> str:
        return "chunk_id bigint, record_id bigint, value string"

    def reader(self, schema) -> ChunkedTextReader:
        return ChunkedTextReader(self.options)
