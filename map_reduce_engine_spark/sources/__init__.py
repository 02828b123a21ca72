"""Custom sources (Python DataSource API, Spark 4).

The production ingest path is the built-in readers in ``io.py`` — these
custom sources exist where the reference has ingestion *semantics* the
built-ins don't model (the record/chunk model of SURVEY.md §2 A3).
"""

from map_reduce_engine_spark.sources.chunked_text import ChunkedTextDataSource

__all__ = ["ChunkedTextDataSource"]
