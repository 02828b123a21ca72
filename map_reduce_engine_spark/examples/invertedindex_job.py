"""Inverted index as a client job module — the classic third MapReduce
example (no analogue shipped with the reference; WordCount/WordLength are
its only jobs, SURVEY.md §5).

map: ``<doc_id>\t<text>`` line → (word, doc_id) per token.
reduce: (word, doc ids) → (word, ascending-unique posting list).
Run: ``python -m map_reduce_engine_spark startjob ii \\
    map_reduce_engine_spark.examples.invertedindex_job <in> <out> [n]``
"""

from __future__ import annotations

from map_reduce_engine_spark.mapreduce import (
    inverted_index_mapper,
    inverted_index_reducer,
)

map_fn = inverted_index_mapper
reduce_fn = inverted_index_reducer
JOB_TYPES = {
    "map_key_type": "text",
    "map_value_type": "long",
    "out_key_type": "text",
    "out_value_type": "text",
}
