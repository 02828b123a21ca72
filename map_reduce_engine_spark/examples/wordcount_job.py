"""WordCount as a client job module (the reference's ``wordcount-src``).

map: whitespace-tokenize each line, emit (word, 1) — ``WordCount.java:13-24``.
reduce: sum the counts per word — ``WordCount.java:27-35``.
Run: ``python -m map_reduce_engine_spark startjob wc \\
    map_reduce_engine_spark.examples.wordcount_job <in> <out> [n]``
"""

from __future__ import annotations

from map_reduce_engine_spark.mapreduce import wordcount_mapper, wordcount_reducer

map_fn = wordcount_mapper
reduce_fn = wordcount_reducer
JOB_TYPES = {
    "map_key_type": "text",
    "map_value_type": "long",
}
