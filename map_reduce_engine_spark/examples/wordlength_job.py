"""WordLength as a client job module (the reference's ``wordlength-src``).

map: emit (len(word), word) — ``WordLength.java:13-27``.
reduce: count words per length — ``WordLength.java:30-40``.
"""

from __future__ import annotations

from map_reduce_engine_spark.mapreduce import wordlength_mapper, wordlength_reducer

map_fn = wordlength_mapper
reduce_fn = wordlength_reducer
JOB_TYPES = {
    "map_key_type": "long",
    "map_value_type": "text",
    "out_key_type": "long",
    "out_value_type": "long",
}
