"""Python user-defined TABLE function surface (Spark 4 ``@udtf``).

Completes the UDF family next to the scalar/Pandas UDFs and the grouped-map
compat path (mapreduce.py) and the Pandas UDAF (operators/udaf.py): a UDTF
returns a RELATION per input row and joins laterally — the Spark-4-native
form of the reference's one-to-many map step (MapRunner.java emits any
number of (k, v) pairs per record), with typed multi-column output instead
of a key/value pair stream.

Like every Python boundary in this engine, the UDTF is the API-parity
artifact, not a hot path: anything expressible declaratively (explode,
inline, posexplode, json_tuple) should stay JVM-side. The conformance query
keeps the UDTF logic regex-portable so the DuckDB oracle reproduces it
exactly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="sentence_idx BIGINT, n_tokens BIGINT, n_chars BIGINT")
class SentenceStats:
    """One output row per non-empty sentence of the input text.

    Sentences split on ``[.!?]+`` runs, whitespace-trimmed; per sentence:
    1-based index, whitespace-token count, character count. The exact same
    splitting is expressible in DuckDB (string_split_regex), which is what
    makes this UDTF oracle-checkable — deliberately, as the conformance
    pattern for Python table functions.
    """

    def eval(self, text: str):  # noqa: D102 — contract documented above
        if text is None:
            return
        idx = 0
        for part in re.split(r"[.!?]+", text):
            sent = part.strip()
            if not sent:
                continue
            idx += 1
            yield idx, len(re.split(r"\s+", sent)), len(sent)


def sentence_stats(spark: SparkSession, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sentence_idx, n_tokens, n_chars) via LATERAL UDTF correlation.

    The lateral join hands each document row to the UDTF and unions the
    per-row relations — Spark plans it as a single BatchEvalPythonUDTF over
    the scan (one Python boundary, no shuffle); the downstream query decides
    any aggregation.
    """
    spark.udtf.register("mre_sentence_stats", SentenceStats)
    df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")).createOrReplaceTempView(
        "mre_udtf_in"
    )
    return spark.sql(
        "SELECT id, s.sentence_idx, s.n_tokens, s.n_chars "
        "FROM mre_udtf_in, LATERAL mre_sentence_stats(text) s"
    )
