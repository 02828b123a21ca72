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
from pyspark.sql.udtf import AnalyzeResult


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


@udtf
class NgramColumns:
    """POLYMORPHIC UDTF: output schema computed from the call's arguments.

    ``analyze`` runs at plan time on the CONSTANT ``n`` and emits one
    column per gram position (``pos, w1..wn``) — the Spark 4 capability a
    static ``returnType`` can't express (the reference's map step always
    emits one fixed (k, v) shape; this is its typed, shape-generic
    successor). ``eval`` then yields each n-gram window.
    """

    @staticmethod
    def analyze(text, n):  # AnalyzeArgument pair → AnalyzeResult
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        if not (n.isConstantExpression and isinstance(n.value, int) and n.value >= 1):
            raise ValueError("n must be a constant positive integer")
        fields = [StructField("pos", LongType())] + [
            StructField(f"w{i + 1}", StringType()) for i in range(n.value)
        ]
        return AnalyzeResult(schema=StructType(fields))

    def eval(self, text: str, n: int):  # noqa: D102 — contract documented above
        if text is None:
            return
        toks = [t for t in re.split(r"\s+", text.strip()) if t]
        for i in range(len(toks) - n + 1):
            yield (i + 1, *toks[i : i + n])


def ngram_columns(
    spark: SparkSession, df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, pos, w1..wn) via the polymorphic UDTF — column count follows n."""
    spark.udtf.register("mre_ngram_columns", NgramColumns)
    df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")).createOrReplaceTempView(
        "mre_udtf_ngram_in"
    )
    return spark.sql(
        f"SELECT id, s.* FROM mre_udtf_ngram_in, LATERAL mre_ngram_columns(text, {int(n)}) s"
    )
