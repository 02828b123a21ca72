"""Text-analysis operators.

The reference's two shipped queries are text jobs: WordCount
(``wordcount-src/WordCount.java:13-35``: whitespace-tokenize, emit (word, 1),
sum per word) and WordLength (``wordlength-src/WordLength.java:13-40``: emit
(len(word), word), count per length). Here they are single declarative
pipelines — scan → split/explode → hash aggregate — which Catalyst executes
as partial+final aggregation with whole-stage codegen; the reference's
map-side sort, hash partitioner, and AddInterface combine (SURVEY.md §2
A6/A7/A11) are all subsumed by the sort-based shuffle + HashAggregate.

Beyond parity, the LLM-pipeline text ops: per-document token stats, quality
scoring, n-gram language ID, and content fingerprinting — all pure
`pyspark.sql.functions` expressions (no Python in the hot path), so they run
JVM-side and scale linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace-run tokenizer. StringTokenizer semantics (WordCount.java:15-23):
# split on any whitespace run, never emit empty tokens — hence trim + filter.
TOKEN_PATTERN = r"\s+"


def tokens_col(col: str | Column) -> Column:
    """Array-of-tokens expression for a text column (empty-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), TOKEN_PATTERN), lambda t: t != F.lit(""))


def tokenize(df: DataFrame, col: str, out: str = "tokens") -> DataFrame:
    return df.withColumn(out, tokens_col(col))


def wordcount(df: DataFrame, col: str) -> DataFrame:
    """(word, cnt) — the reference's flagship query, reference parity.

    WordCount.java:13-24 (map: tokenize → (word, 1)), :27-35 (reduce: sum).
    Plan: parquet scan (only ``col`` read) → explode → partial hash agg →
    shuffle on word → final hash agg. No Python anywhere.
    """
    return (
        df.select(F.explode(tokens_col(col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def wordlength(df: DataFrame, col: str) -> DataFrame:
    """(length, cnt) — token-length histogram, reference parity.

    WordLength.java:13-27 (map: (len, word)), :30-40 (reduce: count).
    """
    return (
        df.select(F.explode(tokens_col(col)).alias("word"))
        .select(F.length("word").alias("length"))
        .groupBy("length")
        .agg(F.count("*").alias("cnt"))
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics (token count, avg token length, chars).

    Token counting for pipeline budgeting: whitespace tokens plus a BPE-ish
    subword proxy (4 chars/token heuristic upper-bounded by char count).
    """
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.round(
            F.when(F.size(toks) > 0, F.length(F.concat_ws("", toks)) / F.size(toks)).otherwise(F.lit(0.0)),
            4,
        ).alias("avg_token_len"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4)).alias("est_bpe_tokens"),
    )


# Stopword markers per language for the n-gram/marker-word language-ID
# heuristic. Deliberately tiny and deterministic — accuracy is a data concern,
# the operator contract is determinism + scale.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
    "es": ["el", "los", "que", "y", "en"],
}


def _marker_score(text_col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text_col), F.lit(pat))


def _langid_exprs(text_col: Column) -> tuple[Column, Column]:
    """(predicted_lang, score) column pair for marker-word language ID."""
    langs = list(LANG_MARKERS)
    scores = {lang: _marker_score(text_col, LANG_MARKERS[lang]) for lang in langs}
    best = F.greatest(*scores.values())
    # first language (in fixed order) achieving the max, if max > 0
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    return pred, best.cast("bigint")


def langid(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: argmax of per-language stopword hit counts.

    Returns (id, predicted_lang, score). Ties and zero-hit rows resolve to
    'und' (deterministic). Pure regexp expressions — JVM-side.
    """
    pred, score = _langid_exprs(F.col(text_col))
    return df.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        score.alias("score"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document-quality features + composite score in [0, 1].

    Features mirror common pretraining-data filters: length band, mean word
    length band, alpha ratio, non-space punctuation ratio. All closed-form
    column expressions; composes with `filter` pushdown upstream.
    """
    q = _quality_exprs(F.col(text_col))
    return df.select(
        F.col(id_col),
        q["n_tokens"].alias("n_tokens"),
        q["alpha_ratio"].alias("alpha_ratio"),
        q["punct_ratio"].alias("punct_ratio"),
        q["quality"].alias("quality"),
    )


def _quality_exprs(text: Column) -> dict[str, Column]:
    """Quality-feature columns keyed by name (shared by quality_score/enrich)."""
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", ""))
    n_tokens = F.size(toks)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_tokens > 0, F.length(F.concat_ws("", toks)) / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_wlen >= 2) & (mean_wlen <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(alpha_ratio >= 0.6, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return {
        "n_tokens": n_tokens,
        "alpha_ratio": F.round(alpha_ratio, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "quality": F.round(score, 2),
    }


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic content fingerprint of whitespace-normalized text.

    md5 of lower(trimmed, whitespace-collapsed) text — the canonical key for
    exact dedup across formatting variants. 128-bit so collisions are not a
    concern at 100 TB document counts.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


# PII-shaped patterns for corpus scrubbing. Deliberately simple and
# deterministic (regexp only, JVM-side); swap in stricter patterns or a
# vetted library downstream — the pipeline shape (single regexp_replace
# pass per pattern, no Python) is what matters at 100 TB.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "long_digits": r"\d{6,}",  # phone/account/ssn-shaped digit runs
}


def pii_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    replacement: str = "[REDACTED]",
) -> DataFrame:
    """Redact PII-shaped substrings; emit scrubbed text + per-pattern hit flags.

    One chained ``regexp_replace`` per pattern (a single projection — the
    scan stays one pass), plus ``rlike`` hit flags so the pipeline can audit
    redaction rates without a second scan.
    """
    scrubbed = F.col(text_col)
    flags = []
    for name, pat in PII_PATTERNS.items():
        flags.append(F.col(text_col).rlike(pat).alias(f"had_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, replacement)
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed_text"),
        *flags,
    )


def skipgram_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 2,
    min_count: int = 5,
) -> DataFrame:
    """Skip-gram co-occurrence pairs with PMI, without a positional self-join.

    The word2vec/PMI preprocessing step: count ordered token pairs within a
    forward window of ``window`` positions, then score association as
    ``pmi = ln((C(w1,w2)/T) / ((C(w1)/U) * (C(w2)/U)))`` (T = total pairs,
    U = total tokens).

    The naive plan posexplodes the token stream and self-joins on
    ``(doc, pos + d)`` — a corpus-sized shuffle join per offset. Here the
    pair stream is built inside one projection instead: for each offset d,
    ``transform(sequence(1, n-d), i -> (tok[i], tok[i+d]))``, concatenated
    and exploded — zero joins, the pair generation stays in whole-stage
    codegen, and the only shuffles are the two hash aggregates (pair counts,
    unigram counts). Unigram and total tables are vocabulary-sized →
    broadcast. Scales as O(window · tokens) work with no corpus-side join.
    """
    toks = df.select(F.col(id_col), tokens_col(text_col).alias("toks"))
    # size guard via if(), NOT greatest(size-d, 0): Spark's sequence(1, 0)
    # yields a DESCENDING [1, 0] (unlike DuckDB's empty generate_series),
    # and element_at(_, 0) then throws on any document of <= d tokens
    per_offset = [
        f"if(size(toks) > {d}, "
        f"transform(sequence(1, size(toks) - {d}), "
        f"i -> struct(element_at(toks, i) AS w1, element_at(toks, i + {d}) AS w2)), "
        f"cast(array() as array<struct<w1:string,w2:string>>))"
        for d in range(1, window + 1)
    ]
    pairs = toks.select(
        F.explode(F.expr("concat(" + ", ".join(per_offset) + ")")).alias("p")
    ).select("p.w1", "p.w2")
    pair_counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("pair_cnt"))
    uni = (
        df.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    totals = pair_counts.agg(F.sum("pair_cnt").alias("t_pairs")).crossJoin(
        uni.agg(F.sum("cnt").alias("u_tokens"))
    )
    pmi = F.log(
        (F.col("pair_cnt") / F.col("t_pairs"))
        / ((F.col("c1") / F.col("u_tokens")) * (F.col("c2") / F.col("u_tokens")))
    )
    return (
        pair_counts.where(F.col("pair_cnt") >= min_count)
        .join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("cnt").alias("c1"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("cnt").alias("c2"))), "w2")
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", "pair_cnt", F.round(pmi, 6).alias("pmi"))
    )


def token_dropout(
    df: DataFrame,
    id_col: str,
    text_col: str,
    drop_permille: int = 100,
    seed: int = 1,
) -> DataFrame:
    """(id, text, aug_text, n_tokens, n_dropped) — deterministic token
    dropout, the cheapest text-augmentation for contrastive training.

    Each token is dropped iff the portable hash of (id, position, seed)
    lands below ``drop_permille``/1000 of the hash space — so the
    augmentation is a pure column expression (no RNG, no Python), the same
    view is regenerated bit-identically on any engine/partitioning/rerun
    (an auditability property torch-style random masking can't give a
    100 TB corpus), and distinct ``seed`` values yield independent views
    for multi-positive contrastive batches. One filter + concat per row;
    zero shuffles.
    """
    from map_reduce_engine_spark.operators.dedup import _MASK31, portable_base31

    cut = (_MASK31 + 1) * drop_permille // 1000
    # blank/whitespace-only text: split('') yields [''], a phantom token —
    # treat as zero tokens so counts stay honest on unfiltered corpora
    toks = F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.col(text_col)), r"\s+")
    )
    keep = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: portable_base31(
            F.concat_ws("|", F.col(id_col).cast("string"), s["i"].cast("string"), F.lit(str(seed)))
        )
        >= cut,
    )
    n_tokens = F.size(toks)
    n_kept = F.size(keep)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.concat_ws(" ", F.transform(keep, lambda s: s["t"])).alias("aug_text"),
        n_tokens.cast("bigint").alias("n_tokens"),
        (n_tokens - n_kept).cast("bigint").alias("n_dropped"),
    )
