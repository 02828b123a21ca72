"""Engine operators: text analysis, dedup, similarity search, multimodal.

Everything here is built on DataFrame expressions (JVM-side, codegen'd)
unless semantics force an Arrow-batched Pandas UDF — the 100 TB rule is
"stay declarative so Catalyst can push, prune, and pick join strategies".
"""

from map_reduce_engine_spark.operators.text import (
    wordcount,
    wordlength,
    tokenize,
    token_stats,
    quality_score,
    langid,
    fingerprint,
)
from map_reduce_engine_spark.operators.dedup import (
    dedup_exact,
    duplicate_clusters,
    minhash_signatures,
    minhash_candidate_pairs,
    jaccard_pairs,
    simhash,
    repeated_span_coverage,
    cross_corpus_contamination_spans,
    substring_dedup_rewrite,
    substring_dedup_spans,
    substring_dedup_survivors,
)
from map_reduce_engine_spark.operators.temporal import (
    asof_join,
    range_self_join,
)
from map_reduce_engine_spark.operators.similarity import (
    with_norm,
    cosine_topk,
    embedding_near_dup,
    random_hyperplane_buckets,
    ann_topk,
    ivf_topk,
    ivfpq_topk,
    pq_topk,
    semantic_dedup,
)
from map_reduce_engine_spark.operators.cdc import (
    merge_upsert,
    merge_delete,
    scd2_apply,
    latest_version_per_key,
)
from map_reduce_engine_spark.operators.graph import (
    connected_components,
    pagerank,
    dedup_components,
)
from map_reduce_engine_spark.operators.sequential import ewma_per_group
from map_reduce_engine_spark.operators.text import pii_scrub

__all__ = [
    "pq_topk",
    "ivfpq_topk",
    "semantic_dedup",
    "repeated_span_coverage",
    "cross_corpus_contamination_spans",
    "substring_dedup_rewrite",
    "substring_dedup_spans",
    "substring_dedup_survivors",
    "merge_upsert",
    "merge_delete",
    "scd2_apply",
    "latest_version_per_key",
    "connected_components",
    "pagerank",
    "dedup_components",
    "ewma_per_group",
    "pii_scrub",
    "wordcount",
    "wordlength",
    "tokenize",
    "token_stats",
    "quality_score",
    "langid",
    "fingerprint",
    "dedup_exact",
    "duplicate_clusters",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "jaccard_pairs",
    "simhash",
    "with_norm",
    "cosine_topk",
    "embedding_near_dup",
    "random_hyperplane_buckets",
    "ann_topk",
    "ivf_topk",
    "asof_join",
    "range_self_join",
]
