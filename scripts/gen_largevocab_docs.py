#!/usr/bin/env python
"""Deterministic LARGE-VOCABULARY documents fixture for cross-corpus
similarity smokes (VERDICT r10 #2).

The shipped sf0.1 documents fixture has a ~30-word vocabulary, which is
DEGENERATE for cross-corpus MinHash: nearly every pair of documents
shares most tokens, so ~74% of all cross pairs co-bucket (measured at
sf0.1 — 18.6M candidates for a 5000x5000 probe) and a verify smoke on it
measures worst-case candidate density, not the operator. This generator
produces documents whose token distribution looks like a real corpus at
the property that matters — candidate rate: ``vocab_size`` distinct
tokens (default 50,000), ``words_per_doc`` tokens per document (default
120), every token a pure hash of (doc id, position), so two unrelated
documents share almost no tokens and co-bucket almost never. Every 20th
document is a planted NEAR-DUP of its predecessor (the first 90% of
positions re-use the predecessor's words) so a cross-corpus verify has
real >=0.7-Jaccard matches to find, one bounded cluster per 20 docs.

Everything is a pure column expression (xxhash64 + pmod — JVM-side, no
Python, no RNG state), so the fixture is bit-identical across runs,
partitionings, and Spark versions with stable xxhash64.

Usage:
    python scripts/gen_largevocab_docs.py --out /tmp/largevocab \
        [--n-docs 5000] [--vocab-size 50000] [--words-per-doc 120]

writes ``{out}/documents.parquet`` with (doc_id BIGINT, text STRING) —
the same shape the smoke's ``read_table(..., "documents")`` expects.
The REGISTRY fixtures under /root/testdata are untouched; this fixture
exists only for scale smokes (scripts/scale_smoke.py --largevocab-*).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

NEAR_DUP_EVERY = 20  # doc_id % 20 == 0 near-dups its predecessor
SHARED_FRACTION = 0.9  # fraction of positions copied from the predecessor


def largevocab_documents(
    spark,
    n_docs: int = 5000,
    vocab_size: int = 50_000,
    words_per_doc: int = 120,
) -> DataFrame:
    """(doc_id, text) — the deterministic large-vocabulary corpus."""
    shared = int(SHARED_FRACTION * words_per_doc)
    doc = F.col("id")
    # the doc whose words positions < `shared` copy: the predecessor for
    # planted near-dups, itself otherwise
    src = F.when(
        (doc % NEAR_DUP_EVERY == 0) & (doc > 0), doc - 1
    ).otherwise(doc)

    def word(of_doc, j):
        # one vocab draw per (doc, position): collision-free across docs
        # by construction of the 64-bit hash input
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(of_doc * F.lit(1_000_003) + j), F.lit(vocab_size)),
        )

    return spark.range(n_docs).select(
        doc.alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                lambda j: F.when(j < F.lit(shared), word(src, j)).otherwise(
                    word(doc, j)
                ),
            ),
            " ",
        ).alias("text"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=5000)
    ap.add_argument("--vocab-size", type=int, default=50_000)
    ap.add_argument("--words-per-doc", type=int, default=120)
    args = ap.parse_args()

    from map_reduce_engine_spark.session import get_spark

    spark = get_spark(app_name="mre-gen-largevocab")
    try:
        docs = largevocab_documents(
            spark, args.n_docs, args.vocab_size, args.words_per_doc
        )
        docs.write.mode("overwrite").parquet(f"{args.out}/documents.parquet")
        print(
            f"wrote {args.out}/documents.parquet: {args.n_docs} docs, "
            f"vocab {args.vocab_size}, {args.words_per_doc} words/doc"
        )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
