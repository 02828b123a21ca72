#!/usr/bin/env python
"""Regenerate QUERIES.md from the live query registry.

Usage: python scripts/gen_queries_md.py  (from the repo root)
"""

from __future__ import annotations

import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from map_reduce_engine_spark.queries import REGISTRY  # noqa: E402

SECTIONS = {
    "text": (
        "Reference parity + text analysis",
        "WordCount/WordLength (the reference's two shipped jobs, WordCount.java / WordLength.java), "
        "the map/reduce UDF compat path, and the LLM-pipeline text analyzers (SURVEY §2 Part C).",
    ),
    "relational": (
        "Relational core (SURVEY §2 Part B)",
        "Aggregations, joins, windows, sorts/top-k, set ops, scalar functions — all absent in the "
        "reference (UDF-expressible only); idiomatic DataFrame surface here.",
    ),
    "advanced": (
        "Advanced relational + SQL surface",
        "Subqueries via spark.sql (Catalyst decorrelation), percentiles, analytic windows, reshaping, "
        "array/map types, fuzzy matching, multi-way TPC-H shapes, multimodal plumbing.",
    ),
    "tpch": (
        "TPC-H completion (Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21)",
        "The remaining TPC-H query shapes — correlated scalar subqueries, EXISTS/NOT-EXISTS "
        "self-joins, scalar-subquery thresholds, count-distinct with NOT IN — adapted to the "
        "fixture schema (no partsupp / commit / receipt columns); completes all 22 shapes.",
    ),
    "events": (
        "Event analytics + Structured Streaming",
        "Batch window/sessionization twins and their streaming counterparts (watermarks, streaming dedup, "
        "stream-static join, arbitrary stateful op) — extension beyond the strictly-batch reference.",
    ),
    "dedup": (
        "Deduplication (SURVEY §2 Part C)",
        "Exact, fingerprint, n-gram Jaccard, MinHash-LSH, SimHash.",
    ),
    "similarity": (
        "Similarity search (SURVEY §2 Part C)",
        "Brute-force cosine top-k baseline, LSH-ANN and IVF-ANN scale paths, embedding near-dup.",
    ),
    "temporal": (
        "Temporal joins",
        "As-of join and tolerance range join — operators Spark lacks natively, composed from "
        "bucketed equi-joins + window dedup.",
    ),
    "pipeline": (
        "Training-data pipeline (SURVEY §2 Part C)",
        "The ops between raw ingest and the tokenizer: repetition quality filters, train/test "
        "contamination checks, sequence packing, domain-mixture re-weighting, deterministic "
        "hash sampling, winnowing fingerprints.",
    ),
    "retrieval": (
        "Retrieval scoring + model inference (SURVEY §2 Part C)",
        "BM25 keyword retrieval, hashing-trick linear-classifier inference (broadcast weight "
        "table), and skip-gram PMI association statistics — the audit/filter/tokenizer-prep "
        "passes a corpus pipeline runs between cleaning and training.",
    ),
    "mleval": (
        "ML evaluation, in-engine training, causal inference + advanced stats (SURVEY §2 Part C)",
        "The round-4-continuous tier: evaluation (AP, gains, F1 search, calibration, kappa, "
        "fairness + BH-FDR, conformal, CUPED), in-engine training/selection (Newton logistic, "
        "ridge CV, boosted stumps, rank-1 ALS, coresets, max-coverage, Markov chains, Sinkhorn "
        "OT, IPF raking, grid DBSCAN, James-Stein), causal/survival (strata/IPW/RD/Oaxaca/"
        "mediation/QTE/offline-policy, log-rank), and time-series diagnostics (Mann-Kendall, "
        "runs, Ljung-Box, changepoint, seasonal decomposition, Holt, Huber) — all frozen to "
        "exact integer units.",
    ),
}

ORDER = [
    "text",
    "relational",
    "advanced",
    "tpch",
    "events",
    "dedup",
    "similarity",
    "temporal",
    "pipeline",
    "retrieval",
    "mleval",
]

# every registry module must have a section — fail loudly instead of dropping rows
assert set(ORDER) == set(SECTIONS)


def main() -> None:
    out = [
        "# QUERIES — conformance registry cross-reference",
        "",
        "Generated from `map_reduce_engine_spark/queries/` (one line per registry",
        "entry; regenerate with the snippet in the footer). Every entry is run by",
        "the driver at sf0.01 and hash-compared against its DuckDB SQL twin —",
        "the registry has had ZERO oracle-less entries since round 2 (asserted by",
        "`tests/test_oracle_parity.py::test_every_query_has_an_oracle`).",
        "Approximate / hash-family-dependent / streaming operators are fully",
        "hash-checkable too: they emit the exact side plus a deterministic",
        "within-documented-bound verdict that the oracle recomputes literally.",
        "",
    ]
    mods: dict[str, list] = {}
    for name, q in REGISTRY.items():
        mod = inspect.getmodule(q.fn).__name__.split(".")[-1]
        mods.setdefault(mod, []).append((name, q))
    missing = set(mods) - set(ORDER)
    assert not missing, f"registry modules without a QUERIES.md section: {missing}"
    total = orc = 0
    for mod in ORDER:
        title, blurb = SECTIONS[mod]
        out += [f"## {title}", "", blurb, "", "| query | check | what it proves |", "|---|---|---|"]
        for name, q in mods.get(mod, []):
            kind = "oracle" if q.oracle else "rows-only"
            total += 1
            orc += q.oracle is not None
            doc = " ".join(q.doc.split())
            out.append(f"| `{name}` | {kind} | {doc} |")
        out.append("")
    out += [
        f"**Totals: {total} queries, {orc} oracle-checked, {total - orc} rows-only.**",
        "",
        "_Regenerate: run the script in `scripts/gen_queries_md.py`._",
        "",
    ]
    Path("QUERIES.md").write_text("\n".join(out))
    print(f"wrote QUERIES.md: {total} queries, {orc} oracle-checked")


if __name__ == "__main__":
    main()
