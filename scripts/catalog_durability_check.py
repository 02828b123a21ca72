#!/usr/bin/env python
"""Reproduce the cross-JVM index-durability claim (SCALE.md rounds 9-10)
for EVERY persisted index family the engine ships.

Two SEPARATE JVMs against the same working directory:
  --phase write : a Hive-catalog session (derby metastore in cwd) builds a
                  tiny instance of each index family and persists it —
                  the substring tile index (bucketed on h), the MinHash
                  band index (bucketed on (band, bucket), banding params
                  in TBLPROPERTIES), the verify token table (bucketed on
                  id, tokenization unit in TBLPROPERTIES), and the IVF
                  index (cell-bucketed assignment + nested centroid
                  companion at {path}/_centroids).
  --phase read  : a FRESH session reads each table back by name and
                  asserts bucket specs, table properties, content, and
                  the centroid companion all survived the JVM boundary —
                  including the read_* helpers' parameter assertions.

Run both phases from one cwd (each phase is its own process — that IS the
point):
    python scripts/catalog_durability_check.py --phase write --dir /tmp/dur
    python scripts/catalog_durability_check.py --phase read  --dir /tmp/dur

Under the DEFAULT in-memory catalog the read phase would fail to resolve
the tables (the registration dies with the session; the files do not) —
that failure mode and its metadata-only recovery are pinned in
tests/test_operators.py::test_register_bucketed_table_recovers_dropped_index.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TILE = "durability_check_idx"
BANDS = "durability_check_bands"
TOKS = "durability_check_toks"
IVF = "durability_check_ivf"


def _session(warehouse_dir: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.warehouse.dir", f"{warehouse_dir}/warehouse")
        .config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={warehouse_dir}/metastore_db;create=true",
        )
        .enableHiveSupport()
        .getOrCreate()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["write", "read"], required=True)
    ap.add_argument("--dir", required=True, help="shared scratch dir for both phases")
    args = ap.parse_args()

    from map_reduce_engine_spark.operators import dedup as dd
    from map_reduce_engine_spark.operators import similarity as sim

    spark = _session(args.dir)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.phase == "write":
            corpus = spark.createDataFrame(
                [
                    (i, " ".join(f"s{(i * 3 + j) % 70}" for j in range(60)))
                    for i in range(4)
                ],
                ["doc_id", "text"],
            )
            dd.write_substring_index(
                dd.build_substring_index(corpus, "doc_id", "text", k=50),
                TILE,
                path=f"{args.dir}/idx",
                n_buckets=4,
            )
            dd.write_band_index(
                dd.build_band_index(corpus, "doc_id", "text"),
                BANDS,
                path=f"{args.dir}/bands",
                n_buckets=4,
            )
            dd.write_token_table(
                dd.build_token_table(corpus, "doc_id", "text"),
                TOKS,
                path=f"{args.dir}/toks",
                n_buckets=4,
            )
            vecs = spark.createDataFrame(
                [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(40)],
                "vec_id BIGINT, embedding ARRAY<DOUBLE>",
            )
            centers, cb = sim.ivf_train_assign(vecs, "vec_id", "embedding", n_cells=4)
            sim.write_ivf_index(centers, cb, IVF, path=f"{args.dir}/ivf", n_buckets=4)
            counts = {t: spark.table(t).count() for t in (TILE, BANDS, TOKS, IVF)}
            import json

            (Path(args.dir) / "expected_counts.json").write_text(json.dumps(counts))
            print(f"write phase: persisted {counts}")
            return 0

        # read phase — a fresh JVM; every family must come back whole
        import json

        expected = json.loads((Path(args.dir) / "expected_counts.json").read_text())
        tiles = spark.table(TILE)
        cols = {c.name: c.isBucket for c in spark.catalog.listColumns(TILE)}
        assert cols.get("h"), f"tile bucket spec lost: {cols}"
        n_tiles = tiles.count()
        assert n_tiles == expected[TILE], f"tile content changed: {n_tiles}"

        bands = dd.read_band_index(spark, BANDS)  # asserts TBLPROPERTIES
        bcols = {c.name: c.isBucket for c in spark.catalog.listColumns(BANDS)}
        assert bcols.get("band") and bcols.get("bucket"), f"band spec lost: {bcols}"
        assert bands.count() == expected[BANDS] == 4 * 16, "band content changed"
        try:
            dd.read_band_index(spark, BANDS, bands=8)
            raise AssertionError("banding-mismatch assertion lost across JVMs")
        except ValueError:
            pass  # the recorded parameters survived and still assert

        toks = dd.read_token_table(spark, TOKS)
        tcols = {c.name: c.isBucket for c in spark.catalog.listColumns(TOKS)}
        assert tcols.get("id"), f"token-table spec lost: {tcols}"
        assert toks.count() == expected[TOKS], "token-table content changed"
        try:
            dd.read_token_table(spark, TOKS, shingle_n=3)
            raise AssertionError("tokenization-unit assertion lost across JVMs")
        except ValueError:
            pass

        centers, cb = sim.read_ivf_index(spark, IVF)
        assert len(centers) == 4, "centroid companion lost"
        icols = {c.name: c.isBucket for c in spark.catalog.listColumns(IVF)}
        assert icols.get("cell"), f"ivf bucket spec lost: {icols}"
        assert cb.count() == expected[IVF], "ivf assignment content changed"
        assert (Path(args.dir) / "ivf" / "_centroids").is_dir(), (
            "nested centroid layout lost"
        )

        print(
            "read phase (fresh JVM): tile/band/token/IVF all resolved with "
            "bucket specs, table properties, and the nested centroid "
            "companion intact — durability holds for every index family"
        )
        for t in (TILE, BANDS, TOKS, IVF, f"{IVF}_centroids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
