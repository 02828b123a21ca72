#!/usr/bin/env python
"""Reproduce the cross-JVM index-durability claim (SCALE.md round 9).

Two SEPARATE JVMs against the same working directory:
  --phase write : a Hive-catalog session (derby metastore in cwd) builds a
                  tiny substring tile index and persists it bucketed on h.
  --phase read  : a FRESH session reads the table back by name and asserts
                  the bucket spec and content survived the JVM boundary.

Run both phases from one cwd (each phase is its own process — that IS the
point):
    python scripts/catalog_durability_check.py --phase write --dir /tmp/dur
    python scripts/catalog_durability_check.py --phase read  --dir /tmp/dur

Under the DEFAULT in-memory catalog the read phase would fail to resolve
the table (the registration dies with the session; the files do not) —
that failure mode and its metadata-only recovery are pinned in
tests/test_operators.py::test_register_bucketed_table_recovers_dropped_index.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLE = "durability_check_idx"


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

    from pyspark.sql import functions as F  # noqa: F401

    from map_reduce_engine_spark.operators import dedup as dd

    spark = _session(args.dir)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.phase == "write":
            corpus = spark.createDataFrame(
                [(1, " ".join(f"s{i}" for i in range(60)))], ["doc_id", "text"]
            )
            dd.write_substring_index(
                dd.build_substring_index(corpus, "doc_id", "text", k=50),
                TABLE,
                path=f"{args.dir}/idx",
                n_buckets=4,
            )
            n = spark.table(TABLE).count()
            print(f"write phase: {TABLE} persisted with {n} tiles")
            return 0
        t = spark.table(TABLE)  # raises if the registration did not survive
        cols = {c.name: c.isBucket for c in spark.catalog.listColumns(TABLE)}
        n = t.count()
        assert cols.get("h"), f"bucket spec lost: {cols}"
        assert n == 11, f"content changed: {n} tiles"
        print(f"read phase (fresh JVM): {n} tiles, bucketed on h — durability holds")
        spark.sql(f"DROP TABLE {TABLE}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
