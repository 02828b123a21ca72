#!/usr/bin/env python
"""Dump .explain('formatted') for every bench query into plans/<tag>/.

Usage: python scripts/dump_plans.py <out_dir_suffix> [name ...]
e.g.  python scripts/dump_plans.py r11 before        -> plans/r11/<q>_before.txt
      python scripts/dump_plans.py r11 after q14_bpe_train

Planning only (no execution) except where a query path itself runs jobs
(iterative loops localCheckpoint during CONSTRUCTION — their dumped plan is
the final checkpointed-scan shape, which is the honest artifact: the loop
rounds are driver-composed and each round's plan equals the final one).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from map_reduce_engine_spark.queries import REGISTRY  # noqa: E402
from map_reduce_engine_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

ROWS = bench.HEADLINE + bench.SENTINELS


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    only = set(sys.argv[3:])
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    for bench_name, reg_name, sf_override in ROWS:
        if only and bench_name not in only and reg_name not in only:
            continue
        sf = sf_override or bench.SF_DIR
        df = REGISTRY[reg_name].fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{bench_name}_{suffix}.txt"
        path.write_text(f"# {bench_name} ({reg_name}) @ {sf}\n{plan}")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
