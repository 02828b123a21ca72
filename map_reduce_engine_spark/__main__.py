"""CLI twin of the reference's Driver (SURVEY.md §3: ``Driver.java:55-82``).

    python -m map_reduce_engine_spark startjob <name> <job_module> \\
        <inputdir> <outputdir> [num_reducers]

``job_module`` is a Python module path exposing ``map_fn``/``reduce_fn``
(see job.load_job_module) — the jar+reflection replacement. The reference's
``master``/``slave`` bring-up verbs have no equivalent here: Spark's own
cluster manager replaces them (SURVEY.md §3.2-3.3), so the only verb is the
query path.
"""

from __future__ import annotations

import argparse
import sys

from map_reduce_engine_spark.job import startjob
from map_reduce_engine_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="map_reduce_engine_spark")
    sub = parser.add_subparsers(dest="verb", required=True)
    sj = sub.add_parser("startjob", help="run a map/reduce job (the reference's query path)")
    sj.add_argument("name")
    sj.add_argument("job_module", help="python module path exposing map_fn/reduce_fn")
    sj.add_argument("input_dir")
    sj.add_argument("output_dir")
    sj.add_argument("num_reducers", nargs="?", type=int, default=None)
    args = parser.parse_args(argv)

    spark = get_spark(app_name=f"mre-job-{args.name}")
    try:
        startjob(
            spark,
            args.name,
            args.job_module,
            args.input_dir,
            args.output_dir,
            args.num_reducers,
        )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
