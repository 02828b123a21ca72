"""Job submission surface — the reference's client driver, reimagined.

Reference (SURVEY.md §2 A13, §3.1): ``java -jar framework.jar startjob
<jobname> <jar> <inputdir> <outputdir> <numReducers>`` builds a
``JobConfiguration`` (jar bytes + input file list, ``JobConfiguration.java:36-69``),
submits over RMI (``ClientDriver.java:40-72``), and the framework discovers
the client's ``map``/``reduce`` methods by reflection on the jar's main class
(``MapRunner.java:41-61``).

Here the same contract is a dataclass + one ``run()`` call: the "jar" is a
Python module path whose ``map_fn``/``reduce_fn`` attributes are resolved by
import (the entry-point registry replacing reflection), the input dir is a
line-oriented text directory (A1/A2 semantics), the output is the
``key\\tvalue`` TSV contract (A12), and ``num_reducers`` bounds reduce
parallelism exactly like the reference's reducer clamp
(``Communicator.java:137-147`` — here just a shuffle-partition count).

CLI twin (``python -m map_reduce_engine_spark startjob ...``) in __main__.py.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable, Iterable
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from map_reduce_engine_spark.io import read_text, write_tsv
from map_reduce_engine_spark.mapreduce import map_reduce


@dataclass
class Job:
    """One map/reduce job: the reference's JobConfiguration, typed.

    ``map_fn(record) -> iter[(k, v)]`` and ``reduce_fn(key, values) ->
    iter[(k2, v2)]`` follow the compat contract (mapreduce.py). Writable
    type names (int/short/long/double/text) or Spark SQL types describe the
    key/value columns, mirroring the reference's five Writables (§1.2).
    """

    name: str
    input_dir: str
    output_dir: str
    map_fn: Callable[[Any], Iterable[tuple]]
    reduce_fn: Callable[[Any, list], Iterable[tuple]]
    num_reducers: int | None = None
    map_key_type: str = "text"
    map_value_type: str = "long"
    out_key_type: str | None = None
    out_value_type: str | None = None
    final_merge: bool = False

    def dataframe(self, spark: SparkSession) -> DataFrame:
        """The job as a lazy DataFrame (no output written)."""
        records = read_text(spark, self.input_dir)
        return map_reduce(
            records,
            self.map_fn,
            self.reduce_fn,
            map_key_type=self.map_key_type,
            map_value_type=self.map_value_type,
            out_key_type=self.out_key_type,
            out_value_type=self.out_value_type,
            num_reducers=self.num_reducers,
            final_merge=self.final_merge,
        )

    def run(self, spark: SparkSession, audit: bool = False) -> None:
        """Execute and write the A12 ``key\\tvalue`` TSV output.

        ``audit=True`` runs the plan-quality auditor first (plans.py) and
        refuses to submit a plan with a scale-killer — the pre-flight the
        reference could never offer (it had no plan to inspect, SURVEY §4).
        The compat surface's Arrow boundaries are sanctioned; only
        cartesian products and row-at-a-time Python eval abort.
        """
        df = self.dataframe(spark)
        if audit:
            from map_reduce_engine_spark.plans import assert_scalable

            assert_scalable(df)
        write_tsv(df, self.output_dir)


def load_job_module(module_path: str) -> tuple[Callable, Callable, dict]:
    """Resolve a client job by module path — the reflection replacement.

    The module must expose ``map_fn`` and ``reduce_fn``; optional
    ``JOB_TYPES`` dict may set map_key_type/map_value_type/out_key_type/
    out_value_type/final_merge (the reference encodes these in its Writable
    generics; we read them as plain attributes).
    """
    mod = importlib.import_module(module_path)
    try:
        map_fn, reduce_fn = mod.map_fn, mod.reduce_fn
    except AttributeError as e:
        raise AttributeError(
            f"job module {module_path!r} must define map_fn and reduce_fn"
        ) from e
    return map_fn, reduce_fn, getattr(mod, "JOB_TYPES", {})


def startjob(
    spark: SparkSession,
    name: str,
    job_module: str,
    input_dir: str,
    output_dir: str,
    num_reducers: int | None = None,
) -> Job:
    """The reference CLI contract as a function: build and run a Job."""
    map_fn, reduce_fn, types = load_job_module(job_module)
    job = Job(
        name=name,
        input_dir=input_dir,
        output_dir=output_dir,
        map_fn=map_fn,
        reduce_fn=reduce_fn,
        num_reducers=num_reducers,
        **types,
    )
    job.run(spark)
    return job
