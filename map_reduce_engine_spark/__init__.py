"""map_reduce_engine_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MapReduce framework (swapnil-pimpale/Map-Reduce-Engine), re-expressed
Spark-first: the reference's map/shuffle/reduce dataflow maps onto the
DataFrame/Catalyst stack (see SURVEY.md §2/§4 — the reference's entire
physical layer is Spark built-ins), its user map/reduce UDF surface becomes a
thin Arrow-batched compat API (`mapreduce`), and the LLM-pipeline north-star
operators (dedup, similarity search, multimodal columns, text analysis) are
first-class operators designed for 100 TB scale.
"""

from map_reduce_engine_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
