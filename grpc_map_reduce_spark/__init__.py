"""grpc_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing surface of the
reference MapReduce framework (NoobyScoob/grpc-map-reduce, surveyed in
SURVEY.md) as an idiomatic PySpark library, extended with the
large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design principles (SURVEY.md §7):
  * DataFrame-first — every operator is a function ``(spark, sf_dir |
    DataFrame, ...) -> DataFrame`` whose plan Catalyst optimizes.
  * No custom execution machinery — the reference's master / mapper /
    reducer / shuffle layer (master.go, mapper.go, reducer.go) maps to
    Spark's driver / executors / sort-based shuffle, i.e. zero code.
  * Scale-out posture — no ``collect()`` inside operators, broadcast
    for small dimensions, AQE on, partial aggregation everywhere.
"""

from grpc_map_reduce_spark.session import get_spark
from grpc_map_reduce_spark.sources.tables import TABLE_NAMES, load_tables

__all__ = ["get_spark", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
