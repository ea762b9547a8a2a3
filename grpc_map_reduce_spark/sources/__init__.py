from grpc_map_reduce_spark.sources.tables import TABLE_NAMES, load_tables, table
from grpc_map_reduce_spark.sources.text import read_text_corpus

__all__ = ["TABLE_NAMES", "load_tables", "table", "read_text_corpus"]
