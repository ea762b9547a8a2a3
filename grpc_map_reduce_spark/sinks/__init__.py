from grpc_map_reduce_spark.sinks.text import run_reference_job, write_kv_text

__all__ = ["run_reference_job", "write_kv_text"]
