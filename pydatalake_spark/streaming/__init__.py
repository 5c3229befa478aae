from pydatalake_spark.streaming.ingest import stream_ingest, stream_time_bucket

__all__ = ["stream_ingest", "stream_time_bucket"]
