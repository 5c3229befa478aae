from pydatalake_spark.sources.read import read_dataset, read_any

__all__ = ["read_dataset", "read_any"]
