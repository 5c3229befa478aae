from pydatalake_spark.datalake.catalog import DataLake

__all__ = ["DataLake"]
