from pydatalake_spark.operators.dedup import distinct_table
from pydatalake_spark.operators.diff import tables_diff

__all__ = ["distinct_table", "tables_diff"]
