from pydatalake_spark.dataset.table import DataLakeTable
from pydatalake_spark.dataset.writer import write_dataset
from pydatalake_spark.dataset.schema import unify_schemas, promote_types

__all__ = ["DataLakeTable", "write_dataset", "unify_schemas", "promote_types"]
