"""pydatalake_spark — a PySpark-native data-lake analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``legout/pydatalake`` (PyDaLa), re-expressed Spark-first:

- Datasets of parquet/csv/feather files (local or object storage) exposed as
  Spark DataFrames and SQL temp views (reference: ``src/pydala/dataset/reader.py``).
- A fluent ``drop / distinct(keep=first|last) / sort`` transform chain
  (reference: ``src/pydala/dataset/base.py:77-142``).
- Partitioned hive-layout writes with ``raise/overwrite/append/delta`` modes,
  row-count and time-interval batching, per-batch transform hooks
  (reference: ``src/pydala/dataset/writer.py``).
- Schema unification with a numeric→string promotion lattice
  (reference: ``src/pydala/utils/dataset.py:8-50``).
- Snapshot time travel ("TimeFly" semantics) on plain parquet
  (reference: ``src/pydala/dataset/timefly.py``).
- A multi-dataset catalog (reference: ``src/pydala/datalake/manager.py``).
- Beyond-reference LLM-data-pipeline operators: exact & near dedup
  (MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search,
  text analysis, multimodal column plumbing.

Everything is the Spark DataFrame API underneath — Catalyst plans, Tungsten
executes; no custom execution engine.
"""

from pydatalake_spark.session import get_spark, stop_spark
from pydatalake_spark.dataset.table import DataLakeTable
from pydatalake_spark.dataset.writer import write_dataset
from pydatalake_spark.datalake.catalog import DataLake
from pydatalake_spark.operators.asof import asof_join
from pydatalake_spark.operators.dedup import distinct_table, is_unique
from pydatalake_spark.operators.diff import tables_diff
from pydatalake_spark.operators.insert import insert_only_new

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "DataLakeTable",
    "write_dataset",
    "DataLake",
    "asof_join",
    "distinct_table",
    "is_unique",
    "tables_diff",
    "insert_only_new",
    "__version__",
]
