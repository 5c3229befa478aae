"""Query corpus: every operator from SURVEY.md §2 as a (spark, sf_dir) ->
DataFrame callable plus a DuckDB-oracle ANSI SQL equivalent.

``QUERIES``/``ORACLE`` aggregate the per-domain modules; ``__spark_entry__``
re-exports them for the driver's correctness gate.
"""

from pydatalake_spark.queries import relational, text, similarity

QUERIES = {}
ORACLE = {}
for _mod in (relational, text, similarity):
    QUERIES.update(_mod.QUERIES)
    ORACLE.update(_mod.ORACLE)

__all__ = ["QUERIES", "ORACLE"]
