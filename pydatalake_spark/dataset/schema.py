"""Schema unification with a type-promotion lattice.

Re-implements the semantics of the reference's schema unifier
(``src/pydala/utils/dataset.py:8-50`` pyarrow variant, ``:94-130`` listing +
pairwise unify, ``:133-139`` alphabetical canonicalization) on Spark types:

- union of column names across fragments (a column missing on one side takes
  the other side's type — ``utils/dataset.py:23-32``);
- conflicting primitive types promoted by rank along
  ``int8 < int16 < int32 < int64 < float32 < float64 < string``
  (``utils/dataset.py:8-20``); types outside the lattice rank 0, so the
  first (left) type wins on conflict (``utils/dataset.py:36-44``);
- optional alphabetical field ordering (``sort_schema``).

Spark's builtin ``mergeSchema=true`` handles only the add-missing-columns
case and *errors* on genuine primitive conflicts (e.g. int32 file vs string
file), so unification runs driver-side over per-file parquet footers (cheap:
footer metadata only, parallelizable over files) and the data is then read
per-file with an explicit cast to the promoted schema — the same
read-retry-with-unified-schema flow as ``reader.py:186-188, 228-230``.

At 100 TB the footer scan is a driver-side metadata pass over file paths (a
few bytes per file via pyarrow); the *data* never moves until the final
per-file cast-read, which is a normal distributed parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Promotion rank, mirroring the reference lattice
# (src/pydala/utils/dataset.py:8-20). Unlisted types rank 0 → left wins.
_RANK: dict[str, int] = {
    "boolean": 1,
    "byte": 2,
    "short": 3,
    "integer": 4,
    "long": 5,
    "float": 6,
    "double": 7,
    "string": 8,
}


def promote_types(a: T.DataType, b: T.DataType) -> T.DataType:
    """Pick the more general of two Spark types per the lattice.

    Equal types pass through; timestamp-vs-timestamp with different
    precision resolves to TimestampType; anything unranked keeps the left
    type (rank 0 semantics, ``utils/dataset.py:36-44``).
    """
    if a == b:
        return a
    ra, rb = _RANK.get(a.typeName(), 0), _RANK.get(b.typeName(), 0)
    if ra == 0 and rb == 0:
        # both outside the lattice (timestamps, decimals, arrays...) — left wins
        return a
    return a if ra >= rb else b


def unify_schemas(schemas: list[T.StructType], sort_fields: bool = True) -> T.StructType:
    """Pairwise left-to-right unification of fragment schemas.

    Mirrors ``unify_schemas`` + ``sort_schema`` (``utils/dataset.py:109-139``).
    """
    if not schemas:
        return T.StructType([])
    fields: dict[str, T.DataType] = {}
    order: list[str] = []
    for schema in schemas:
        for f in schema.fields:
            if f.name in fields:
                fields[f.name] = promote_types(fields[f.name], f.dataType)
            else:
                fields[f.name] = f.dataType
                order.append(f.name)
    names = sorted(order) if sort_fields else order
    return T.StructType([T.StructField(n, fields[n], True) for n in names])


def list_fragment_schemas(paths: list[str]) -> list[T.StructType]:
    """Per-file physical schemas from parquet footers (driver-side metadata
    read ≙ ``frag.physical_schema`` listing, ``utils/dataset.py:94-106``)."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    # footer reads are tiny IO-bound requests; a thread pool keeps the
    # driver-side metadata pass O(files/32) wall-clock on object storage
    # (order preserved — unification is left-to-right by contract)
    with ThreadPoolExecutor(max_workers=32) as pool:
        return list(pool.map(lambda p: from_arrow_schema(pq.read_schema(p)), paths))


def read_unified(
    spark: SparkSession,
    paths: list[str],
    sort_fields: bool = True,
) -> tuple[DataFrame, T.StructType]:
    """Read a mixed-schema parquet fileset as one DataFrame with the
    promoted schema (the engine-side retry path of ``reader.py:186-188``).

    Each file is scanned with its own physical schema, cast column-by-column
    to the unified type, missing columns filled with NULL, then
    union-by-name'd. Grouping files by identical physical schema keeps the
    plan small (one scan node per distinct schema, not per file).
    """
    schemas = list_fragment_schemas(paths)
    unified = unify_schemas(schemas, sort_fields=sort_fields)

    by_schema: dict[str, tuple[T.StructType, list[str]]] = {}
    for p, s in zip(paths, schemas):
        key = s.json()
        by_schema.setdefault(key, (s, []))[1].append(p)

    parts: list[DataFrame] = []
    for s, group in by_schema.values():
        df = spark.read.schema(s).parquet(*group)
        cols = []
        have = {f.name for f in s.fields}
        for f in unified.fields:
            if f.name in have:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, unified


def schema_to_dict(schema: T.StructType) -> dict[str, str]:
    """Schema → {name: type_str} for catalog persistence
    (≙ ``utils/dataset.py:142-170`` TOML round-trip)."""
    return {f.name: f.dataType.simpleString() for f in schema.fields}


def schema_from_dict(d: dict[str, str]) -> T.StructType:
    """{name: type_str} → StructType; accepts Spark simpleString names."""
    return T.StructType(
        [T.StructField(k, _parse_type(v), True) for k, v in d.items()]
    )


def _parse_type(s: str) -> T.DataType:
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(s)
