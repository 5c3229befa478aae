"""Vector column builders for embedding similarity (beyond-reference).

All pure Catalyst expressions over ``array<float>`` columns —
``zip_with``/``aggregate`` run inside codegen, no Python. Arithmetic is done
in double (float32 inputs cast exactly) with left-to-right summation, which
is also what the DuckDB oracle computes, so results agree bit-for-bit at the
9-significant-digit comparison tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
