"""Anti-diff between tables ("which rows of t1 are not in t2").

Semantics from the reference's ``get_tables_diff``
(``src/pydala/utils/table.py:135-210``):

- full-row mode: ``t1 EXCEPT t2`` projected to t1's columns. DuckDB EXCEPT
  is **set semantics** (result deduplicated) and treats NULLs as equal —
  Spark's ``exceptAll`` is bag semantics, so the engine uses
  distinct + null-safe ``left_anti`` (SURVEY §7.3.1).
- subset mode: diff on the key projection only (optionally string-cast for
  type-insensitive compare, ``table.py:160-181``), then recover the FULL
  rows of t1 whose key tuple is in the diff — the reference does this with
  a ``pl.struct(subset).is_in(...)`` semi-join over a *driver-side key
  list* (``table.py:183-185``); here it is a single ``left_anti`` join of
  t1 against t2's distinct keys, which is equivalent and one shuffle (or
  zero when the key side broadcasts). No collect — the reference's key-list
  materialization is fine in-process and fatal at 100 TB.

``EqualNullSafe`` is an equi-join predicate, so Catalyst still plans
broadcast-hash / shuffled-hash / sort-merge for every variant here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _anti(left: DataFrame, right: DataFrame, cols: list[str], cast_str: bool) -> DataFrame:
    """Null-safe left-anti join of ``left`` vs ``right`` on ``cols``,
    returning untouched ``left`` rows."""
    l, r = left.alias("l"), right.alias("r")
    cond = None
    for c in cols:
        lc, rc = F.col(f"l.{c}"), F.col(f"r.{c}")
        if cast_str:
            lc, rc = lc.cast("string"), rc.cast("string")
        term = lc.eqNullSafe(rc)
        cond = term if cond is None else (cond & term)
    return l.join(r, on=cond, how="left_anti").select(
        *[F.col(f"l.{c}").alias(c) for c in left.columns]
    )


def tables_diff(
    t1: DataFrame,
    t2: DataFrame,
    subset: str | Sequence[str] | None = None,
    cast_as_str: bool = False,
) -> DataFrame:
    """Rows of ``t1`` not present in ``t2`` (set semantics, full rows)."""
    if subset is None:
        common = [c for c in t1.columns if c in set(t2.columns)]
        return _anti(t1.distinct(), t2.select(*common).distinct(), common, cast_as_str)
    keys = [subset] if isinstance(subset, str) else list(subset)
    return _anti(t1, t2.select(*keys).distinct(), keys, cast_as_str)
