"""Z-order (Morton-curve) clustered writes for multi-column data skipping.

Sorting a dataset by one column gives perfect parquet min/max pruning on
that column and none on any other. Interleaving the bits of several columns
into one Morton key and range-partitioning on it (the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, public since Morton 1966 and the
standard multi-dimensional-clustering literature) makes every file cover a
small hyper-rectangle of the key space, so scans filtered on ANY of the
z-columns skip most files.

Everything is Catalyst expressions + one ``repartitionByRange``:

1. one tiny aggregate collects per-column min/max (driver-side scalars —
   bytes, not data);
2. each column linearly scales to an unsigned ``bits``-wide integer lattice
   (nulls map to 0, the lattice origin — they cluster together, which is
   what you want for pruning);
3. the Morton key interleaves the lattice bits ``((v >> i) & 1) <<
   (i * ncols + j)`` — a fixed fan-in of shift/mask terms, all codegen;
4. ``repartitionByRange(n_files, z)`` range-shuffles on the key (Spark
   samples the key distribution, so skewed data still splits evenly) and
   each task writes one z-contiguous file.

Scale: the shuffle is the same single exchange a plain global sort costs;
there is no extra pass. At 100 TB the win is at READ time: per-file
min/max on every z-column stays narrow, so Catalyst's parquet row-group
pruning (and partition-file listing) drops most of the dataset for any
selective predicate on the clustered columns. The reference engine has no
layout clustering beyond hive partitioning (SURVEY.md §2.2) — this is
beyond-reference capability.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: str, mn, mx, bits: int) -> Column:
    """Linear map of [mn, mx] onto the integer lattice [0, 2^bits)."""
    top = (1 << bits) - 1
    c = F.col(col).cast("double")
    # an all-null column aggregates to mn = mx = None: map it (like any
    # constant column) to the lattice origin instead of crashing on
    # float(None) (ADVICE r3)
    if mn is None or mx is None:
        return F.lit(0).cast("long")
    lo = F.lit(float(mn))
    span = float(mx) - float(mn)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = F.floor((c - lo) / F.lit(span) * top).cast("long")
    bounded = F.greatest(F.lit(0), F.least(F.lit(top), scaled))
    # least/greatest SKIP nulls (they don't propagate), so guard explicitly:
    # null -> lattice origin
    return F.when(c.isNull(), F.lit(0)).otherwise(bounded)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> Column:
    """Morton key Column for ``cols`` (numeric / date / timestamp).

    Runs one min/max aggregate on the driver to fix the lattice; the key
    itself is pure shift/mask codegen. ``bits * len(cols)`` must be <= 63.
    """
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    casts = [F.col(c).cast("double") for c in cols]
    stats = df.agg(
        *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(casts)],
        *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(casts)],
    ).collect()[0]
    lattice = [
        _scaled(c, stats[f"mn_{i}"], stats[f"mx_{i}"], bits)
        for i, c in enumerate(cols)
    ]
    ncols = len(cols)
    terms = [
        F.shiftleft(
            F.shiftrightunsigned(v, i).bitwiseAND(F.lit(1)),
            i * ncols + j,
        )
        for j, v in enumerate(lattice)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` z-clustered parquet files.

    Each output file covers a contiguous Morton range, so its per-column
    min/max stats stay narrow on EVERY clustered column.
    """
    z = zorder_key(df, cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
