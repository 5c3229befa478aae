"""Structured-Streaming SOURCE for native Delta tables (Spark 4 Python
DataSource API).

``sources/delta.py`` already provides the exactly-once SINK
(``delta_stream_sink`` — txn-action watermark in the log). This module
closes the other half: ``spark.readStream.format("pydelta")`` over a
table written by this engine (or any protocol-compatible writer),
serving each commit's APPENDED rows incrementally with version-based
offsets, so Spark's own checkpointing gives end-to-end exactly-once —
the offset is the Delta version, which is atomic by construction.

Design (and why it scales):

* **Offsets are log versions.** ``latestOffset`` costs one directory
  listing of ``_delta_log`` (no data IO); a micro-batch is the half-open
  version interval ``(start, end]``.
* **One InputPartition per add-file.** ``partitions()`` walks only the
  interval's commit JSONs and emits the added files; executors then read
  their parquet bytes directly and stream them as Arrow RecordBatches —
  the vectorized path through the Python data source (rows never
  materialize one-by-one).
* **Append-only contract, loudly enforced.** A commit that REMOVES data
  with ``dataChange: true`` (overwrite/merge/delete) is not
  representable as an append stream; ``partitions()`` raises the same
  error as :func:`read_delta_changes`, telling the operator to restart
  from a fresh snapshot. OPTIMIZE/REORG commits (``dataChange: false``)
  are skipped by construction. Deletion-vector adds raise likewise.
* **Partition values from the log.** Hive partition columns are not in
  the data files; each partition carries its log ``partitionValues`` and
  the reader attaches them as typed literal columns per batch.

Registration is explicit (Spark sessions don't share Python state):

    from pydatalake_spark.streaming.delta_source import register
    register(spark)
    df = (spark.readStream.format("pydelta")
          .option("path", table)
          .option("startingVersion", "0")   # default: current head
          .load())
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from pydatalake_spark.sources.delta import (
    DeltaProtocolError,
    _commit_path,
    _list_commit_versions,
    _maybe_tuplelist_to_dict,
    _read_commit_actions,
    _resolve_path,
    snapshot,
)


def _cdf_schema(schema: StructType) -> StructType:
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        list(schema.fields)
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
        ]
    )


class DeltaFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        partition_values: dict,
        pcols: list[str],
        schema_json: str,
        change_type: str | None = None,
        commit_version: int | None = None,
        is_cdc_file: bool = False,
    ):
        self.path = path
        self.partition_values = partition_values
        self.pcols = pcols
        self.schema_json = schema_json
        # CDF mode: constant _change_type for add-derived inserts, or
        # is_cdc_file for staged cdc files (which carry their own column)
        self.change_type = change_type
        self.commit_version = commit_version
        self.is_cdc_file = is_cdc_file


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._table = options.get("path")
        if not self._table:
            raise ValueError("pydelta source requires .option('path', ...)")
        self._schema = schema
        self._starting = options.get("startingversion")
        self._cdf = (
            str(options.get("readchangefeed", "false")).lower() == "true"
        )

    # --- offsets ---------------------------------------------------------
    def initialOffset(self) -> dict:
        if self._starting is not None:
            # startingVersion N streams N itself (delta-spark semantics):
            # the interval is (N-1, head]
            return {"version": int(self._starting) - 1}
        return {"version": snapshot(self._table).version}

    def latestOffset(self) -> dict:
        versions = _list_commit_versions(self._table)
        if not versions:
            # checkpoint-only table: the snapshot resolves the head
            return {"version": snapshot(self._table).version}
        return {"version": max(versions)}

    # --- planning --------------------------------------------------------
    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        snap = snapshot(self._table, hi)
        if snap.column_mapping:
            raise DeltaProtocolError(
                "pydelta streaming source does not support columnMapping "
                "tables"
            )
        pcols = snap.partition_columns
        schema_json = snap.metadata["schemaString"]
        parts: list[InputPartition] = []
        for v in range(lo + 1, hi + 1):
            if not os.path.isfile(_commit_path(self._table, v)):
                raise DeltaProtocolError(
                    f"commit {v} is missing (log-cleaned); restart the "
                    "stream from a fresh snapshot"
                )
            actions = _read_commit_actions(self._table, v)
            cdc = [a["cdc"] for a in actions if a.get("cdc")]
            if self._cdf and cdc:
                # mutation commit with CDF coverage: serve the cdc files
                for c in cdc:
                    parts.append(
                        DeltaFilePartition(
                            _resolve_path(self._table, c["path"]),
                            {},
                            pcols,
                            schema_json,
                            commit_version=v,
                            is_cdc_file=True,
                        )
                    )
                continue
            for a in actions:
                rm = a.get("remove")
                if rm and rm.get("dataChange", True):
                    raise DeltaProtocolError(
                        f"version {v} rewrites data (remove with "
                        "dataChange=true) "
                        + (
                            "without cdc coverage"
                            if self._cdf
                            else "— an append stream cannot represent it"
                        )
                        + "; restart from a fresh snapshot"
                    )
                add = a.get("add")
                if not add or not add.get("dataChange", True):
                    continue
                if add.get("deletionVector"):
                    raise DeltaProtocolError(
                        f"version {v} adds a deletion-vector file; "
                        "restart from a fresh snapshot"
                    )
                parts.append(
                    DeltaFilePartition(
                        _resolve_path(self._table, add["path"]),
                        _maybe_tuplelist_to_dict(
                            add.get("partitionValues")
                        ),
                        pcols,
                        schema_json,
                        change_type="insert" if self._cdf else None,
                        commit_version=v if self._cdf else None,
                    )
                )
        return parts

    # --- execution (runs on executors) -----------------------------------
    def read(self, partition: DeltaFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = StructType.fromJson(json.loads(partition.schema_json))
        cdf_mode = (
            partition.is_cdc_file or partition.change_type is not None
        )
        # build the Arrow schema for the FULL logical row (data columns
        # from the file + partition columns from the log, plus the CDF
        # columns in readChangeFeed mode)
        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(
            _cdf_schema(schema) if cdf_mode else schema
        )
        pf = pq.ParquetFile(partition.path)
        pvals = partition.partition_values
        for batch in pf.iter_batches():
            cols = []
            for f in out_schema:
                if f.name == "_change_type":
                    if partition.is_cdc_file:
                        idx = batch.schema.get_field_index("_change_type")
                        cols.append(batch.column(idx).cast(f.type))
                    else:
                        cols.append(
                            pa.array(
                                [partition.change_type] * batch.num_rows,
                                type=f.type,
                            )
                        )
                elif f.name == "_commit_version":
                    cols.append(
                        pa.array(
                            [partition.commit_version] * batch.num_rows,
                            type=f.type,
                        )
                    )
                elif f.name in partition.pcols and (
                    not partition.is_cdc_file
                ):
                    raw = pvals.get(f.name)
                    arr = pa.array([raw] * batch.num_rows, type=pa.string())
                    cols.append(arr.cast(f.type))
                else:
                    idx = batch.schema.get_field_index(f.name)
                    cols.append(batch.column(idx).cast(f.type))
            yield pa.RecordBatch.from_arrays(cols, schema=out_schema)

    def commit(self, end: dict) -> None:
        pass  # progress lives in Spark's checkpoint; the log is immutable


class DeltaStreamDataSource(DataSource):
    """``format("pydelta")`` — streaming source over a native Delta
    table. Batch reads should use :func:`read_delta` (JVM-native scan);
    this source exists for the incremental path."""

    @classmethod
    def name(cls) -> str:
        return "pydelta"

    def schema(self) -> StructType:
        table = self.options.get("path")
        if not table:
            raise ValueError("pydelta source requires .option('path', ...)")
        base = snapshot(table).schema
        if str(
            self.options.get("readchangefeed", "false")
        ).lower() == "true":
            return _cdf_schema(base)
        return base

    def streamReader(self, schema: StructType) -> DeltaStreamReader:
        return DeltaStreamReader(schema, dict(self.options))


def register(spark) -> None:
    """Register the ``pydelta`` format on this session (idempotent)."""
    spark.dataSource.register(DeltaStreamDataSource)
