"""Multimodal columns: opaque binary payloads + typed metadata.

Beyond-reference north-star plumbing for image/audio/video data at 100 TB:
media travels as a ``binary`` column next to a metadata struct; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` (one Python worker
per partition, columnar transfer), never row-at-a-time.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this runtime, so the
decode step is stubbed two ways, clearly marked:

- ``decode_stub='error'`` → raises ``NotImplementedError`` naming the
  missing codec (production wiring point);
- ``decode_stub='fake'``  → deterministic pseudo-decode (dimensions/duration
  derived from payload bytes) so the Spark-side plumbing — schema,
  partitioning, UDF signature, Arrow batch shape — is real and testable.

Partitioning note: media blobs make rows huge; `extract_features` keeps the
payload out of its OUTPUT (id + features only), so the shuffle-heavy
downstream (joins, dedup on checksum) moves kilobytes, not media. That —
not the stub — is the part that matters at scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, source_col: str) -> DataFrame:
    """(id, payload binary, meta struct) — the canonical multimodal layout.

    Here the payload is the utf-8 encoding of a text column (the container
    has no media files); with real data this is ``spark.read.format(
    "binaryFile")`` or a parquet binary column.
    """
    payload = F.encode(F.col(source_col), "utf-8")
    meta = F.struct(
        F.length(payload).cast("long").alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def extract_features(
    df: DataFrame,
    decode_stub: str = "fake",
    batch_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over (media_id, payload).

    ``mapInPandas``: each partition streams pandas batches through one
    Python worker; output drops the payload so only narrow features shuffle
    downstream.
    """
    if decode_stub not in ("fake", "error"):
        raise ValueError("decode_stub must be 'fake' or 'error'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "error":
                # production wiring point: PIL.Image.open(io.BytesIO(b)) etc.
                raise NotImplementedError(
                    "media codec not available in this runtime; "
                    "install PIL/ffmpeg and replace the 'fake' decode stub"
                )
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    # deterministic pseudo-decode: "dimensions" from bytes
                    "width": payloads.map(
                        lambda b: (bytes(b)[0] if len(b) else 0) + 1
                    ).astype("int32"),
                    "height": payloads.map(
                        lambda b: (bytes(b)[-1] if len(b) else 0) + 1
                    ).astype("int32"),
                }
            )
            yield out

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
