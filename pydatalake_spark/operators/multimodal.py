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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    decode_stub: str = "fake",
) -> DataFrame:
    """Image resize as an Arrow-batched 1→1 payload transform.

    Production wiring point: ``PIL.Image.open(...).resize((w, h))`` per
    payload. The 'fake' stub deterministically truncates/pads the payload
    to ``width*height`` bytes so the binary-in/binary-out batch shape,
    schema, and partitioning are exercised for real. Payload stays in the
    output here by design — resize feeds a write, not a shuffle; keep a
    ``select`` downstream narrow if joining.
    """
    if decode_stub not in ("fake", "error"):
        raise ValueError("decode_stub must be 'fake' or 'error'")
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "image codec not available in this runtime; "
                    "install PIL and replace the 'fake' resize stub"
                )
            resized = pdf["payload"].map(
                lambda b: bytes(b)[:target].ljust(target, b"\0")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            ).astype({"width": "int32", "height": "int32"})

    return df.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    num_frames: int = 4,
    decode_stub: str = "fake",
) -> DataFrame:
    """Video frame sampling: 1 row in → ``num_frames`` rows out.

    Production wiring point: ffmpeg/pyav keyframe extraction. The 'fake'
    stub slices the payload into ``num_frames`` equal chunks, which
    exercises the row-expanding mapInPandas shape (the part that matters
    for partition sizing: output rows ≈ input rows × num_frames, so
    size input partitions accordingly).
    """
    if decode_stub not in ("fake", "error"):
        raise ValueError("decode_stub must be 'fake' or 'error'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "video codec not available in this runtime; "
                    "install ffmpeg/pyav and replace the 'fake' frame stub"
                )
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b)
                step = max(1, len(b) // num_frames)
                for i in range(num_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            ).astype({"frame_idx": "int32"})

    return df.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)

_PHASH_GRID = (8, 9)  # dHash: 8 rows x 9 cols -> 8x8 gradient bits


def perceptual_hashes(
    df: DataFrame,
    decode_stub: str = "fake",
    payload_col: str = "payload",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """64-bit dHash per media payload (difference hash: each bit compares
    horizontally adjacent pixels of a downscaled grayscale image — the
    standard perceptual fingerprint for image near-dedup).

    The HASH MATH is real; only the decode is stubbed: 'fake' "downscales"
    the payload to an 8x9 grid by averaging each of 72 equal byte segments
    — the same box-filter shape as a real grayscale resize, so local edits
    perturb few pixels and small length changes shift averages only
    slightly (the perceptual-locality property the tests pin down).
    Production wiring point: PIL grayscale resize to 9x8 replaces
    ``_fake_pixels`` — nothing else changes.
    """
    if decode_stub not in ("fake", "error"):
        raise ValueError("decode_stub must be 'fake' or 'error'")
    rows, cols = _PHASH_GRID
    n_px = rows * cols
    schema = T.StructType(
        [T.StructField("media_id", T.LongType())]
        + [T.StructField(c, T.IntegerType()) for c in extra_cols]
        + [T.StructField("phash", T.LongType())]
    )

    def _fake_pixels(b: bytes) -> list[int]:
        if not b:
            return [0] * n_px
        bounds = [(i * len(b)) // n_px for i in range(n_px + 1)]
        return [
            sum(b[bounds[i] : bounds[i + 1]])
            // max(1, bounds[i + 1] - bounds[i])
            for i in range(n_px)
        ]

    def _dhash(px: list[int]) -> int:
        h = 0
        for r in range(rows):
            for c in range(cols - 1):
                h = (h << 1) | (px[r * cols + c] > px[r * cols + c + 1])
        # two's-complement into int64 (Spark LongType)
        return h - (1 << 64) if h >= (1 << 63) else h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "image codec not available in this runtime; "
                    "install PIL and replace the 'fake' pixel stub"
                )
            out = {"media_id": pdf["media_id"]}
            for c in extra_cols:
                out[c] = pdf[c].astype("int32")
            out["phash"] = (
                pdf[payload_col]
                .map(lambda b: _dhash(_fake_pixels(bytes(b))))
                .astype("int64")
            )
            yield pd.DataFrame(out)

    return df.select("media_id", *extra_cols, payload_col).mapInPandas(
        run, schema
    )


def phash_near_dup(
    df: DataFrame,
    max_hamming: int = 8,
    decode_stub: str = "fake",
) -> DataFrame:
    """(id_a, id_b, hamming): media pairs whose dHashes differ in at most
    ``max_hamming`` of 64 bits.

    Same banded shape as SimHash text dedup (operators/simhash.py): the
    64-bit hash splits into four 16-bit bands; any pair within Hamming
    distance 3 shares at least one exact band (pigeonhole), and the default
    radius 8 keeps the miss probability of band-blocking low while the
    verify step (codegen ``bit_count(xor)``) keeps output exact. The
    candidate join is a hash equi-join on (band, key) — ids and two longs
    move, never payloads.
    """
    h = perceptual_hashes(df, decode_stub=decode_stub)
    bands = h.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "phash", "bk.band", "bk.key")
    a = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("ha"),
        "band",
        "key",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("hb"),
        "band",
        "key",
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(ham <= max_hamming)
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
    )


def video_near_dup(
    df: DataFrame,
    num_frames: int = 4,
    max_hamming: int = 8,
    min_matching_frames: int = 2,
    decode_stub: str = "fake",
) -> DataFrame:
    """(id_a, id_b, n_matching_frames): video near-duplicates by
    frame-fingerprint overlap — sample ``num_frames`` frames per video,
    dHash each frame, band-block the frame hashes, verify with
    bit_count(xor), and keep video pairs sharing at least
    ``min_matching_frames`` near-identical frames (the standard
    keyframe-fingerprint video dedup recipe, composed entirely from the
    frame sampler and the image pHash machinery above).

    Scale: frames expand rows x num_frames but payloads are dropped right
    after hashing — the candidate join moves (video_id, frame_idx, long)
    triples on 16-bit band keys; the final count is one keyed aggregation.
    """
    frames = sample_frames(df, num_frames=num_frames, decode_stub=decode_stub)
    fh = perceptual_hashes(
        frames,
        decode_stub=decode_stub,
        payload_col="frame",
        extra_cols=("frame_idx",),
    )
    bands = fh.select(
        "media_id",
        "frame_idx",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "frame_idx", "phash", "bk.band", "bk.key")
    a = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("frame_idx").alias("fa"),
        F.col("phash").alias("ha"),
        "band",
        "key",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("frame_idx").alias("fb"),
        F.col("phash").alias("hb"),
        "band",
        "key",
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    matched = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(ham <= max_hamming)
        .select("id_a", "id_b", "fa", "fb")
        .distinct()
    )
    return (
        matched.groupBy("id_a", "id_b")
        .agg(F.count_distinct("fa").alias("n_matching_frames"))
        .filter(F.col("n_matching_frames") >= min_matching_frames)
    )


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("is_silence", T.BooleanType()),
    ]
)


def audio_chunk_energy(
    df: DataFrame,
    chunk_samples: int = 8000,
    hop_samples: int | None = None,
    silence_rms: float = 1.0,
    decode_stub: str = "fake",
) -> DataFrame:
    """Audio chunking + RMS energy screen: 1 row in → chunks out, each
    with its root-mean-square level and a silence flag (the
    voice-activity pre-filter of audio training pipelines: drop silent
    chunks before the expensive ASR/embedding stage).

    Production wiring point: soundfile/ffmpeg PCM decode replaces the
    'fake' stub (payload bytes read as unsigned 8-bit samples, zero-mean
    shifted). The chunk/hop/RMS math is real and runs on whatever the
    decode yields. Overlapping windows via ``hop_samples`` < chunk.

    Scale: the payload is dropped immediately after the energy reduction —
    only (id, idx, two scalars) leave the Python worker, so downstream
    filters/joins move no audio bytes.
    """
    if decode_stub not in ("fake", "error"):
        raise ValueError("decode_stub must be 'fake' or 'error'")
    hop = hop_samples or chunk_samples

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "audio codec not available in this runtime; "
                    "install soundfile/ffmpeg and replace the 'fake' "
                    "PCM stub"
                )
            ids, idxs, ns, rmss, sil = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                samples = bytes(b)  # fake decode: u8 PCM
                pos = 0
                idx = 0
                while pos < len(samples) or idx == 0:
                    chunk = samples[pos : pos + chunk_samples]
                    if not chunk and idx > 0:
                        break
                    mean = sum(chunk) / len(chunk) if chunk else 0.0
                    var = (
                        sum((s - mean) ** 2 for s in chunk) / len(chunk)
                        if chunk
                        else 0.0
                    )
                    rms = var**0.5
                    ids.append(mid)
                    idxs.append(idx)
                    ns.append(len(chunk))
                    rmss.append(rms)
                    sil.append(rms < silence_rms)
                    idx += 1
                    pos += hop
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_idx": idxs,
                    "n_samples": ns,
                    "rms": rmss,
                    "is_silence": sil,
                }
            ).astype(
                {"chunk_idx": "int32", "n_samples": "int64"}
            )

    return df.select("media_id", "payload").mapInPandas(
        run, AUDIO_CHUNK_SCHEMA
    )
