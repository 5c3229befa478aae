"""Perceptual-hash near-dup (operators/multimodal.py:phash_near_dup):
hash math + banded-join exactness over the deterministic fake decode."""

from __future__ import annotations

from pyspark.sql import functions as F

from pydatalake_spark.operators.multimodal import (
    attach_payload,
    perceptual_hashes,
    phash_near_dup,
)

BASE = " ".join(f"tok{i}" for i in range(120))


def _media(spark):
    rows = [
        (1, BASE),
        (2, BASE),                               # exact twin of 1
        # same-length edits to tok5/tok50..tok59 -> 1 gradient bit flips
        (3, BASE.replace("tok5", "xqz5")),
        (4, " ".join(f"other{i}" for i in range(120))),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return attach_payload(df, "doc_id", "text")


def test_hashes_are_deterministic_64bit(spark):
    h1 = {r.media_id: r.phash for r in perceptual_hashes(_media(spark)).collect()}
    h2 = {r.media_id: r.phash for r in perceptual_hashes(_media(spark)).collect()}
    assert h1 == h2
    assert h1[1] == h1[2]          # identical payloads -> identical hash
    assert h1[1] != h1[4]          # unrelated payloads -> different hash


def test_near_dup_pairs_respect_hamming(spark):
    out = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dup(_media(spark), max_hamming=8).collect()
    }
    assert out[(1, 2)] == 0        # exact twins
    assert (1, 3) in out           # local edit -> few gradient bits flip
    assert out[(1, 3)] <= 8
    assert not any(4 in p for p in out)  # unrelated stays unmatched


def test_verify_bounds_candidates(spark):
    # radius 0 keeps only exact twins even though banding proposed (1,3)
    out = phash_near_dup(_media(spark), max_hamming=0).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}


def test_error_stub_raises(spark):
    import pytest

    with pytest.raises(Exception, match="codec"):
        perceptual_hashes(_media(spark), decode_stub="error").collect()


def test_video_near_dup_by_frame_overlap(spark):
    from pydatalake_spark.operators.multimodal import video_near_dup

    long_a = " ".join(f"tok{i}" for i in range(400))
    # same length, last quarter replaced -> frames 0-2 identical, 3 differs
    cut = len(long_a) * 3 // 4
    long_b = long_a[:cut] + "z" * (len(long_a) - cut)
    other = " ".join(f"other{i}" for i in range(400))
    df = spark.createDataFrame(
        [(1, long_a), (2, long_a), (3, long_b), (4, other)],
        "doc_id long, text string",
    )
    media = attach_payload(df, "doc_id", "text")
    out = {
        (r.id_a, r.id_b): r.n_matching_frames
        for r in video_near_dup(media, min_matching_frames=2).collect()
    }
    assert out[(1, 2)] == 4           # identical videos: all frames match
    assert (1, 3) in out and out[(1, 3)] >= 2   # shared prefix frames
    assert not any(4 in p for p in out)


def test_audio_chunk_energy_flags_silence(spark):
    from pydatalake_spark.operators.multimodal import audio_chunk_energy

    loud = bytes(range(200)) * 40          # varied samples -> high RMS
    quiet = bytes([100]) * 8000            # constant -> RMS 0 (silence)
    mixed = loud[:8000] + quiet[:8000]
    df = spark.createDataFrame(
        [(1, bytearray(loud[:8000])), (2, bytearray(quiet)),
         (3, bytearray(mixed))],
        "media_id long, payload binary",
    )
    out = {
        (r.media_id, r.chunk_idx): r
        for r in audio_chunk_energy(df, chunk_samples=8000).collect()
    }
    assert not out[(1, 0)].is_silence and out[(1, 0)].rms > 10
    assert out[(2, 0)].is_silence and out[(2, 0)].rms == 0.0
    assert not out[(3, 0)].is_silence and out[(3, 1)].is_silence
    # overlapping windows: hop 4000 doubles chunk count minus edge
    n_overlap = audio_chunk_energy(
        df.filter("media_id = 3"), chunk_samples=8000, hop_samples=4000
    ).count()
    assert n_overlap == 4  # starts at 0, 4000, 8000, 12000
