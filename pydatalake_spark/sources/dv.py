"""Deletion-vector codec for the Delta protocol (delta-io PROTOCOL.md,
"Deletion Vectors" — public spec; no delta-spark/delta-rs involved).

A deletion vector (DV) marks rows of one data file as deleted WITHOUT
rewriting the file — the at-scale point: deleting 0.1% of a 100-TB table
touches kilobytes of bitmap, not terabytes of parquet. The bitmap is a
64-bit RoaringBitmapArray over the file's physical row indexes.

Layout implemented here (from the spec's serialization description):

* **DV blob** = ``int32 LE magic (1681511377)`` + 64-bit
  RoaringBitmapArray in the *portable* format: ``int64 LE`` count of
  32-bit buckets, then per bucket ``int32 LE`` high key followed by a
  standard 32-bit RoaringBitmap portable serialization (the
  RoaringFormatSpec: cookie 12346 "no run containers" / 12347 "with
  runs", descriptive headers of ``uint16 key, uint16 cardinality-1``,
  optional offset table, then array (sorted ``uint16``), bitmap
  (1024 × ``uint64``) or run (``uint16 count`` + start/length-1 pairs)
  containers — all little-endian).
* **DV file** (``storageType`` ``u``/``p``): one format-version byte
  (``1``), then per stored DV at ``offset``: ``int32 BE`` blob size,
  the blob, ``int32 BE`` CRC-32 of the blob.
* ``storageType`` ``u``: ``pathOrInlineDv`` = optional random prefix +
  Z85-encoded 16-byte UUID; the file lives at
  ``<table>/<prefix>/deletion_vector_<uuid>.bin``.
* ``storageType`` ``i``: ``pathOrInlineDv`` = Z85-encoded blob inline.
* ``storageType`` ``p``: absolute path to the DV file.

Encode + decode are both implemented (decode for foreign tables, encode
for ``delete_rows_dv`` and test fixtures) and pinned to each other by
roundtrip property tests plus hand-computed byte-level vectors in
``tests/test_dv.py``. The writer always emits the no-run cookie with an
offset table; the reader accepts all three container kinds and both
cookies.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

MAGIC = 1681511377  # DV blob magic, little-endian int32
SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE_RUN = 12347
NO_OFFSET_THRESHOLD = 4
ARRAY_MAX = 4096  # array container cardinality bound
FORMAT_VERSION = 1

# --------------------------------------------------------------------------
# Z85 (ZeroMQ base-85; the spec's uuid/inline encoding)
# --------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 encodes 4-byte groups; got {len(data)} bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, rem = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 decodes 5-char groups; got {len(text)} chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character: {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# --------------------------------------------------------------------------
# 32-bit RoaringBitmap portable (de)serialization
# --------------------------------------------------------------------------


def _serialize_rb32(values: list[int]) -> bytes:
    """Portable bytes for one 32-bit bitmap; ``values`` sorted unique."""
    # group into containers by high-16 key
    containers: list[tuple[int, list[int]]] = []
    cur_key: int | None = None
    cur: list[int] = []
    for v in values:
        k = v >> 16
        if k != cur_key:
            if cur_key is not None:
                containers.append((cur_key, cur))
            cur_key, cur = k, []
        cur.append(v & 0xFFFF)
    if cur_key is not None:
        containers.append((cur_key, cur))

    n = len(containers)
    out = bytearray()
    out += struct.pack("<ii", SERIAL_COOKIE_NO_RUN, n)
    for key, vals in containers:
        out += struct.pack("<HH", key, len(vals) - 1)
    # offset table (always written with the no-run cookie)
    header_len = 8 + 4 * n + 4 * n
    pos = header_len
    body = bytearray()
    for _key, vals in containers:
        out += struct.pack("<I", pos)
        if len(vals) <= ARRAY_MAX:
            body += struct.pack(f"<{len(vals)}H", *vals)
            pos += 2 * len(vals)
        else:
            words = [0] * 1024
            for low in vals:
                words[low >> 6] |= 1 << (low & 63)
            body += struct.pack("<1024Q", *words)
            pos += 8192
    return bytes(out + body)


def _deserialize_rb32(buf: bytes, off: int) -> tuple[list[int], int]:
    """Decode one 32-bit bitmap at ``buf[off:]``; returns (values,
    bytes consumed)."""
    start = off
    (cookie,) = struct.unpack_from("<i", buf, off)
    run_bitset = b""
    if (cookie & 0xFFFF) == SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        off += 4
        nbytes = (n + 7) // 8
        run_bitset = buf[off : off + nbytes]
        off += nbytes
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, off + 4)
        off += 8
    else:
        raise ValueError(f"bad roaring cookie: {cookie}")

    keys: list[int] = []
    cards: list[int] = []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, off)
        keys.append(k)
        cards.append(c + 1)
        off += 4
    has_offsets = cookie == SERIAL_COOKIE_NO_RUN or n >= NO_OFFSET_THRESHOLD
    if has_offsets:
        off += 4 * n  # we read containers sequentially; offsets unused

    def is_run(i: int) -> bool:
        return bool(run_bitset) and bool(run_bitset[i // 8] & (1 << (i % 8)))

    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        card = cards[i]
        if is_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(n_runs):
                s, ln = struct.unpack_from("<HH", buf, off)
                off += 4
                values.extend(base + v for v in range(s, s + ln + 1))
        elif card <= ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, off)
            off += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, off)
            off += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return values, off - start


# --------------------------------------------------------------------------
# 64-bit RoaringBitmapArray blob
# --------------------------------------------------------------------------


def serialize_dv(row_indexes) -> bytes:
    """DV blob (magic + portable 64-bit RoaringBitmapArray) for a set of
    row indexes."""
    rows = sorted(set(int(r) for r in row_indexes))
    if rows and rows[0] < 0:
        raise ValueError("row indexes must be non-negative")
    buckets: dict[int, list[int]] = {}
    for r in rows:
        buckets.setdefault(r >> 32, []).append(r & 0xFFFFFFFF)
    out = bytearray()
    out += struct.pack("<i", MAGIC)
    out += struct.pack("<q", len(buckets))
    for key in sorted(buckets):
        out += struct.pack("<i", key)
        out += _serialize_rb32(buckets[key])
    return bytes(out)


def deserialize_dv(blob: bytes) -> list[int]:
    """Row indexes from a DV blob (sorted ascending)."""
    if len(blob) < 12:
        raise ValueError(f"DV blob too short: {len(blob)} bytes")
    (magic,) = struct.unpack_from("<i", blob, 0)
    if magic != MAGIC:
        raise ValueError(f"bad DV magic: {magic} (expected {MAGIC})")
    (n_buckets,) = struct.unpack_from("<q", blob, 4)
    off = 12
    out: list[int] = []
    for _ in range(n_buckets):
        (key,) = struct.unpack_from("<i", blob, off)
        off += 4
        vals, used = _deserialize_rb32(blob, off)
        off += used
        base = key << 32
        out.extend(base + v for v in vals)
    return out


# --------------------------------------------------------------------------
# DV file IO + descriptor resolution
# --------------------------------------------------------------------------


def write_dv_file(table: str, row_indexes) -> dict:
    """Write one DV as its own ``deletion_vector_<uuid>.bin`` file under
    ``table`` and return the ``deletionVector`` descriptor for the add
    action (storageType ``u``)."""
    blob = serialize_dv(row_indexes)
    uid = _uuid.uuid4()
    name = f"deletion_vector_{uid}.bin"
    path = os.path.join(table, name)
    offset = 1  # directly after the format-version byte
    with open(path, "wb") as f:
        f.write(bytes([FORMAT_VERSION]))
        f.write(struct.pack(">i", len(blob)))
        f.write(blob)
        f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(uid.bytes),
        "offset": offset,
        "sizeInBytes": len(blob),
        "cardinality": len(set(int(r) for r in row_indexes)),
    }


def inline_dv_descriptor(row_indexes) -> dict:
    """``storageType: i`` descriptor carrying the blob inline (small DVs;
    the spec allows either form)."""
    blob = serialize_dv(row_indexes)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(
            blob + b"\x00" * (-len(blob) % 4)  # pad to the z85 group size
        ),
        "sizeInBytes": len(blob),
        "cardinality": len(set(int(r) for r in row_indexes)),
    }


def _dv_file_path(table: str, dv: dict) -> str:
    st = dv.get("storageType")
    raw = dv["pathOrInlineDv"]
    if st == "p":
        return raw
    # storageType u: <random prefix><z85 uuid>; the uuid is the LAST 20
    # chars (16 bytes -> 20 z85 chars), anything before is a directory
    # prefix used for object-store key spreading
    enc, prefix = raw[-20:], raw[:-20]
    uid = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{uid}.bin"
    return os.path.join(table, prefix, name) if prefix else os.path.join(
        table, name
    )


def read_dv_descriptor(table: str, dv: dict) -> list[int]:
    """Resolve a ``deletionVector`` descriptor to its row indexes."""
    st = dv.get("storageType")
    size = dv.get("sizeInBytes")
    if st == "i":
        blob = z85_decode(dv["pathOrInlineDv"])
        if size is not None:
            blob = blob[:size]  # strip the z85 alignment padding
        return deserialize_dv(blob)
    if st in ("u", "p"):
        path = _dv_file_path(table, dv)
        offset = dv.get("offset", 1)
        with open(path, "rb") as f:
            f.seek(offset)
            (blob_len,) = struct.unpack(">i", f.read(4))
            if size is not None and blob_len != size:
                raise ValueError(
                    f"DV size mismatch at {path}:{offset}: file says "
                    f"{blob_len}, descriptor says {size}"
                )
            blob = f.read(blob_len)
            (crc,) = struct.unpack(">I", f.read(4))
        if zlib.crc32(blob) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV checksum mismatch: {path}:{offset}")
        return deserialize_dv(blob)
    raise ValueError(f"unknown DV storageType: {st!r}")
