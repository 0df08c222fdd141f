"""Jarless Delta Lake DELETION VECTOR codec + scan-side row filter.

Parity: the reference reads DV-enabled Delta tables through the
delta-spark jars (``/root/reference/python/hsfs/core/delta_engine.py``,
which only sets reader options); without jars we implement the PUBLIC
formats directly:

* the deletion-vector descriptor + file layout from delta.io
  PROTOCOL.md ("Deletion Vectors" / "Deletion Vector Descriptor
  Schema"): ``storageType`` ``u`` (relative file, Z85 UUID), ``p``
  (absolute path), ``i`` (inline Z85 bytes); on-disk blobs are
  ``<dataSize: 4-byte BE><bitmap bytes><CRC-32: 4-byte BE>`` inside a
  file whose first byte is format-version ``1``;
* the bitmap itself is delta's ``RoaringBitmapArray`` "portable"
  serialization (documented in PROTOCOL.md): ``<magic 1681511377
  (4B LE)> <number of bitmaps (8B LE)> <bitmap_0> <bitmap_1> ...``
  where a 64-bit position ``v`` is deleted iff ``low32(v)`` is in
  ``bitmap[high32(v)]``;
* each 32-bit bitmap follows the public RoaringFormatSpec portable
  format (github.com/RoaringBitmap/RoaringFormatSpec): cookie 12346
  (no run containers, explicit size) or 12347 (run-flag bitset,
  size-1 in the cookie's high 16 bits), descriptive headers,
  optional offset header, then array (sorted u16s), bitset (8 KiB),
  or run (u16 pairs) containers.

Scale shape: DVs are usually SMALL (they exist so writers avoid
rewriting files for point deletes), so the common path decodes them
driver-side like the rest of the log metadata and broadcasts; past a
position budget the reader instead ships the DESCRIPTOR list to the
executors and decodes there (``delta_reader._strip_deleted_rows``), so
a heavily-deleted table has no driver bound at all. Container decode
is numpy-vectorized (``unpackbits`` for bitsets, ``frombuffer`` for
arrays, ``arange`` for runs) — no per-position Python. The row filter
itself is always distributed — a left-anti join of the scan (keyed by
``_metadata.file_path`` + ``_metadata.row_index``, Spark's native
parquet row index) against the decoded positions.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib
from typing import Dict, Iterable, List

import numpy as np

_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

# ZeroMQ Z85 alphabet (public spec Z85, rfc.zeromq.org/spec/32) — the
# encoding PROTOCOL.md mandates for pathOrInlineDv
_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 input length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            acc = acc * 85 + _Z85_DECODE[ch]
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.append("".join(reversed(chunk)))
    return "".join(out)


def _decode_bitmap32(buf: memoryview, pos: int) -> tuple:
    """One 32-bit RoaringBitmap (portable spec) -> (values, next_pos)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        run_flags = bytes(buf[pos : pos + (size + 7) // 8])
        pos += (size + 7) // 8
        has_run = True
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_flags = b""
        has_run = False
    else:
        raise ValueError(f"Unknown RoaringBitmap cookie {cookie}")
    keys: List[int] = []
    cards: List[int] = []
    for _ in range(size):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    if (not has_run) or size >= _NO_OFFSET_THRESHOLD:
        pos += 4 * size  # offset header — containers are sequential anyway
    chunks: List[np.ndarray] = []
    for i in range(size):
        base = np.int64(keys[i]) << 16
        is_run = has_run and bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(
                buf, dtype="<u2", count=2 * n_runs, offset=pos
            ).astype(np.int64).reshape(-1, 2)
            pos += 4 * n_runs
            for start, length in runs:
                chunks.append(base + np.arange(
                    start, start + length + 1, dtype=np.int64
                ))
        elif cards[i] <= 4096:
            vals = np.frombuffer(
                buf, dtype="<u2", count=cards[i], offset=pos
            ).astype(np.int64)
            pos += 2 * cards[i]
            chunks.append(base + vals)
        else:
            bits = np.frombuffer(buf, dtype=np.uint8, count=8192, offset=pos)
            pos += 8192
            chunks.append(
                base
                + np.nonzero(np.unpackbits(bits, bitorder="little"))[0]
            )
    values = (
        np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
    )
    return values, pos


def decode_roaring_bitmap_array(data: bytes) -> np.ndarray:
    """Delta ``RoaringBitmapArray`` portable bytes -> sorted 64-bit
    positions, an ``int64`` numpy array (PROTOCOL.md: bitmap index is
    the position's high32)."""
    buf = memoryview(data)
    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != _MAGIC:
        raise ValueError(
            f"Bad RoaringBitmapArray magic {magic} (want {_MAGIC})"
        )
    (n_bitmaps,) = struct.unpack_from("<q", buf, 4)
    pos = 12
    out: List[np.ndarray] = []
    for idx in range(n_bitmaps):
        vals, pos = _decode_bitmap32(buf, pos)
        out.append((np.int64(idx) << 32) | vals)
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    )


def encode_roaring_bitmap_array(positions: Iterable[int]) -> bytes:
    """Sorted/unsorted 64-bit positions -> Delta portable bytes.

    Emits only array / bitset containers under cookie 12346 — the
    simplest valid portable form, accepted by every spec reader. Used
    by the Delta backend's delete path and the round-trip tests."""
    by_high: Dict[int, Dict[int, List[int]]] = {}
    top = -1
    for p in positions:
        if p < 0:
            raise ValueError(f"negative position {p}")
        hi, lo = p >> 32, p & 0xFFFFFFFF
        by_high.setdefault(hi, {}).setdefault(lo >> 16, []).append(lo & 0xFFFF)
        top = max(top, hi)
    parts = [struct.pack("<iq", _MAGIC, top + 1)]
    for hi in range(top + 1):
        containers = by_high.get(hi, {})
        keys = sorted(containers)
        parts.append(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys)))
        payloads = []
        for k in keys:
            vals = sorted(set(containers[k]))
            parts.append(struct.pack("<HH", k, len(vals) - 1))
            if len(vals) <= 4096:
                payloads.append(struct.pack(f"<{len(vals)}H", *vals))
            else:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                payloads.append(struct.pack("<1024Q", *words))
        # offset header (mandatory for cookie 12346)
        off = (
            4 + 4 + 4 * len(keys) + 4 * len(keys)
        )  # cookie + size + headers + offsets
        for pl in payloads:
            parts.append(struct.pack("<I", off))
            off += len(pl)
        parts.extend(payloads)
    return b"".join(parts)


def dv_relative_path(path_or_inline: str) -> str:
    """``storageType="u"`` pathOrInlineDv -> table-relative file path:
    ``<prefix>/deletion_vector_<uuid>.bin`` (PROTOCOL.md: the last 20
    chars are the Z85 UUID; anything before is a random prefix dir)."""
    prefix, encoded = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(encoded))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def read_dv_positions(table_path: str, descriptor: Dict) -> np.ndarray:
    """Decode one add-action ``deletionVector`` descriptor to deleted
    row positions (sorted ``int64`` numpy array), verifying size and
    CRC-32 for on-disk blobs."""
    storage = descriptor["storageType"]
    size = int(descriptor["sizeInBytes"])
    if storage == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])[:size]
    elif storage in ("u", "p"):
        if storage == "u":
            fpath = os.path.join(
                table_path, dv_relative_path(descriptor["pathOrInlineDv"])
            )
        else:
            fpath = descriptor["pathOrInlineDv"]
        offset = int(descriptor.get("offset") or 0)
        with open(fpath, "rb") as fh:
            if fh.read(1) != b"\x01":
                raise ValueError(f"Unknown DV file format version in {fpath}")
            fh.seek(offset)
            (stored_size,) = struct.unpack(">i", fh.read(4))
            if stored_size != size:
                raise ValueError(
                    f"DV size mismatch in {fpath}: descriptor {size}, "
                    f"file {stored_size}"
                )
            data = fh.read(size)
            (crc,) = struct.unpack(">i", fh.read(4))
        if zlib.crc32(data) & 0xFFFFFFFF != crc & 0xFFFFFFFF:
            raise ValueError(f"DV checksum mismatch in {fpath}")
    else:
        raise NotImplementedError(
            f"Unknown deletion vector storageType {storage!r}"
        )
    positions = decode_roaring_bitmap_array(data)
    card = int(descriptor.get("cardinality", len(positions)))
    if len(positions) != card:
        raise ValueError(
            f"DV cardinality mismatch: descriptor {card}, "
            f"decoded {len(positions)}"
        )
    return positions


def write_dv_file(
    table_path: str, positions_by_rel: Dict[str, List[int]]
) -> Dict[str, Dict]:
    """Write ONE deletion-vector ``.bin`` holding a blob per data file
    and return ``{relative_data_path: descriptor}`` for the add
    actions — the ``storageType="u"`` layout any Delta client reads.
    (Writer utility: external-shape fixtures and round-trip tests.)"""
    u = _uuid.uuid4()
    name = f"deletion_vector_{u}.bin"
    encoded = z85_encode(u.bytes)
    blob = bytearray(b"\x01")
    descriptors: Dict[str, Dict] = {}
    for rel, positions in positions_by_rel.items():
        data = encode_roaring_bitmap_array(positions)
        offset = len(blob)
        blob += struct.pack(">i", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descriptors[rel] = {
            "storageType": "u",
            "pathOrInlineDv": encoded,
            "offset": offset,
            "sizeInBytes": len(data),
            "cardinality": len(set(positions)),
        }
    with open(os.path.join(table_path, name), "wb") as fh:
        fh.write(bytes(blob))
    return descriptors
