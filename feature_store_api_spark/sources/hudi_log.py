"""Jarless Hudi LOG-FILE codec (MERGE_ON_READ delta blocks).

Parity: the reference reads MOR tables through hudi-spark jars
(``/root/reference/python/hsfs/core/hudi_engine.py`` only sets reader
options); without jars we implement the log-file format published at
hudi.apache.org/tech-specs/ ("Log File Format"):

* a log file (``.<fileId>_<baseCommitTime>.log.<version>_<writeToken>``)
  is a sequence of blocks, each framed as (all integers BIG-endian,
  Java ``DataOutputStream`` convention)::

      #HUDI#                     6-byte magic
      blocksize      long        bytes after the magic, incl. this? no:
                                 version..trailing-long inclusive
      version        int         log format version (1)
      type           int         HoodieLogBlockType ordinal
      header         map         int count, then per entry:
                                 int key-ordinal, int len, utf8 bytes
      content length long
      content        bytes
      footer         map         same encoding as header
      total size     long        reverse-traversal pointer: the whole
                                 block INCLUDING the magic and the
                                 leading length field (i.e. blocksize
                                 + 14); files written by pre-fix
                                 versions of this module used the
                                 excluding convention (== blocksize),
                                 which the reader also accepts

* block types by ordinal: 0 COMMAND, 1 DELETE, 2 CORRUPT, 3 AVRO_DATA,
  4 HFILE_DATA, 5 PARQUET_DATA, 6 CDC_DATA. Header key ordinals:
  0 INSTANT_TIME, 1 TARGET_INSTANT_TIME, 2 SCHEMA, 3 COMMAND_BLOCK_TYPE.
* AVRO_DATA content (HoodieAvroDataBlock version 3)::

      format version int (3)
      record count   int
      per record:    int length + Avro binary (writer schema = the
                     block header's SCHEMA entry)

AVRO_DATA blocks are resolved to records; DELETE blocks (the
log-routed hard-delete path) are decoded from the published
``HoodieDeleteRecordList`` Avro payload (hudi-common
``HoodieDeleteRecordList.avsc``; serialization version 3+ — the
earlier kryo framings gate loudly) and surface as per-key tombstones;
PARQUET data blocks (``hoodie.logfile.data.block.format=parquet``,
content = a complete in-memory parquet file) decode via pyarrow;
COMMAND blocks of type ROLLBACK_BLOCK invalidate the earlier blocks of
the SAME log file whose instant equals the header's
TARGET_INSTANT_TIME (the tech-specs' rollback rule — rolled-back
instants in OTHER files are already invisible through the
committed-instants filter); other command types gate loudly naming the
target instant. Soft deletes via the standard ``_hoodie_is_deleted``
payload field are honored by the reader's merge. Decoding runs inside
Arrow-batched workers (see ``hudi_reader``); this module is pure
bytes-in/records-out.
"""

from __future__ import annotations

import io
import struct
from typing import Dict, Iterator, List, Optional, Tuple

from .avro_codec import decode as avro_decode
from .avro_codec import encode as avro_encode
from .avro_codec import parse_schema

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1
AVRO_DATA_BLOCK_VERSION = 3

#: HoodieLogBlockType ordinals (tech-specs block-type table)
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3

#: HeaderMetadataType ordinals
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2
H_COMMAND_BLOCK_TYPE = 3

_BLOCK_NAMES = {
    COMMAND_BLOCK: "COMMAND_BLOCK",
    DELETE_BLOCK: "DELETE_BLOCK",
    CORRUPT_BLOCK: "CORRUPT_BLOCK",
    AVRO_DATA_BLOCK: "AVRO_DATA_BLOCK",
    4: "HFILE_DATA_BLOCK",
    5: "PARQUET_DATA_BLOCK",
    6: "CDC_DATA_BLOCK",
}


def _encode_map(entries: Dict[int, str]) -> bytes:
    out = io.BytesIO()
    out.write(struct.pack(">i", len(entries)))
    for k, v in entries.items():
        raw = v.encode("utf-8")
        out.write(struct.pack(">ii", k, len(raw)))
        out.write(raw)
    return out.getvalue()


def _decode_map(buf: io.BytesIO) -> Dict[int, str]:
    (count,) = struct.unpack(">i", buf.read(4))
    out = {}
    for _ in range(count):
        k, ln = struct.unpack(">ii", buf.read(8))
        out[k] = buf.read(ln).decode("utf-8")
    return out


def iter_log_blocks(data: bytes) -> Iterator[Tuple[int, Dict[int, str], bytes]]:
    """Yield ``(block_type, header, content)`` per block, in file
    order, validating the magic and both length fields."""
    buf = io.BytesIO(data)
    n = len(data)
    while buf.tell() < n:
        magic = buf.read(6)
        if magic != MAGIC:
            raise ValueError(
                f"Hudi log: bad magic {magic!r} at offset {buf.tell() - 6}"
            )
        (block_size,) = struct.unpack(">q", buf.read(8))
        start = buf.tell()
        version, btype = struct.unpack(">ii", buf.read(8))
        if version != LOG_FORMAT_VERSION:
            raise NotImplementedError(
                f"Hudi log format version {version} (supported: "
                f"{LOG_FORMAT_VERSION})"
            )
        header = _decode_map(buf)
        (content_len,) = struct.unpack(">q", buf.read(8))
        content = buf.read(content_len)
        _footer = _decode_map(buf)
        (total,) = struct.unpack(">q", buf.read(8))
        consumed = buf.tell() - start
        # trailing long: real Hudi writers record the block INCLUDING
        # the 6-byte magic and the 8-byte leading length (the reverse-
        # traversal pointer); accept the bare-blocksize convention too
        # (files written by earlier versions of this module)
        if consumed != block_size or total not in (
            block_size, block_size + len(MAGIC) + 8
        ):
            raise ValueError(
                f"Hudi log: block length mismatch (leading {block_size}, "
                f"trailing {total}, consumed {consumed})"
            )
        yield btype, header, content


#: hudi-common HoodieDeleteRecordList.avsc (published schema): the
#: payload of a DELETE block since serialization version 3 — an array
#: of (recordKey, partitionPath, orderingVal) tombstones.
DELETE_RECORD_LIST_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [{
        "name": "deleteRecordList",
        "type": {
            "type": "array",
            "items": {
                "type": "record",
                "name": "HoodieDeleteRecord",
                "fields": [
                    {"name": "recordKey",
                     "type": ["null", "string"], "default": None},
                    {"name": "partitionPath",
                     "type": ["null", "string"], "default": None},
                    {"name": "orderingVal",
                     "type": ["null", "string", "int", "long", "float",
                              "double", "bytes", "boolean"],
                     "default": None},
                ],
            },
        },
    }],
}

#: HoodieDeleteBlock serialization versions: 1/2 are kryo-serialized
#: HoodieKey[] / DeleteRecord[] (JVM-only); 3 is the Avro payload above
DELETE_BLOCK_AVRO_VERSION = 3

#: HoodieCommandBlockType ordinals (tech-specs): 0 = ROLLBACK_BLOCK
ROLLBACK_COMMAND = 0


def decode_delete_block(content: bytes) -> List[dict]:
    """HoodieDeleteBlock content -> tombstone dicts ``{recordKey,
    partitionPath, orderingVal}``. Framing per HoodieDeleteBlock:
    ``int version`` + ``int length`` + payload bytes; version >= 3 is
    the Avro ``HoodieDeleteRecordList``, versions 1/2 are kryo (needs
    the JVM runtime — gate loudly rather than miss hard deletes)."""
    buf = io.BytesIO(content)
    (version,) = struct.unpack(">i", buf.read(4))
    if version < DELETE_BLOCK_AVRO_VERSION:
        raise NotImplementedError(
            f"Hudi DELETE_BLOCK serialization version {version} is "
            "kryo-encoded (JVM-only); this jarless reader supports the "
            f"Avro payload (version >= {DELETE_BLOCK_AVRO_VERSION})"
        )
    (ln,) = struct.unpack(">i", buf.read(4))
    payload = buf.read(ln)
    schema = parse_schema(DELETE_RECORD_LIST_SCHEMA)
    decoded = avro_decode(payload, schema)
    return list(decoded.get("deleteRecordList") or [])


PARQUET_DATA_BLOCK = 5


def decode_parquet_data_block(content: bytes) -> List[dict]:
    """HoodieParquetDataBlock content -> record dicts. Per the
    tech-specs, a parquet data block's content IS a complete parquet
    file serialized in memory (``hoodie.logfile.data.block.format=
    parquet``, the columnar log option real writers enable for large
    batches) — pyarrow reads it straight off the buffer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    return pq.read_table(pa.BufferReader(content)).to_pylist()


def decode_avro_data_block(content: bytes, header: Dict[int, str]) -> List[dict]:
    """HoodieAvroDataBlock (v3 framing) -> list of record dicts,
    decoded with the block's own writer schema."""
    schema_json = header.get(H_SCHEMA)
    if not schema_json:
        raise ValueError("Hudi AVRO_DATA_BLOCK carries no SCHEMA header")
    schema = parse_schema(schema_json)
    buf = io.BytesIO(content)
    (fmt,) = struct.unpack(">i", buf.read(4))
    if fmt != AVRO_DATA_BLOCK_VERSION:
        raise NotImplementedError(
            f"Hudi avro data block format version {fmt} (supported: "
            f"{AVRO_DATA_BLOCK_VERSION})"
        )
    (count,) = struct.unpack(">i", buf.read(4))
    out = []
    for _ in range(count):
        (ln,) = struct.unpack(">i", buf.read(4))
        out.append(avro_decode(buf.read(ln), schema))
    return out


def log_records(
    data: bytes,
    committed: Optional[set] = None,
    as_of: Optional[str] = None,
) -> Iterator[Tuple[str, int, int, dict, bool]]:
    """Yield ``(instant, block_seq, record_seq, record, is_delete)``
    for every record in committed, visible blocks of one log file —
    data records from AVRO_DATA blocks (``is_delete=False``) and
    per-key tombstones from DELETE blocks (``is_delete=True``; record
    = ``{recordKey, partitionPath, orderingVal}``).

    Blocks whose instant is uncommitted (failed/inflight write — its
    deltacommit never completed) or after ``as_of`` are SKIPPED: that
    is Hudi's snapshot-isolation rule, not data loss. A COMMAND block
    of type ROLLBACK invalidates the earlier blocks of THIS file whose
    instant equals its TARGET_INSTANT_TIME (the tech-specs' rollback
    rule; other files' rolled-back blocks are already dropped by the
    committed filter). Other command types and columnar
    (HFILE/PARQUET) blocks gate loudly."""
    kept: List[Tuple[int, int, Dict[int, str], bytes]] = []
    for seq, (btype, header, content) in enumerate(iter_log_blocks(data)):
        if btype == CORRUPT_BLOCK:
            continue  # Hudi's own readers skip corrupt blocks
        if btype == COMMAND_BLOCK:
            cmd = int(header.get(H_COMMAND_BLOCK_TYPE, ROLLBACK_COMMAND))
            target = header.get(H_TARGET_INSTANT_TIME, "")
            if cmd != ROLLBACK_COMMAND:
                raise NotImplementedError(
                    f"Hudi COMMAND_BLOCK type {cmd} targeting instant "
                    f"{target!r} is not supported by this jarless "
                    "reader (only ROLLBACK_BLOCK has engine-"
                    "independent semantics)"
                )
            kept = [
                b for b in kept
                if b[2].get(H_INSTANT_TIME, "") != target
            ]
            continue
        if btype > AVRO_DATA_BLOCK and btype != PARQUET_DATA_BLOCK:
            raise NotImplementedError(
                f"Hudi log block type "
                f"{_BLOCK_NAMES.get(btype, btype)} is not supported by "
                "this jarless reader (HFile/CDC log blocks need the "
                "Hudi runtime)"
            )
        kept.append((seq, btype, header, content))
    for seq, btype, header, content in kept:
        instant = header.get(H_INSTANT_TIME, "")
        if committed is not None and instant not in committed:
            continue
        if as_of is not None and instant > str(as_of):
            continue
        if btype == DELETE_BLOCK:
            for i, rec in enumerate(decode_delete_block(content)):
                yield instant, seq, i, rec, True
        elif btype == PARQUET_DATA_BLOCK:
            for i, rec in enumerate(decode_parquet_data_block(content)):
                yield instant, seq, i, rec, False
        else:
            for i, rec in enumerate(
                decode_avro_data_block(content, header)
            ):
                yield instant, seq, i, rec, False


def encode_log_file(
    blocks: List[Tuple[int, Dict[int, str], bytes]]
) -> bytes:
    """Inverse of :func:`iter_log_blocks` — fixture writer for the
    external-shape tests (and a correctness witness for the framing)."""
    out = io.BytesIO()
    for btype, header, content in blocks:
        hdr = _encode_map(header)
        ftr = _encode_map({})
        block_size = 4 + 4 + len(hdr) + 8 + len(content) + len(ftr) + 8
        out.write(MAGIC)
        out.write(struct.pack(">q", block_size))
        out.write(struct.pack(">ii", LOG_FORMAT_VERSION, btype))
        out.write(hdr)
        out.write(struct.pack(">q", len(content)))
        out.write(content)
        out.write(ftr)
        # reverse-traversal pointer: block INCLUDING magic + length
        # field — the convention real Hudi writers use
        out.write(struct.pack(">q", block_size + len(MAGIC) + 8))
    return out.getvalue()


def encode_avro_data_block(
    records: List[dict], schema_json: str, instant: str
) -> Tuple[int, Dict[int, str], bytes]:
    """Build one AVRO_DATA block (v3 framing) for the fixture writer."""
    schema = parse_schema(schema_json)
    buf = io.BytesIO()
    buf.write(struct.pack(">ii", AVRO_DATA_BLOCK_VERSION, len(records)))
    for rec in records:
        raw = avro_encode(rec, schema)
        buf.write(struct.pack(">i", len(raw)))
        buf.write(raw)
    header = {H_INSTANT_TIME: instant, H_SCHEMA: schema_json}
    return AVRO_DATA_BLOCK, header, buf.getvalue()


def encode_delete_block(
    tombstones: List[dict], instant: str
) -> Tuple[int, Dict[int, str], bytes]:
    """Build one DELETE block (Avro HoodieDeleteRecordList payload,
    serialization version 3) for the fixture writer — tombstones are
    ``{recordKey, partitionPath, orderingVal}`` dicts."""
    schema = parse_schema(DELETE_RECORD_LIST_SCHEMA)
    payload = avro_encode(
        {"deleteRecordList": [
            {"recordKey": t.get("recordKey"),
             "partitionPath": t.get("partitionPath"),
             "orderingVal": t.get("orderingVal")}
            for t in tombstones
        ]},
        schema,
    )
    content = struct.pack(
        ">ii", DELETE_BLOCK_AVRO_VERSION, len(payload)
    ) + payload
    return DELETE_BLOCK, {H_INSTANT_TIME: instant}, content


def encode_parquet_data_block(
    records: List[dict], instant: str
) -> Tuple[int, Dict[int, str], bytes]:
    """Build one PARQUET data block (content = an in-memory parquet
    file, per tech-specs) for the fixture writer."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = _io.BytesIO()
    cols = list(records[0]) if records else []
    pq.write_table(
        pa.table({c: [r.get(c) for r in records] for c in cols}), buf
    )
    return PARQUET_DATA_BLOCK, {H_INSTANT_TIME: instant}, buf.getvalue()


def encode_command_block(
    target_instant: str, instant: str
) -> Tuple[int, Dict[int, str], bytes]:
    """Build one ROLLBACK command block for the fixture writer."""
    header = {
        H_INSTANT_TIME: instant,
        H_TARGET_INSTANT_TIME: target_instant,
        H_COMMAND_BLOCK_TYPE: str(ROLLBACK_COMMAND),
    }
    return COMMAND_BLOCK, header, b""
