"""Avro Object Container Files without spark-avro — jarless .avro IO.

Implements the OCF layout from the public Avro spec: magic ``Obj\\x01``,
file-metadata map (``avro.schema`` JSON + ``avro.codec: null``), a
16-byte sync marker, then blocks of ``<count long><byte-size long>
<records><sync>``. Records use the binary codec in ``avro_codec.py``.

Write path: ``foreachPartition`` — each task serializes its partition
to ``part-<n>.avro`` under the target directory (works on local FS and
any shared POSIX mount; a cluster with spark-avro available should
prefer the jar's committer-integrated writer — the schemas are
compatible either way, files are standard Avro).

Read path: ``binaryFiles`` → per-file header parse + block decode →
``createDataFrame`` against the Spark schema derived from the embedded
Avro schema. Distributed: each file decodes on an executor.

Parity target: the reference's avro training-dataset format
(``/root/reference/python/hsfs/engine/spark.py:865-919``) which is
plain spark-avro underneath.
"""

from __future__ import annotations

import io
import json
import os
from typing import Dict, Iterator, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .avro_codec import (
    avro_schema_of_df,
    decode,
    encode,
    parse_schema,
)

_MAGIC = b"Obj\x01"
_META_SCHEMA = {"type": "map", "values": "bytes"}
_SYNC = bytes(range(16))  # fixed marker: deterministic output files


def _write_ocf(records: Iterator[dict], schema: Dict, fh) -> int:
    """Stream records into one container file; returns rows written."""
    fh.write(_MAGIC)
    head = io.BytesIO()
    encode(
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": b"null",
        },
        _META_SCHEMA,
        head,
    )
    fh.write(head.getvalue())
    fh.write(_SYNC)
    n_total = 0
    block: List[bytes] = []
    block_bytes = 0
    for rec in records:
        b = encode(rec, schema)
        block.append(b)
        block_bytes += len(b)
        if block_bytes >= 1 << 20:  # ~1 MiB blocks
            _flush_block(fh, block)
            n_total += len(block)
            block, block_bytes = [], 0
    if block:
        _flush_block(fh, block)
        n_total += len(block)
    return n_total


def _flush_block(fh, block: List[bytes]) -> None:
    payload = b"".join(block)
    head = io.BytesIO()
    encode(len(block), "long", head)
    encode(len(payload), "long", head)
    fh.write(head.getvalue())
    fh.write(payload)
    fh.write(_SYNC)


def iter_ocf(buf) -> "tuple[Dict, Iterator[List[dict]]]":
    """STREAMING container read over a seekable binary stream:
    ``(schema, iterator of per-block record lists)``. Memory is one
    decoded avro block (writers flush every ~16-64 KB), not the file —
    the scan path for large avro DATA files. Codecs: ``null`` plus
    ``deflate``/``gzip`` (zlib; what Iceberg's manifest writers emit by
    default) and ``zstandard`` when the module is present."""
    if buf.read(4) != _MAGIC:
        raise ValueError("Not an Avro object container file")
    meta = decode(buf, _META_SCHEMA)
    schema = parse_schema(meta["avro.schema"].decode("utf-8"))
    codec = (meta.get("avro.codec") or b"null").decode("utf-8")
    sync = buf.read(16)

    def blocks() -> Iterator[List[dict]]:
        while True:
            head = buf.read(1)
            if not head:
                break
            buf.seek(-1, io.SEEK_CUR)
            n = decode(buf, "long")
            size = decode(buf, "long")
            if codec == "null":
                block = buf  # records follow inline
            else:
                raw = buf.read(size)
                if codec in ("deflate", "gzip"):
                    import zlib

                    # avro "deflate" is raw DEFLATE (no zlib header)
                    block = io.BytesIO(zlib.decompress(raw, -15))
                elif codec == "zstandard":
                    try:
                        import zstandard
                    except ImportError as exc:
                        raise NotImplementedError(
                            "Avro container uses zstandard codec and "
                            "the zstandard module is unavailable"
                        ) from exc
                    block = io.BytesIO(
                        zstandard.ZstdDecompressor().decompress(raw)
                    )
                else:
                    raise NotImplementedError(
                        f"Avro container codec {codec!r} not supported "
                        "(null/deflate/gzip/zstandard)"
                    )
            yield [decode(block, schema) for _ in range(n)]
            if buf.read(16) != sync:
                raise ValueError("Avro container sync marker mismatch")

    return schema, blocks()


def read_ocf_bytes(data: bytes) -> tuple[Dict, List[dict]]:
    """Parse one container file → (schema, records); the whole-file
    convenience wrapper over :func:`iter_ocf` (manifests and other
    metadata-sized files)."""
    schema, blocks = iter_ocf(io.BytesIO(data))
    out: List[dict] = []
    for recs in blocks:
        out.extend(recs)
    return schema, out


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed jarless write of ``df`` as standard .avro files."""
    if os.path.exists(path):
        if mode == "overwrite":
            import shutil

            shutil.rmtree(path)
        elif mode == "error":
            raise FileExistsError(path)
    os.makedirs(path, exist_ok=True)
    schema = avro_schema_of_df(df, name="row")
    fields = [f.name for f in df.schema.fields]

    def write_partition(idx: int, rows) -> Iterator[int]:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return iter(())  # no empty part files
        import itertools

        def dicts():
            for row in itertools.chain([first], it):
                d = row.asDict(recursive=True)
                yield {k: d.get(k) for k in fields}

        target = os.path.join(path, f"part-{idx:05d}.avro")
        with open(target + ".tmp", "wb") as fh:
            _write_ocf(dicts(), schema, fh)
        os.replace(target + ".tmp", target)
        return iter((idx,))

    # per-partition imperative file IO is the one legitimate RDD use;
    # count() forces execution of every partition
    df.rdd.mapPartitionsWithIndex(write_partition).count()


def _spark_type_of(schema) -> T.DataType:
    """Inverse of avro_codec.avro_schema_of (lossy where Avro is: e.g.
    timestamp-micros comes back as TimestampType)."""
    if isinstance(schema, list):  # union — we only emit [null, T]
        non_null = [s for s in schema if s != "null"]
        return _spark_type_of(non_null[0])
    if isinstance(schema, dict):
        t = schema["type"]
        lt = schema.get("logicalType")
        if lt in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType()
        if lt == "date":
            return T.DateType()
        if t == "array":
            return T.ArrayType(_spark_type_of(schema["items"]))
        if t == "map":
            return T.MapType(T.StringType(), _spark_type_of(schema["values"]))
        if t == "record":
            return T.StructType(
                [
                    T.StructField(f["name"], _spark_type_of(f["type"]), True)
                    for f in schema["fields"]
                ]
            )
        return _spark_type_of(t)
    return {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
        "null": T.NullType(),
    }[schema]


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed jarless read of a directory of .avro files."""
    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".avro")
    ]
    if not files:
        raise FileNotFoundError(f"No .avro files under {path}")
    # schema from the first file's header (all parts share it)
    with open(files[0], "rb") as fh:
        head = fh.read(1 << 16)
    buf = io.BytesIO(head)
    buf.read(4)
    meta = decode(buf, _META_SCHEMA)
    avro_schema = parse_schema(meta["avro.schema"].decode("utf-8"))
    spark_schema = _spark_type_of(avro_schema)
    field_names = [f["name"] for f in avro_schema["fields"]]

    def decode_file(kv):
        _, data = kv
        _, records = read_ocf_bytes(bytes(data))
        for r in records:
            yield tuple(r.get(k) for k in field_names)

    rdd = spark.sparkContext.binaryFiles(path + "/*.avro").flatMap(decode_file)
    return spark.createDataFrame(rdd, schema=spark_schema)
