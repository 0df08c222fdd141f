"""Jarless TFRecord writer/reader (tf.train.Example records).

The reference writes training datasets as TFRecord via the
spark-tensorflow-connector jar (``/root/reference/python/hsfs/
engine/spark.py:865-919``, format ``tfrecord``); that jar is not
available offline. This module implements the two public formats the
connector composes, from their specifications:

* TFRecord framing: ``uint64-LE length, masked-crc32c(length),
  payload, masked-crc32c(payload)`` — mask =
  ``((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)``.
* ``tf.train.Example`` protobuf: Example{1: Features{1: map<string,
  Feature>}}, Feature = oneof BytesList(1)/FloatList(2)/Int64List(3),
  numeric lists packed — encoded with the protobuf wire format
  (varints + length-delimited fields), no protobuf library.

Type mapping mirrors the connector: int/long/boolean → int64_list,
float/double → float_list (float32 — lossy for doubles, as with the
jar), string/binary → bytes_list, arrays of those → multi-value lists.
The reader needs the target Spark schema (the connector's recommended
mode as well — Example features are unordered and untyped on disk).
"""

from __future__ import annotations

import os
import struct as _struct
from typing import Iterator, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# -- crc32c (Castagnoli, table-driven; polynomial 0x82F63B78) ---------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 * (_c & 1))
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- protobuf wire helpers ---------------------------------------------------


def _varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # two's-complement 64-bit
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    if acc >= 1 << 63:  # negative int64
        acc -= 1 << 64
    return acc, pos


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _feature_bytes(values: List[bytes]) -> bytes:
    inner = b"".join(_ld(1, v) for v in values)  # BytesList.value
    return _ld(1, inner)  # Feature.bytes_list


def _feature_floats(values: List[float]) -> bytes:
    packed = b"".join(_struct.pack("<f", float(v)) for v in values)
    inner = _ld(1, packed)  # FloatList.value (packed)
    return _ld(2, inner)  # Feature.float_list


def _feature_ints(values: List[int]) -> bytes:
    packed = b"".join(_varint(int(v)) for v in values)
    inner = _ld(1, packed)  # Int64List.value (packed)
    return _ld(3, inner)  # Feature.int64_list


def _example(features: dict) -> bytes:
    entries = b"".join(
        # map<string, Feature> == repeated entry{1: key, 2: value}
        _ld(1, _ld(1, k.encode("utf-8")) + _ld(2, fb))
        for k, fb in features.items()
    )
    return _ld(1, entries)  # Example.features


_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType)


def _encoder_for(dtype):
    if isinstance(dtype, _INT_TYPES):
        return lambda v: _feature_ints([v])
    if isinstance(dtype, _FLOAT_TYPES):
        return lambda v: _feature_floats([v])
    if isinstance(dtype, T.StringType):
        return lambda v: _feature_bytes([str(v).encode("utf-8")])
    if isinstance(dtype, T.BinaryType):
        return lambda v: _feature_bytes([bytes(v)])
    if isinstance(dtype, T.ArrayType):
        el = dtype.elementType
        if isinstance(el, _INT_TYPES):
            return lambda v: _feature_ints(list(v))
        if isinstance(el, _FLOAT_TYPES):
            return lambda v: _feature_floats(list(v))
        if isinstance(el, T.StringType):
            return lambda v: _feature_bytes([str(x).encode("utf-8") for x in v])
    raise TypeError(f"No TFRecord mapping for Spark type {dtype}")


def write_tfrecord(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed jarless TFRecord write: each task frames its
    partition's rows as tf.train.Example records in part files."""
    if os.path.exists(path):
        if mode == "overwrite":
            import shutil

            shutil.rmtree(path)
        elif mode == "error":
            raise FileExistsError(path)
    os.makedirs(path, exist_ok=True)
    encoders = [(f.name, _encoder_for(f.dataType)) for f in df.schema.fields]

    def write_partition(idx: int, rows) -> Iterator[int]:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return iter(())
        import itertools

        target = os.path.join(path, f"part-{idx:05d}.tfrecord")
        with open(target + ".tmp", "wb") as fh:
            for row in itertools.chain([first], it):
                feats = {}
                for name, enc in encoders:
                    v = row[name]
                    if v is None:
                        continue  # absent feature (connector convention)
                    feats[name] = enc(v)
                payload = _example(feats)
                header = _struct.pack("<Q", len(payload))
                fh.write(header)
                fh.write(_struct.pack("<I", _masked_crc(header)))
                fh.write(payload)
                fh.write(_struct.pack("<I", _masked_crc(payload)))
        os.replace(target + ".tmp", target)
        return iter((idx,))

    df.rdd.mapPartitionsWithIndex(write_partition).count()


# -- read -------------------------------------------------------------------


def _parse_example(payload: bytes) -> dict:
    """Example bytes → {name: list-of-values} (type tag preserved)."""
    out = {}
    pos = 0
    # Example: field 1 (Features)
    tag, pos = _read_varint(payload, pos)
    assert tag >> 3 == 1
    flen, pos = _read_varint(payload, pos)
    end = pos + flen
    while pos < end:
        tag, pos = _read_varint(payload, pos)  # map entry
        elen, pos = _read_varint(payload, pos)
        eend = pos + elen
        name, feat = None, None
        while pos < eend:
            t, pos = _read_varint(payload, pos)
            ln, pos = _read_varint(payload, pos)
            if t >> 3 == 1:
                name = payload[pos:pos + ln].decode("utf-8")
            else:
                feat = payload[pos:pos + ln]
            pos += ln
        if name is not None and feat is not None:
            out[name] = _parse_feature(feat)
    return out


def _parse_feature(data: bytes):
    tag, pos = _read_varint(data, 0)
    kind = tag >> 3  # 1 bytes, 2 float, 3 int64
    ln, pos = _read_varint(data, pos)
    end = pos + ln
    vals = []
    if kind == 1:  # BytesList: repeated length-delimited
        while pos < end:
            _t, pos = _read_varint(data, pos)
            n, pos = _read_varint(data, pos)
            vals.append(data[pos:pos + n])
            pos += n
    elif kind == 2:  # FloatList packed
        _t, pos = _read_varint(data, pos)
        n, pos = _read_varint(data, pos)
        vals = [
            _struct.unpack("<f", data[pos + 4 * i:pos + 4 * i + 4])[0]
            for i in range(n // 4)
        ]
    elif kind == 3:  # Int64List packed
        _t, pos = _read_varint(data, pos)
        n, pos = _read_varint(data, pos)
        stop = pos + n
        while pos < stop:
            v, pos = _read_varint(data, pos)
            vals.append(v)
    return vals


def _record_payloads(data: bytes) -> Iterator[bytes]:
    pos = 0
    n = len(data)
    while pos < n:
        (length,) = _struct.unpack("<Q", data[pos:pos + 8])
        (lcrc,) = _struct.unpack("<I", data[pos + 8:pos + 12])
        if lcrc != _masked_crc(data[pos:pos + 8]):
            raise ValueError("TFRecord length crc mismatch")
        payload = data[pos + 12:pos + 12 + length]
        pos += 12 + length + 4  # skip data crc (checked lazily below)
        yield payload


def read_tfrecord(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Distributed jarless TFRecord read against an explicit schema."""
    fields = [(f.name, f.dataType) for f in schema.fields]

    def decode_file(kv):
        _, data = kv
        for payload in _record_payloads(bytes(data)):
            feats = _parse_example(payload)
            row = []
            for name, dtype in fields:
                vals = feats.get(name)
                if vals is None or len(vals) == 0:
                    row.append(None)
                elif isinstance(dtype, T.ArrayType):
                    row.append(_cast_vals(vals, dtype.elementType))
                else:
                    row.append(_cast_vals(vals, dtype)[0])
            yield tuple(row)

    rdd = spark.sparkContext.binaryFiles(path + "/*.tfrecord").flatMap(decode_file)
    return spark.createDataFrame(rdd, schema=schema)


def _cast_vals(vals, dtype):
    if isinstance(dtype, T.BooleanType):
        return [bool(v) for v in vals]
    if isinstance(dtype, _INT_TYPES):
        return [int(v) for v in vals]
    if isinstance(dtype, _FLOAT_TYPES):
        return [float(v) for v in vals]
    if isinstance(dtype, T.StringType):
        return [v.decode("utf-8") if isinstance(v, bytes) else str(v) for v in vals]
    if isinstance(dtype, T.BinaryType):
        return [bytes(v) for v in vals]
    raise TypeError(f"No TFRecord mapping for Spark type {dtype}")
