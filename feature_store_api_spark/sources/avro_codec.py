"""Pure-Python Avro binary codec (no external avro/spark-avro needed).

Implements the Apache Avro 1.11 binary encoding from the public
specification (zigzag varints, IEEE-LE floats, length-prefixed bytes,
block-encoded arrays/maps, index-prefixed unions) for the subset of
types the online encode path uses: null, boolean, int, long, float,
double, bytes, string, record, array, map, union, plus the
timestamp-micros and date logical types.

Why it exists: the reference encodes online rows with spark-avro's
``to_avro`` (``/root/reference/python/hsfs/engine/spark.py:534-580``);
that jar is not available offline, so complex-feature encode would stay
gated. This codec runs inside Arrow-batched ``mapInPandas`` workers —
per-batch Python, not per-row JVM crossings — and is byte-compatible
with any Avro reader given the same schema.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import struct as _struct
from typing import Any, Dict, List, Union

Schema = Union[str, Dict, List]

# ---------------------------------------------------------------------------
# primitive writers
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    """zigzag + base-128 varint (Avro spec: binary encoding, long)."""
    n = (n << 1) if n >= 0 else ((-n - 1) << 1 | 1)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            break


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


# ---------------------------------------------------------------------------
# schema helpers
# ---------------------------------------------------------------------------


def _type_of(schema: Schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _logical(schema: Schema) -> str | None:
    return schema.get("logicalType") if isinstance(schema, dict) else None


def parse_schema(schema: Union[str, Schema]) -> Schema:
    """Accept a JSON string or an already-parsed schema object."""
    if isinstance(schema, str) and schema.lstrip().startswith(("{", "[")):
        return json.loads(schema)
    return schema


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode(value: Any, schema: Schema, out: io.BytesIO | None = None) -> bytes:
    """Encode a Python value to Avro binary under ``schema``."""
    top = out is None
    if out is None:
        out = io.BytesIO()
    t = _type_of(schema)
    if t == "null":
        pass
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        lt = _logical(schema)
        if lt in ("timestamp-micros", "timestamp-millis"):
            scale = 1_000_000 if lt == "timestamp-micros" else 1_000
            if isinstance(value, _dt.datetime):
                v = value if value.tzinfo else value.replace(tzinfo=_dt.timezone.utc)
                value = int(v.timestamp() * scale)
        elif lt == "date" and isinstance(value, _dt.date):
            value = (value - _dt.date(1970, 1, 1)).days
        _write_long(out, int(value))
    elif t == "float":
        out.write(_struct.pack("<f", float(value)))
    elif t == "double":
        out.write(_struct.pack("<d", float(value)))
    elif t == "bytes":
        b = bytes(value)
        _write_long(out, len(b))
        out.write(b)
    elif t == "string":
        b = str(value).encode("utf-8")
        _write_long(out, len(b))
        out.write(b)
    elif t == "record":
        for f in schema["fields"]:
            encode(value.get(f["name"]) if isinstance(value, dict) else getattr(value, f["name"]), f["type"], out)
    elif t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for it in items:
                encode(it, schema["items"], out)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                encode(k, "string", out)
                encode(v, schema["values"], out)
        _write_long(out, 0)
    elif t == "union":
        idx = _union_index(value, schema)
        _write_long(out, idx)
        encode(value, schema[idx], out)
    else:
        raise TypeError(f"Unsupported Avro type {t!r}")
    return out.getvalue() if top else b""


def _union_index(value: Any, union: List[Schema]) -> int:
    if value is None:
        for i, s in enumerate(union):
            if _type_of(s) == "null":
                return i
        raise TypeError("None for a union without null branch")
    non_null = [(i, s) for i, s in enumerate(union) if _type_of(s) != "null"]
    if not non_null:
        raise TypeError("Union has no non-null branch")
    if len(non_null) == 1:
        return non_null[0][0]  # the common [null, T] shape
    # multi-branch union (e.g. Hudi's orderingVal): pick the branch
    # matching the Python type; bool MUST precede int (bool is int)
    for py, names in (
        (bool, {"boolean"}), (str, {"string"}), (bytes, {"bytes"}),
        (int, {"long", "int"}), (float, {"double", "float"}),
    ):
        if isinstance(value, py):
            for i, s in non_null:
                if _type_of(s) in names:
                    return i
            break
    return non_null[0][0]


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode(data: "bytes | io.BytesIO | io.BufferedIOBase", schema: Schema) -> Any:
    # any readable binary stream works (BytesIO, a file handle for the
    # streaming container reader); raw bytes get wrapped
    buf = data if hasattr(data, "read") else io.BytesIO(data)
    t = _type_of(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        v = _read_long(buf)
        lt = _logical(schema)
        if lt == "timestamp-micros":
            return _dt.datetime.fromtimestamp(v / 1_000_000, _dt.timezone.utc)
        if lt == "timestamp-millis":
            return _dt.datetime.fromtimestamp(v / 1_000, _dt.timezone.utc)
        if lt == "date":
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
        return v
    if t == "float":
        return _struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return _struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_read_long(buf))
    if t == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if t == "record":
        return {f["name"]: decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix (spec-permitted)
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(decode(buf, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = decode(buf, "string")
                out[k] = decode(buf, schema["values"])
        return out
    if t == "union":
        return decode(buf, schema[_read_long(buf)])
    raise TypeError(f"Unsupported Avro type {t!r}")


# ---------------------------------------------------------------------------
# Spark schema → Avro schema
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "byte": "int",
    "short": "int",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}


def avro_schema_of(dtype) -> Schema:
    """Avro schema for a Spark DataType (non-nullable form)."""
    from pyspark.sql import types as T

    name = dtype.typeName()
    if name in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[name]
    if name in ("timestamp", "timestamp_ntz"):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if name == "date":
        return {"type": "int", "logicalType": "date"}
    if isinstance(dtype, T.DecimalType):
        # keep it readable cross-engine: decimals as strings
        return "string"
    if isinstance(dtype, T.ArrayType):
        item = avro_schema_of(dtype.elementType)
        return {
            "type": "array",
            "items": ["null", item] if dtype.containsNull else item,
        }
    if isinstance(dtype, T.MapType):
        val = avro_schema_of(dtype.valueType)
        return {
            "type": "map",
            "values": ["null", val] if dtype.valueContainsNull else val,
        }
    if isinstance(dtype, T.StructType):
        return {
            "type": "record",
            "name": "r" + str(abs(hash(dtype.json())) % 10**8),
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", avro_schema_of(f.dataType)]
                    if f.nullable
                    else avro_schema_of(f.dataType),
                }
                for f in dtype.fields
            ],
        }
    raise TypeError(f"No Avro mapping for Spark type {dtype}")


def avro_schema_of_df(df, name: str = "row") -> Dict:
    """Record schema over all columns, every field nullable — mirrors
    the reference's encoded FG schema where each feature is a
    ``[null, T]`` union (``feature_group.py`` avro_schema)."""
    from pyspark.sql import types as T  # noqa: F401

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", avro_schema_of(f.dataType)]}
            for f in df.schema.fields
        ],
    }
