"""Online-path Kafka encode/decode — reference parity without jars.

Parity surface (``/root/reference/python/hsfs/engine/spark.py:507-580``
write side, ``:951-1007`` stream-read decode):

* ``encode_complex_features`` — every array/map/struct feature becomes
  its Avro binary encoding under the feature's own schema
  (``_encode_complex_features``).
* ``encode_online_dataframe`` — the produced record: ``key`` = Avro
  string encoding of the *sorted* primary-key values concatenated as
  strings (the reference's partitioning key contract), ``value`` = Avro
  record of all fields (each a ``[null, T]`` union), plus Kafka-shaped
  ``headers`` (array<struct<key string, value binary>>) carrying the
  feature-group identity.
* ``decode_online_dataframe`` — ``value`` binary back to typed columns.

The reference uses spark-avro's ``to_avro``/``from_avro`` (JVM). That
jar is absent here, so the byte work runs in Arrow-batched
``mapInPandas`` with the pure-Python codec (``avro_codec.py``) — batch
loops, no per-row JVM crossings. On a cluster with spark-avro present
the same schemas drop into ``to_avro``/``from_avro`` unchanged.
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .avro_codec import avro_schema_of, avro_schema_of_df, decode, encode

_KEY_STR = "__key_str"


def _to_py(v):
    """Arrow/pandas cell → plain Python for the codec."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, float) and pd.isna(v):
        return None
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [_to_py(x) for x in v.tolist()]
    if isinstance(v, list):
        return [_to_py(x) for x in v]
    if isinstance(v, dict):
        return {k: _to_py(x) for k, x in v.items()}
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return None
        return v.to_pydatetime()
    return v


def complex_feature_names(df: DataFrame) -> List[str]:
    """Features needing Avro encode before the online sink — parity
    ``feature_group.py`` ``get_complex_features`` (array/map/struct)."""
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def encode_complex_features(df: DataFrame) -> DataFrame:
    """Replace each complex column with its Avro binary encoding under
    ``[null, <feature schema>]`` (parity engine/spark.py:534-549)."""
    cols = complex_feature_names(df)
    if not cols:
        return df
    schemas = {
        f.name: ["null", avro_schema_of(f.dataType)]
        for f in df.schema.fields
        if f.name in cols
    }
    out_fields = [
        T.StructField(f.name, T.BinaryType() if f.name in schemas else f.dataType, True)
        for f in df.schema.fields
    ]
    out_schema = T.StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for c, sch in schemas.items():
                pdf[c] = [encode(_to_py(v), sch) for v in pdf[c]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def decode_complex_features(
    df: DataFrame, original_schema: T.StructType
) -> DataFrame:
    """Inverse of :func:`encode_complex_features` for the given original
    Spark schema."""
    schemas = {
        f.name: (["null", avro_schema_of(f.dataType)], f.dataType)
        for f in original_schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    }
    if not schemas:
        return df

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for c, (sch, _dtype) in schemas.items():
                pdf[c] = [None if v is None else decode(bytes(v), sch) for v in pdf[c]]
            yield pdf

    out = T.StructType(
        [
            T.StructField(
                f.name,
                schemas[f.name][1] if f.name in schemas else f.dataType,
                True,
            )
            for f in df.schema.fields
        ]
    )
    return df.mapInPandas(run, schema=out)


def encode_online_dataframe(
    df: DataFrame,
    primary_key: List[str],
    feature_group_name: str = "",
    feature_group_version: int = 1,
) -> DataFrame:
    """Rows → Kafka-producible (key, value, headers) frame.

    key   = Avro *string* encoding of sorted-pk values concatenated as
            strings (``engine/spark.py:560-569`` — "primary_key array
            should always be sorted").
    value = Avro record over ALL feature columns, each ``[null, T]``.
    headers carry the FG identity (the reference sends projectId /
    featureGroupId / subjectId; standalone we send name / version).
    """
    value_schema = avro_schema_of_df(df, name="value")
    feature_names = [f.name for f in df.schema.fields]
    # pk concat computed JVM-side; Avro string framing added in pandas
    keyed = df.withColumn(
        _KEY_STR, F.concat(*[F.col(k).cast("string") for k in sorted(primary_key)])
    )

    out_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType(), False),
            T.StructField("value", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = [encode(k, "string") for k in pdf[_KEY_STR]]
            cols = {c: pdf[c] for c in feature_names}
            values = [
                encode(
                    {c: _to_py(cols[c].iloc[i]) for c in feature_names},
                    value_schema,
                )
                for i in range(len(pdf))
            ]
            yield pd.DataFrame({"key": keys, "value": values})

    enc = keyed.mapInPandas(run, schema=out_schema)
    name_b = feature_group_name.encode("utf-8")
    version_b = str(feature_group_version).encode("utf-8")
    return enc.withColumn(
        "headers",
        F.array(
            F.struct(
                F.lit("featureGroupName").alias("key"),
                F.lit(name_b).alias("value"),
            ),
            F.struct(
                F.lit("featureGroupVersion").alias("key"),
                F.lit(version_b).alias("value"),
            ),
        ),
    )


def decode_online_dataframe(
    raw: DataFrame, original_schema: T.StructType
) -> DataFrame:
    """Kafka-shaped frame (``value`` binary) → typed feature columns
    (parity of the stream-read decode, engine/spark.py:951-1007)."""
    value_schema = {
        "type": "record",
        "name": "value",
        "fields": [
            {"name": f.name, "type": ["null", avro_schema_of(f.dataType)]}
            for f in original_schema.fields
        ],
    }
    ntz = {
        f.name
        for f in original_schema.fields
        if f.dataType.typeName() == "timestamp_ntz"
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [decode(bytes(v), value_schema) for v in pdf["value"]]
            out = {}
            for f in original_schema.fields:
                col = [r.get(f.name) for r in recs]
                if f.name in ntz:
                    # codec yields tz-aware UTC; NTZ columns store the
                    # same wall-clock reading without a zone
                    col = [
                        None if v is None else v.replace(tzinfo=None) for v in col
                    ]
                out[f.name] = col
            yield pd.DataFrame(out)

    return raw.select("value").mapInPandas(run, schema=original_schema)


__all__ = [
    "complex_feature_names",
    "encode_complex_features",
    "decode_complex_features",
    "encode_online_dataframe",
    "decode_online_dataframe",
]
