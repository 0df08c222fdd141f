"""Ingest-time DataFrame normalization.

Parity: ``/root/reference/python/hsfs/engine/spark.py:264-347``
(``convert_to_default_dataframe``): accept Spark/pandas input, sanitize
column names (lowercase, underscores), force nullability, pin UTC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
        df = df.select([F.col("`" + c.replace("`", "``") + "`").alias(n)
                        for c, n in renames.items()])
    # nullability relaxation (parity engine/spark.py:302-338) is left to
    # the writers: parquet stores every committed column as optional, so
    # forcing nullable here would only add an RDD round-trip
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
