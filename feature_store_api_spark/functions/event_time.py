"""Event-time normalization: anything → epoch-millis UTC.

Parity: ``/root/reference/python/hsfs/util.py:185-243``
(``convert_event_time_to_timestamp``) and the Spark-side twin at
``engine/spark.py:758-852``. Unlike the reference's row-at-a-time Python
UDF, the DataFrame-side conversion here stays JVM-side with built-in
functions (``to_timestamp`` / ``unix_millis``) so it survives
whole-stage codegen at 100 TB.
"""

from __future__ import annotations

import datetime as _dt
from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EventTimeLike = Union[str, int, float, _dt.date, _dt.datetime]

_FORMATS = (
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%d %H",
    "%Y-%m-%d",
    "%Y%m%d%H%M%S%f",
    "%Y%m%d%H%M%S",
    "%Y%m%d%H%M",
    "%Y%m%d%H",
    "%Y%m%d",
)


def to_epoch_millis(value: EventTimeLike) -> int:
    """Driver-side scalar normalization (str/int/date/datetime → ms UTC)."""
    if isinstance(value, bool):
        raise TypeError("bool is not an event time")
    if isinstance(value, (int, float)):
        v = int(value)
        # heuristic shared with the reference: values that look like
        # seconds (10 digits) are promoted to millis
        if v < 10_000_000_000:
            v *= 1000
        return v
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        return int(value.timestamp() * 1000)
    if isinstance(value, _dt.date):
        return int(
            _dt.datetime(value.year, value.month, value.day, tzinfo=_dt.timezone.utc).timestamp()
            * 1000
        )
    if isinstance(value, str):
        s = value.strip()
        for fmt in _FORMATS:
            try:
                parsed = _dt.datetime.strptime(s, fmt)
            except ValueError:
                continue
            return int(parsed.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
        raise ValueError(f"Unparseable event time: {value!r}")
    raise TypeError(f"Unsupported event time type: {type(value)}")


def event_time_col_to_millis(col: Column, dtype: T.DataType) -> Column:
    """Column-side normalization — JVM built-ins only, no Python UDF."""
    if isinstance(dtype, T.TimestampType):
        return F.unix_millis(col)
    if isinstance(dtype, T.TimestampNTZType):
        # NTZ → instant via the session tz (pinned UTC)
        return F.unix_millis(col.cast("timestamp"))
    if isinstance(dtype, T.DateType):
        return F.unix_millis(col.cast("timestamp"))
    if isinstance(dtype, (T.LongType, T.IntegerType)):
        return F.when(col < F.lit(10_000_000_000), col * 1000).otherwise(col)
    if isinstance(dtype, T.StringType):
        return F.unix_millis(F.to_timestamp(col))
    raise TypeError(f"Unsupported event-time column type: {dtype}")


def millis_to_timestamp(col: Column) -> Column:
    return F.timestamp_millis(col)
