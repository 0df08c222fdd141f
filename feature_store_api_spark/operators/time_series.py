"""Per-entity time-series feature operators: lags, deltas, trailing
rolling aggregates.

The reference computes point-in-time features but leaves within-entity
history features (previous value, change since last event, trailing-1h
mean) to the user; a training-data pipeline needs them as first-class
operators. All are single-shuffle window plans: one hash exchange on
the entity key, per-partition sort, whole-stage-codegen window frames —
no Python, no row explosion.

Scale notes (100 TB): the shuffle is on the entity key, so skew follows
the hottest entity. Unlike latest-per-key, these produce one OUTPUT row
per input row, so the map-side-combine trick cannot apply — for
pathological keys, bound the history first (event-time filter) or
pre-aggregate to a coarser grain.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lag_features", "rolling_features"]


def lag_features(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    lags: Sequence[int] = (1,),
    deltas: bool = True,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Previous values and change-since-previous per entity.

    Adds ``<col>_lag<n>`` for each requested lag and (``deltas=True``)
    ``<col>_delta`` = current − lag-1. Ordering is (ts, *tiebreak) so
    ties cannot reorder rows between runs."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df
    for c in value_cols:
        for n in lags:
            out = out.withColumn(f"{c}_lag{n}", F.lag(F.col(c), n).over(w))
        if deltas:
            out = out.withColumn(
                f"{c}_delta", F.col(c) - F.lag(F.col(c), 1).over(w)
            )
    return out


def rolling_features(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    trailing: str = "1 hour",
    aggs: Optional[Dict[str, Column]] = None,
) -> DataFrame:
    """Trailing-range aggregates per row: for each event, aggregate the
    entity's events in ``[t - trailing, t]`` (both ends inclusive —
    Spark ``RANGE BETWEEN`` semantics, mirrored by the SQL oracle).

    Implemented as a RANGE window over epoch MICROSECONDS (whole-second
    truncation would flip boundary rows vs sub-second-precise engines),
    so rows with equal timestamps share one frame regardless of sort
    ties."""
    from pyspark.sql import types as T

    micros = _interval_seconds(trailing) * 1_000_000
    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.TimestampNTZType):
        # TZ-free epoch for naive timestamps
        epoch = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    else:
        epoch = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(epoch)
        .rangeBetween(-micros, 0)
    )
    out = df
    named = aggs or {
        "trailing_cnt": F.count(F.lit(1)),
        "trailing_sum": F.sum(value_col),
        "trailing_avg": F.avg(value_col),
        "trailing_min": F.min(value_col),
        "trailing_max": F.max(value_col),
    }
    for name, expr in named.items():
        out = out.withColumn(name, expr.over(w))
    return out


_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_seconds(spec: str) -> int:
    parts = spec.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _UNITS:
        raise ValueError(
            f"trailing must look like '2 hours', got {spec!r}"
        )
    return int(parts[0]) * _UNITS[parts[1].lower()]
