"""Time-windowed feature aggregation — tumbling, sliding, and session
windows over an event stream, usable identically in batch and in
Structured Streaming (with a watermark for late data).

The reference computes point-in-time features but has no windowed
aggregation engine; a training-data pipeline at scale needs one (e.g.
"count of events per user over the trailing hour"). This module is the
Spark-first answer: ``F.window`` / ``F.session_window`` group-bys that
Catalyst plans as a single hash aggregation — map-side partial aggs,
one shuffle on (key, window), whole-stage codegen. No Python in the
hot path.

Scale notes (100 TB):
- Tumbling windows: each row maps to exactly ONE window → the agg
  carries no row amplification; partial aggregation collapses rows
  before the shuffle.
- Sliding windows: each row maps to ``size/slide`` windows; Spark
  expands scan-side then partially aggregates, so the shuffle carries
  (key, window) partials, not raw rows. Keep ``size/slide`` small
  (2-4×) — amplification is that factor on the MAP side only.
- Session windows: Spark merges per-key sorted runs inside the agg
  (``updatesessionwindow`` plan node); in streaming this is native
  state-store backed, no custom stateful code needed.
- Streaming: ``withWatermark`` bounds state; late rows beyond the
  watermark are dropped instead of growing state forever.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "windowed_agg",
    "session_agg",
    "streaming_windowed_agg",
]


def _std_aggs(value_col: str) -> Dict[str, Column]:
    return {
        "cnt": F.count(F.lit(1)),
        "sum_value": F.sum(value_col),
        "avg_value": F.avg(value_col),
        "min_value": F.min(value_col),
        "max_value": F.max(value_col),
    }


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    window_size: str,
    slide: Optional[str] = None,
    aggs: Optional[Dict[str, Column]] = None,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (``slide`` None) or sliding window aggregation.

    Windows are epoch-aligned (Spark's ``F.window`` contract), so an
    external system bucketing by ``time_bucket``/``date_trunc`` lands
    on identical boundaries. Returns one row per (key..., window)
    with ``window_start``/``window_end`` plus the aggregate columns.
    """
    aggs = aggs or _std_aggs(value_col)
    win = (
        F.window(ts_col, window_size, slide)
        if slide
        else F.window(ts_col, window_size)
    )
    out = df.groupBy(*key_cols, win.alias("w")).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    return out.select(
        *key_cols,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *aggs.keys(),
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap: str,
    aggs: Optional[Dict[str, Column]] = None,
    value_col: str = "value",
) -> DataFrame:
    """Gap-based session windows: events of one key closer than
    ``gap`` apart merge into one session. Uses native
    ``F.session_window`` — per-key sorted-run merge inside the hash
    aggregate, streaming-state-store capable, no UDF.

    Session ``window_start`` is the first event time; Spark defines
    session ``end`` as last event time + gap — exposed as both
    ``window_end`` (that definition) and ``last_ts`` (max event time)
    so consumers can pick either convention.
    """
    aggs = aggs or _std_aggs(value_col)
    out = df.groupBy(*key_cols, F.session_window(ts_col, gap).alias("w")).agg(
        F.max(ts_col).alias("last_ts"),
        *[c.alias(name) for name, c in aggs.items()],
    )
    return out.select(
        *key_cols,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "last_ts",
        *aggs.keys(),
    )


def streaming_windowed_agg(
    stream_df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    window_size: str,
    watermark: str,
    slide: Optional[str] = None,
    aggs: Optional[Dict[str, Column]] = None,
    value_col: str = "value",
) -> DataFrame:
    """Streaming variant: apply a watermark (bounds state, drops rows
    later than ``watermark`` behind the max seen event time), then the
    same windowed aggregation. Append output mode emits each window
    exactly once, when the watermark passes its end — the shape a
    feature-group materialization job wants (each window row is final,
    so the foreachBatch upsert is idempotent per window)."""
    wm = stream_df.withWatermark(ts_col, watermark)
    return windowed_agg(
        wm, ts_col, key_cols, window_size, slide=slide, aggs=aggs, value_col=value_col
    )
