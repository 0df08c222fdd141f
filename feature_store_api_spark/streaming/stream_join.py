"""Stream-stream interval join.

An extension beyond the reference surface (its streaming path is
ingest-only — ``insert_stream``; see SURVEY.md §2.8): enriching one
event stream with another within a time bound is the standard
Structured Streaming join shape (Spark docs "Inner joins with optional
watermarking"). The SAME function compiles for batch and streaming
inputs — Catalyst plans a plain range-condition join for batch, and a
watermark-bounded symmetric hash join for streams, so batch↔stream
parity is testable (pinned in tests/test_streaming.py).

Scale posture: the join keys shuffle both sides once; the interval
condition bounds stream-side state to the watermark horizon (state is
evicted as the watermark passes ``upper``), so state size is
O(rate × horizon), not O(stream length).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "1 hour",
    upper: str = "0 seconds",
    join_type: str = "inner",
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """Join rows sharing ``keys`` where the right timestamp falls in
    ``[left_ts - lower, left_ts + upper]`` (both SQL interval strings).

    Works on batch AND streaming frames — for streams, set watermarks
    on both inputs first (``df.withWatermark(ts, horizon)``); Spark
    derives state-eviction bounds from the interval condition. Columns
    come back under ``left_alias``/``right_alias`` prefixes via
    ``select(l.*, r.*)``-style resolution — select explicitly from the
    result to disambiguate shared names.
    """
    l = left.alias(left_alias)
    r = right.alias(right_alias)
    conds = [
        F.col(f"{left_alias}.{k}") == F.col(f"{right_alias}.{k}")
        for k in keys
    ]
    lts = F.col(f"{left_alias}.{left_ts}")
    rts = F.col(f"{right_alias}.{right_ts}")
    conds.append(rts >= lts - F.expr(f"INTERVAL {lower}"))
    conds.append(rts <= lts + F.expr(f"INTERVAL {upper}"))
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return l.join(r, on=cond, how=join_type)


def interval_join_stream_files(
    spark,
    left_dir: str,
    right_dir: str,
    schema,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "1 hour",
    upper: str = "0 seconds",
    watermark: str = "10 minutes",
    select: Optional[Sequence] = None,
    table_name: str = "interval_join_out",
) -> DataFrame:
    """Drive :func:`interval_join` as a real streaming query over two
    parquet file-stream sources (availableNow → memory sink) and return
    the materialized result — the bounded-backfill twin of a live
    deployment where both dirs are landing zones. Both sides carry a
    watermark so the state store stays bounded."""
    ls = (
        spark.readStream.schema(schema).parquet(left_dir)
        .withWatermark(left_ts, watermark)
    )
    rs = (
        spark.readStream.schema(schema).parquet(right_dir)
        .withWatermark(right_ts, watermark)
    )
    out = interval_join(ls, rs, keys, left_ts, right_ts, lower, upper)
    if select is not None:
        out = out.select(*select)
    q = (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
