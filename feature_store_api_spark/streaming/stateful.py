"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming surface (its late/duplicate
handling is storage-level upsert, ``core/hudi_engine.py:126-149``); a
training-data pipeline at scale needs *incremental* per-key features —
the canonical example implemented here is an exponentially-weighted
moving average (EWMA) of a value per key:

    y_1 = x_1;   y_n = alpha * x_n + (1 - alpha) * y_{n-1}

Two faces, one semantics:

* :func:`ewma_batch` — offline/backfill. Pure JVM: one shuffle
  (groupBy), ``array_sort`` + a higher-order ``aggregate`` fold — no
  Python in the hot path. The per-key event list is materialized inside
  the aggregate, so memory is O(events-per-key); use it for bounded
  histories and the streaming face for unbounded ones.
* :func:`ewma_stream` — Structured Streaming with
  ``applyInPandasWithState``: state is O(1) per key (the running EWMA
  and a count), Arrow-batched, grows with #keys only — this is the
  100 TB path: a year of events per key costs the same state as one
  event. Within a micro-batch rows are folded in (ts, value) order;
  across batches arrival order is the stream order (exactly the
  semantics of incremental feature materialization).

Determinism contract shared by both faces and the SQL oracle: rows fold
in ``(ts, value)`` order so ties on the event time cannot reorder the
recursion.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ewma_batch", "ewma_stream"]


def ewma_batch(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Final EWMA per key over the full history, JVM-side.

    One row per key: ``keys..., <out_col> double, n bigint``. The fold
    runs inside Catalyst (``aggregate`` higher-order function over the
    time-sorted value array) — whole-stage codegen, no Python workers.
    """
    a = float(alpha)
    if not (0.0 < a <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    pairs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"), F.col(value_col).cast("double").alias("v")
            )
        )
    )
    grouped = df.groupBy(*keys).agg(pairs.alias("_pairs"))
    vals = F.transform(F.col("_pairs"), lambda s: s["v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
    )
    return grouped.select(
        *keys,
        folded.alias(out_col),
        F.size(F.col("_pairs")).cast("bigint").alias("n"),
    )


def ewma_stream(
    stream_df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
    idle_timeout: Optional[str] = None,
) -> DataFrame:
    """Streaming EWMA with O(1) state per key.

    Emits one row per key per micro-batch that touched it (update
    mode): ``keys..., <out_col> double, n bigint`` — the running EWMA
    after folding the batch's rows in (ts, value) order on top of the
    persisted state. Back it with ``foreachBatch`` →
    :class:`~feature_store_api_spark.online.store.OnlineStore` upsert to
    keep an online feature fresh incrementally.

    ``idle_timeout`` (e.g. ``"30 days"``) bounds TOTAL state for
    unbounded key cardinality: a key not seen for that long is evicted
    (processing-time timeout) — the next event for it restarts the fold
    from scratch. Without it, state grows with the number of distinct
    keys ever seen (fine when keys are entities, ruinous when keys are
    e.g. session ids).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    a = float(alpha)
    if not (0.0 < a <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    keys = list(keys)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream_df.schema.fields
        if f.name in keys
    )
    out_schema = f"{key_fields}, {out_col} double, n bigint"
    state_schema = "ewma double, n bigint"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    if idle_timeout:
        from ..operators.time_series import _interval_seconds

        idle_ms = _interval_seconds(idle_timeout) * 1000

    def fold(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ew, n = state.get
        else:
            ew, n = None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
            for v in pdf[value_col].astype(float).tolist():
                ew = v if ew is None else a * v + (1.0 - a) * ew
                n += 1
        state.update((ew, n))
        if idle_timeout:
            state.setTimeoutDuration(idle_ms)
        yield pd.DataFrame(
            [list(key) + [ew, n]], columns=keys + [out_col, "n"]
        )

    return stream_df.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "update", timeout
    )


def ewma_oracle_sql(
    table: str, keys: Sequence[str], ts_col: str, value_col: str, alpha: float,
    out_col: str = "ewma",
) -> str:
    """The DuckDB-checkable form of :func:`ewma_batch` (same fold via
    ``list_reduce`` over the time-ordered value list)."""
    a = float(alpha)
    ks = ", ".join(keys)
    return f"""
        SELECT {ks},
               round(list_reduce(
                   list(CAST({value_col} AS DOUBLE) ORDER BY {ts_col}, {value_col}),
                   (acc, x) -> {a} * x + {1.0 - a} * acc
               ), 6) AS {out_col},
               count(*) AS n
        FROM {table}
        GROUP BY {ks}
    """
