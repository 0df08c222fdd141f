"""Training-dataset splits.

Parity: random split ``randomSplit(weights, seed)``
(``/root/reference/python/hsfs/engine/spark.py:752-756``), time-series
split = event-time range filters (``engine/spark.py:758-863``,
``training_dataset_split.py:25-29``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.event_time import to_epoch_millis


def random_split(
    df: DataFrame, weights: Dict[str, float], seed: Optional[int] = None
) -> Dict[str, DataFrame]:
    """Named random splits, e.g. ``{"train": .8, "test": .2}``.

    Implemented with a per-row uniform hash draw rather than
    ``randomSplit`` so each split is a deterministic filter of ONE scan
    (``randomSplit`` re-samples per split and needs a cached lineage to
    be consistent). ``rand(seed)`` is seeded per-partition by Spark;
    determinism at 100 TB additionally requires stable partitioning, so
    we draw from a hash of the whole row when ``seed`` is given.
    """
    names = list(weights)
    total = float(sum(weights.values()))
    bounds: List[Tuple[str, float, float]] = []
    acc = 0.0
    for n in names:
        lo = acc / total
        acc += weights[n]
        hi = acc / total
        bounds.append((n, lo, hi))

    if seed is None:
        u = F.rand()
    else:
        # uniform in [0,1) from a 64-bit hash of the full row + seed —
        # reproducible regardless of partitioning/task retries
        u = (F.abs(F.xxhash64(F.struct(*df.columns), F.lit(seed))) % F.lit(1_000_000_000)) / F.lit(
            1_000_000_000.0
        )
    tagged = df.withColumn("__u", u)
    out = {}
    for n, lo, hi in bounds:
        cond = (F.col("__u") >= lo) & (F.col("__u") < hi)
        if n == names[-1]:
            cond = F.col("__u") >= lo  # close the last interval at 1.0
        out[n] = tagged.where(cond).drop("__u")
    return out


def time_series_split(
    df: DataFrame,
    event_time: str,
    splits: Sequence[Tuple[str, object, object]],
) -> Dict[str, DataFrame]:
    """Named time-range splits: ``[(name, start, end), ...]`` with
    start inclusive, end exclusive; bounds accept str/int/date/datetime
    (normalized to epoch-millis UTC, ``util.py:216`` convention)."""
    out = {}
    col = F.col(event_time)
    for name, start, end in splits:
        cond = F.lit(True)
        if start is not None:
            cond = cond & (col >= F.timestamp_millis(F.lit(to_epoch_millis(start))))
        if end is not None:
            cond = cond & (col < F.timestamp_millis(F.lit(to_epoch_millis(end))))
        out[name] = df.where(cond)
    return out


def split_labels(df: DataFrame, labels: Sequence[str]) -> Tuple[DataFrame, DataFrame]:
    """X / y column slice (parity ``engine/spark.py:615-628``)."""
    labels = [l for l in labels]
    x = df.drop(*labels)
    y = df.select(*labels)
    return x, y
