"""Cheap, plan-analysis-free parallelism guards.

Compute-bound operators (MinHash shingle hashing, window-token
hashing, per-row cosine folds) must not inherit their parallelism from
the *input file layout* — a single small parquet file scans as ONE
partition and would serialize the whole pass onto one core. The fix is
"repartition UP only": spread across ``defaultParallelism`` when the
source provides fewer partitions, but never coalesce an
already-parallel warehouse layout.

The naive probe for "how many partitions does this frame have" is
``df.rdd.getNumPartitions()`` — which forces full analysis + physical
planning + an RDD conversion of the upstream plan on every operator
call, duplicating Catalyst work (and defeating the reader plan cache)
when the input is a complex query rather than a bare scan. Instead:

- scan-rooted frames: ``df.inputFiles()`` walks the already-analyzed
  plan's file index — no physical planning, no RDD. The file count is
  the scan's parallelism grain (large files split further; the guard
  only needs a *lower-bound* signal to decide "too few").
- frames where ``inputFiles()`` comes back empty (persisted/derived
  plans, generators over scans, non-file sources): fall back to the
  ``rdd.getNumPartitions()`` probe. That pays one driver-side physical
  planning pass (~ms, and for a persisted frame the cached plan makes
  it trivial) — but SKIPPING the guard here is wrong: a persisted
  explode over a one-file scan is ONE cached partition, and running a
  compute-bound operator on it serializes the whole pass onto a single
  core (measured: 3-12x wall on 10x data when this guard skipped).
  Milliseconds of planning vs multiples of executor time.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def estimated_scan_partitions(df: DataFrame) -> Optional[int]:
    """Lower-bound partition estimate for scan-rooted frames, ``None``
    when the frame has no file source (derived/shuffled/checkpointed
    plans — already parallel by construction)."""
    try:
        files = df.inputFiles()
    except Exception:  # non-file sources (rate, memory, createDataFrame)
        return None
    if not files:
        return None
    return len(files)


def repartition_up(
    df: DataFrame, key_col: str, num_partitions: Optional[int] = None
) -> DataFrame:
    """Hash-repartition ``df`` by ``key_col`` across the cluster's
    default parallelism — but ONLY when the frame is scan-rooted with
    fewer files than cores. Never coalesces, never forces an RDD
    conversion; a no-op (the common warehouse case) costs one
    ``inputFiles()`` walk of the analyzed plan."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if not parts or parts <= 1:
        return df
    est = estimated_scan_partitions(df)
    if est is None:
        # derived/persisted/non-file plan: the cheap signal is absent,
        # and guessing "already parallel" serializes single-partition
        # caches — pay the one-off planning probe instead
        try:
            est = df.rdd.getNumPartitions()
        except Exception:
            return df
    if est < parts:
        return df.repartition(parts, key_col)
    return df
