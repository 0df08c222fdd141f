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
- non-scan frames (empty ``inputFiles()``): the plan ends in a shuffle
  or local materialization, which already carries
  ``spark.sql.shuffle.partitions`` / checkpoint partitioning — skip
  the guard entirely.
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
    if est is not None and est < parts:
        return df.repartition(parts, key_col)
    return df
