"""Bucketed tables: shuffle-free co-located joins for static feature
tables.

The reference stores offline data in Hudi/Delta and pays a shuffle on
every FG-to-FG join; Spark's native bucketing removes that exchange
entirely when both sides are bucketed on the join keys into the same
bucket count — the join becomes a per-bucket sort-merge with NO
Exchange node (pinned by tests/test_bucketed.py). At 100 TB the win is
the whole shuffle of the larger table, every time the table is joined.

Use for dimension/feature tables that are re-joined often and rewritten
rarely (bucketing is a write-time layout: `bucketBy` requires
`saveAsTable`). The mutable commit store keeps its merge-on-read layout
— buckets would not survive per-commit appends.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int = 64,
    sort_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``keys``. Joining two tables written with the SAME keys
    and bucket count is exchange-free; sorting by the keys additionally
    removes the per-bucket Sort from sort-merge joins."""
    keys = list(keys)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, keys[0], *keys[1:])
    )
    sort_cols = list(sort_by) if sort_by is not None else keys
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides in the catalog, so
    a plain ``spark.table`` keeps the co-location guarantee)."""
    return spark.table(table)
