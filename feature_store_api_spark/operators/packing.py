"""Sequence packing: lay documents out into fixed-size token windows.

LLM training data is packed by concatenating documents in a canonical
order and chunking the stream into ``budget``-token context windows
(documents may span a boundary). The operator therefore reduces to an
EXCLUSIVE running sum of token counts in the canonical order — and a
global prefix sum is the textbook two-phase distributed computation:

1. range-partition by the order key and sort within partitions — each
   partition owns a contiguous key range;
2. per-partition exclusive cumsum (a window PARTITIONED by the physical
   partition id — parallel, no single-task global window);
3. per-partition totals (tiny: one row per partition) are collected,
   their exclusive prefix is broadcast back, and each row's global
   start offset = partition offset + local cumsum.

Cost at scale: one range shuffle + one partition-local sort + a
|partitions|-row collect. No global single-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    num_partitions: int = 64,
) -> DataFrame:
    """Assign each document its position in the packed token stream.

    Documents are packed in ascending ``id_col`` order (the canonical,
    reproducible order). Returns the input columns plus:

    - ``start_token``: exclusive running sum of ``token_col`` — the
      document's offset in the concatenated stream;
    - ``pack_id``: ``start_token // budget`` — the context window the
      document STARTS in;
    - ``pack_offset``: ``start_token % budget``;
    - ``spans_boundary``: true when the document crosses into the next
      window (training loaders then split or mask it).
    """
    ranged = df.repartitionByRange(num_partitions, F.col(id_col)).sortWithinPartitions(
        id_col
    )
    # PIN the partition assignment: repartitionByRange SAMPLES its
    # boundaries, so two separate jobs over the same plan can split the
    # ranges differently — the offsets pass and the output pass must
    # read ONE materialized partitioning or the offsets are junk
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )

    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = with_pid.withColumn(
        "__local_start", F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    )
    # tiny: one row per partition; its exclusive prefix is the global
    # offset of each partition's first document
    totals = (
        local.groupBy("__pid")
        .agg(F.sum(token_col).cast("long").alias("__tot"))
        .collect()
    )
    offsets = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["__tot"] or 0
    off_expr = F.element_at(
        F.create_map(
            *[x for pid, off in sorted(offsets.items()) for x in (F.lit(pid), F.lit(off))]
        ),
        F.col("__pid"),
    )
    start = (off_expr + F.col("__local_start")).cast("long")
    return (
        local.withColumn("start_token", start)
        .withColumn("pack_id", (F.col("start_token") / budget).cast("long"))
        .withColumn(
            "pack_offset", (F.col("start_token") % budget).cast("long")
        )
        .withColumn(
            "spans_boundary",
            (F.col("pack_offset") + F.col(token_col)) > F.lit(budget),
        )
        .drop("__pid", "__local_start")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-size character windows with
    optional overlap — the LLM-pipeline chunking step before
    tokenize/embed. Chunk ``k`` starts ``k * (chunk_size - overlap)``
    chars in (1-based substring), the last chunk may be short, and
    empty/null docs yield no chunks.

    Scale posture: a pure scan-side sequence + posexplode — no shuffle,
    no Python stage; chunking parallelizes per input split and each doc
    emits ~len/stride rows. Plan shape pinned in tests/test_packing.py.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    c = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.floor((F.length(c) - F.lit(1)) / F.lit(stride))
    )
    chunks = F.transform(
        starts, lambda k: F.substring(c, k * F.lit(stride) + F.lit(1), F.lit(chunk_size))
    )
    return (
        df.where(F.length(c) > 0)
        .select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_index", "chunk_text"),
        )
        .withColumn("chunk_chars", F.length("chunk_text"))
    )
