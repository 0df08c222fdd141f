"""Streaming near-duplicate-gated ingestion.

Extension beyond the reference (its streaming path is
``feature_group.py:2965-3061`` → Kafka → platform materialization; it
has no content dedup): a 100 TB training-data pipeline ingesting a
continuous document stream must drop near-duplicates ONLINE — both
against everything already accepted (the corpus) and within each
micro-batch — without ever re-running a corpus×corpus join.

Design (Structured Streaming + the incremental-LSH machinery from
``operators/dedup``):

* The corpus's LSH state is a persistent **band table**
  ``(id, band, bucket)`` stored as parquet, partitioned by ``band``.
  Signatures are deterministic given (num_hashes, shingle_size, seed),
  so each accepted document's bands are computed exactly ONCE ever and
  appended; a batch's dedup check is an equi-join of the batch band
  table against the stored one — never a recompute of corpus
  signatures, never O(|batch| x |corpus|).
* Each ``foreachBatch``: batch band table (localCheckpointed — it
  feeds the vs-corpus join, the within-batch join, and the accept-side
  append), survivors = anti-join of near-dup ids, exactly-once upsert
  into the feature group by stream batch id (same idempotence contract
  as ``insert_stream``), then the survivors' bands append to the band
  store. A replayed batch id skips BOTH the commit and the band
  append, so state stays consistent under recovery.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import _band_table, minhash_signatures


class StreamingDedupStats:
    """Per-batch acceptance counters (driver-side, observable)."""

    def __init__(self) -> None:
        self.batches = 0
        self.seen = 0
        self.accepted = 0

    @property
    def dropped(self) -> int:
        return self.seen - self.accepted


def streaming_dedup_ingest(
    fg,
    df: DataFrame,
    text_col: str,
    band_store_path: Optional[str] = None,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 13,
    hash_fn: str = "xxhash64",
    query_name: Optional[str] = None,
    output_mode: str = "update",
    await_termination: bool = False,
    timeout: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    trigger: Optional[Dict[str, Any]] = None,
    stats: Optional[StreamingDedupStats] = None,
) -> StreamingQuery:
    """Start a streaming ingest that drops near-duplicates before they
    cost a commit.

    ``fg`` must be a managed feature group with a SINGLE primary key
    (the document id); ``df`` a streaming DataFrame containing that key
    and ``text_col``. Survivor selection within a batch keeps the
    smallest id of each near-dup group (deterministic). Returns the
    ``StreamingQuery``; pass ``stats`` to observe acceptance counts.
    """
    if not df.isStreaming:
        raise ValueError(
            "streaming_dedup_ingest expects a streaming DataFrame; use "
            "dedup_new_against_corpus + fg.insert for batch"
        )
    if len(fg.primary_key) != 1:
        raise ValueError(
            "streaming_dedup_ingest needs a single-column primary key "
            f"(document id); got {fg.primary_key!r}"
        )
    id_col = fg.primary_key[0]
    store = fg.commit_store  # validates the FG is managed
    if band_store_path is None:
        if fg.location is None:
            raise ValueError("band_store_path required for a store-less FG")
        band_store_path = os.path.join(fg.location, "_lsh_bands")
    rows_per_band = num_hashes // bands
    online = None
    if fg.online_enabled:
        from ..online.store import OnlineStore

        online = OnlineStore.for_feature_group(fg)

    # checkpoint-scoped idempotence keys (see insert_stream._stream_marker:
    # bare batch ids restart at 0 per checkpoint and would collide
    # across queries into the same group)
    from .insert_stream import _stream_marker

    marker = _stream_marker(checkpoint_dir)

    def _ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_key = f"{marker}:{batch_id}"
        # idempotence: a replayed batch key already committed AND already
        # wrote its bands — skip both (the bare int matches legacy
        # commits written before keys were checkpoint-scoped)
        if store.has_stream_batch(batch_key, batch_id):
            return
        spark = batch_df.sparkSession
        new_b = _band_table(
            minhash_signatures(
                batch_df, text_col, id_col, num_hashes, shingle_size,
                seed, hash_fn=hash_fn,
            ),
            id_col, bands, rows_per_band, hash_fn,
        ).localCheckpoint(eager=True)

        dup_ids = None
        has_corpus = os.path.isdir(band_store_path) and bool(
            os.listdir(band_store_path)
        )
        if has_corpus:
            corp = spark.read.parquet(band_store_path)
            a, b = new_b.alias("a"), corp.alias("b")
            dup_ids = a.join(
                b,
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.bucket") == F.col("b.bucket"),
                ],
            ).select(F.col(f"a.{id_col}").alias("__dup"))
        # within-batch: keep the smallest id per near-dup group
        n1, n2 = new_b.alias("a"), new_b.alias("b")
        within = n1.join(
            n2,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        ).select(F.col(f"b.{id_col}").alias("__dup"))
        dup_ids = within if dup_ids is None else dup_ids.unionByName(within)
        survivors = batch_df.join(
            dup_ids.distinct().withColumnRenamed("__dup", id_col),
            on=id_col,
            how="left_anti",
        ).localCheckpoint(eager=True)

        n_kept = survivors.count()
        if stats is not None:
            # the batch-size count exists only for the stats observer —
            # without one it was a whole extra scan of the source batch
            # every micro-batch (r15; the kept-count reads the
            # checkpointed survivors and stays)
            stats.batches += 1
            stats.seen += batch_df.count()
            stats.accepted += n_kept

        if not fg._features and n_kept:
            from ..feature import Feature

            fg.set_features(
                [Feature(f.name, f.dataType) for f in survivors.schema.fields]
            )
        # Ordering under crash-recovery: bands FIRST (each batch writes
        # its own ``batch=<id>/`` directory with mode=overwrite, so a
        # replayed batch overwrites its own band files instead of
        # duplicating rows), the commit — which carries the batch id —
        # SECOND. A crash between the two replays the whole batch:
        # has_stream_batch is still false, the recompute reproduces the
        # identical survivors (deterministic signatures), the band
        # overwrite is idempotent, and the commit lands once. An
        # all-duplicate batch writes nothing and is trivially
        # replay-safe.
        if n_kept:
            kept_bands = new_b.join(
                survivors.select(id_col), on=id_col, how="left_semi"
            )
            kept_bands.write.mode("overwrite").parquet(
                os.path.join(band_store_path, f"batch={marker}_{batch_id}")
            )
            store.write(
                survivors, operation="upsert", compute_stats=False,
                extra={"stream_batch_id": batch_key},
            )
            if online is not None:
                online.upsert(survivors)

    writer = (
        df.writeStream.outputMode(output_mode)
        .foreachBatch(_ingest_batch)
        .queryName(query_name or f"dedup_ingest_{fg.name}_{fg.version}")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    query = writer.start()
    if await_termination:
        query.awaitTermination(timeout)
    return query
