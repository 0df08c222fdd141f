"""Structured-Streaming ingestion: ``insert_stream``.

Parity: ``/root/reference/python/hsfs/feature_group.py:2965-3061`` →
``engine/spark.py:398-469`` (output modes, named query, checkpoint dir,
optional awaitTermination). The reference streams Avro-encoded rows to
Kafka and lets a platform job materialize them; here each micro-batch
MERGEs straight into the commit store (and the online materialization)
inside ``foreachBatch`` — one batch id = one commit on both stores, the
exactly-once pattern the reference leaves to the platform
(SURVEY §2.8: late/duplicate data resolved by upsert-by-record-key at
the storage layer, not by watermarks — ``core/hudi_engine.py:126-149``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def _stream_marker(checkpoint_dir: Optional[str]) -> str:
    """Stable-per-checkpoint (random-per-start otherwise) marker that
    scopes stream-batch idempotence keys; see the note in
    :func:`insert_stream`."""
    import hashlib
    import os
    import uuid

    if checkpoint_dir:
        return hashlib.md5(
            os.path.realpath(checkpoint_dir).encode()
        ).hexdigest()[:12]
    return uuid.uuid4().hex[:12]


def insert_stream(
    fg,
    df: DataFrame,
    query_name: Optional[str] = None,
    output_mode: str = "update",
    await_termination: bool = False,
    timeout: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    write_options: Optional[Dict[str, Any]] = None,
    trigger: Optional[Dict[str, Any]] = None,
    dedup_watermark: Optional[str] = None,
    dedup_keys: Optional[Sequence[str]] = None,
) -> StreamingQuery:
    """Start a streaming upsert into a managed feature group.

    ``df`` must be a streaming DataFrame (``df.isStreaming``). Options
    mirror the reference surface; ``trigger`` accepts the kwargs of
    ``DataStreamWriter.trigger`` (e.g. ``{"availableNow": True}`` for
    the bounded-backfill materialization job pattern,
    ``engine/python.py:1411-1421``).

    ``dedup_watermark`` (e.g. ``"10 minutes"``) enables the planned
    SURVEY §2.8 enhancement: ``withWatermark(event_time) +
    dropDuplicates`` upstream of the sink, so exact in-flight duplicates
    are dropped BEFORE they cost a commit — state is bounded by the
    watermark delay. Correctness never depends on it (the storage-level
    upsert by record key already absorbs duplicates, matching the
    reference); it is purely a write-amplification saver.
    ``dedup_keys`` defaults to the record key (primary key + event
    time).
    """
    if not df.isStreaming:
        raise ValueError(
            "insert_stream expects a streaming DataFrame; use fg.insert for batch"
        )
    store = fg.commit_store  # validates the FG is managed
    if dedup_watermark:
        if not fg.event_time:
            raise ValueError("dedup_watermark requires the FG to declare event_time")
        keys = list(
            dedup_keys
            or (fg.primary_key + [fg.event_time])
        )
        df = df.withWatermark(fg.event_time, dedup_watermark).dropDuplicates(keys)
    online = None
    if fg.online_enabled:
        from ..online.store import OnlineStore

        online = OnlineStore.for_feature_group(fg)

    # Idempotence keys are scoped to the CHECKPOINT, not the bare batch
    # id: Spark numbers batches per checkpoint from 0, so two different
    # streaming queries into the same feature group (or a fresh-
    # checkpoint rerun) would collide on batch 0 and the second query's
    # data would be silently SKIPPED as a "replay". Same checkpoint →
    # same marker → true replays still dedupe; no checkpoint → no replay
    # semantics → a unique marker per start.
    marker = _stream_marker(checkpoint_dir)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_key = f"{marker}:{batch_id}"
        # the bare int is the pre-checkpoint-scoping legacy key: a
        # checkpoint recovery spanning the format change must still
        # recognize batches committed under the old scheme
        if store.has_stream_batch(batch_key, batch_id):
            return
        if not fg._features:
            # first data seen for this FG: infer + register the schema,
            # as the batch insert path does (engine/spark.py:1149-1170)
            from ..feature import Feature

            fg.set_features(
                [Feature(f.name, f.dataType) for f in batch_df.schema.fields]
            )
        store.write(
            batch_df, operation="upsert", compute_stats=False,
            extra={"stream_batch_id": batch_key},
        )
        if online is not None:
            online.upsert(batch_df)

    writer = (
        df.writeStream.outputMode(output_mode)
        .foreachBatch(_merge_batch)
        .queryName(query_name or f"insert_stream_{fg.name}_{fg.version}")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    for k, v in (write_options or {}).items():
        writer = writer.option(k, v)

    query = writer.start()
    if await_termination:
        query.awaitTermination(timeout)
    return query


def materialize_from_broker(
    spark,
    fg,
    broker,
    topic: str,
    group: str,
    schema,
    online: bool = False,
):
    """One bounded Kafka→feature-group materialization run.

    The reference's materialization job consumes the FG's online topic
    between the last committed offsets and the current end
    (``core/kafka_engine.py:118-142`` builds that
    ``initialCheckPointString``), Avro-decodes, and upserts. Same flow
    here against any broker exposing ``committed`` / ``end_offsets`` /
    ``read_batch`` / ``commit`` (``sources/fake_kafka.FakeKafkaBroker``
    offline; a real consumer adapter in production).

    Offsets advance ONLY after the feature-group commit lands, so a
    crashed run replays its window — and replay is safe because the
    commit store upserts by record key (at-least-once delivery +
    idempotent merge = effectively exactly-once, the reference's own
    model).

    Returns the FeatureGroupCommit, or None when the window is empty.
    """
    from ..sources.kafka_encode import decode_online_dataframe

    start = broker.committed(topic, group)
    end = broker.end_offsets(topic)
    raw = broker.read_batch(
        spark, topic, starting_offsets=start or None, ending_offsets=end or None
    )
    decoded = decode_online_dataframe(raw, schema)
    if decoded.isEmpty():
        broker.commit(topic, group, end)
        return None
    commit = fg.insert(decoded, compute_stats=False)
    if online:
        from ..online.store import OnlineStore

        OnlineStore.for_feature_group(fg).upsert(decoded)
    broker.commit(topic, group, end)
    return commit
