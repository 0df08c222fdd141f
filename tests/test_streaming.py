"""Structured-Streaming ingestion: file source → insert_stream
(foreachBatch upsert) with the availableNow bounded-backfill trigger,
offline+online consistency, and batch-id replay idempotence."""

import os

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark import FeatureStore
from feature_store_api_spark.streaming.insert_stream import insert_stream


@pytest.fixture()
def stream_setup(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 100, 1.0), (2, 100, 2.0), (1, 200, 10.0)],
        "pk long, ts long, v double",
    ).coalesce(1).write.parquet(src)
    fs = FeatureStore(root=str(tmp_path / "fs"))
    fg = fs.create_feature_group(
        "stream_fg", primary_key=["pk"], event_time="ts", online_enabled=True
    )
    return src, fg


def _run_stream(spark, src, fg, checkpoint):
    sdf = (
        spark.readStream.schema("pk long, ts long, v double").parquet(src)
    )
    q = insert_stream(
        fg,
        sdf,
        trigger={"availableNow": True},
        checkpoint_dir=checkpoint,
        await_termination=True,
        timeout=120,
    )
    return q


def test_available_now_backfill(spark, stream_setup, tmp_path):
    src, fg = stream_setup
    _run_stream(spark, src, fg, str(tmp_path / "ckpt"))

    # offline: upsert-by-record-key keeps (pk, ts) grain → 3 rows
    snap = fg.read(spark)
    assert snap.count() == 3

    # online: latest value per pk
    from feature_store_api_spark.online.store import OnlineStore

    online = OnlineStore.for_feature_group(fg).read(spark)
    got = {r["pk"]: r["v"] for r in online.collect()}
    assert got == {1: 10.0, 2: 2.0}


def test_checkpoint_replay_is_idempotent(spark, stream_setup, tmp_path):
    src, fg = stream_setup
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, src, fg, ckpt)
    commits_before = len(fg.commit_details())
    # same checkpoint, no new files → no new batches, no new commits
    _run_stream(spark, src, fg, ckpt)
    assert len(fg.commit_details()) == commits_before
    assert fg.read(spark).count() == 3


def test_new_file_picked_up_incrementally(spark, stream_setup, tmp_path):
    src, fg = stream_setup
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, src, fg, ckpt)
    spark.createDataFrame([(3, 300, 30.0)], "pk long, ts long, v double").coalesce(
        1
    ).write.mode("append").parquet(src)
    _run_stream(spark, src, fg, ckpt)
    snap = fg.read(spark)
    assert snap.count() == 4
    assert snap.where(F.col("pk") == 3).first()["v"] == 30.0


def test_dedup_watermark_drops_inflight_duplicates(spark, tmp_path):
    """withWatermark+dropDuplicates upstream of the sink: exact
    duplicate records die before costing a commit; the snapshot is
    unchanged (storage upsert would have absorbed them anyway)."""
    import datetime as dt

    src = str(tmp_path / "src_wm")
    t1 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t2 = dt.datetime(2024, 1, 1, 0, 1, 0)
    spark.createDataFrame(
        [(1, t1, 1.0), (1, t1, 1.0), (1, t1, 1.0), (2, t1, 2.0), (1, t2, 10.0)],
        "pk long, ets timestamp, v double",
    ).coalesce(1).write.parquet(src)
    fs = FeatureStore(root=str(tmp_path / "fs_wm"))
    fg = fs.create_feature_group("wm_fg", primary_key=["pk"], event_time="ets")
    sdf = spark.readStream.schema("pk long, ets timestamp, v double").parquet(src)
    insert_stream(
        fg, sdf,
        trigger={"availableNow": True},
        checkpoint_dir=str(tmp_path / "ckpt_wm"),
        await_termination=True, timeout=120,
        dedup_watermark="10 minutes",
    )
    snap = fg.read(spark)
    assert snap.count() == 3  # (1,t1), (2,t1), (1,t2)
    # the commit ingested the deduped stream, not the raw 5 rows:
    # count physical rows across all commit partitions
    import os as _os

    raw = spark.read.parquet(_os.path.join(fg.commit_store.location, "data"))
    assert raw.count() == 3
    # requires a declared event_time
    fg2 = fs.create_feature_group("wm_fg2", primary_key=["pk"])
    with pytest.raises(ValueError, match="event_time"):
        insert_stream(fg2, sdf, dedup_watermark="10 minutes")


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join (availableNow over two file sources)
    returns exactly the batch interval join's rows — the parity that
    makes the operator's semantics testable."""
    from feature_store_api_spark.streaming.stream_join import (
        interval_join, interval_join_stream_files,
    )

    rows = [
        # (id, key, ts)
        (1, "a", "2024-01-01 10:00:00"),
        (2, "a", "2024-01-01 11:30:00"),
        (3, "a", "2024-01-01 12:00:00"),
        (4, "b", "2024-01-01 10:10:00"),
        (5, "b", "2024-01-01 10:20:00"),
    ]
    df = spark.createDataFrame(rows, "id long, key string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    left = df.where(F.col("id") % 2 == 1)
    right = df.where(F.col("id") % 2 == 0)
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(ldir)
    right.write.parquet(rdir)

    batch = interval_join(
        left, right, ["key"], "ts", "ts", lower="1 hour", upper="0 seconds"
    ).select(
        F.col("l.id").alias("lid"), F.col("r.id").alias("rid")
    )
    got_batch = {(r["lid"], r["rid"]) for r in batch.collect()}
    # hand-check: right.ts in [left.ts - 1h, left.ts]
    assert got_batch == {(3, 2), (5, 4)}

    streamed = interval_join_stream_files(
        spark, ldir, rdir, left.schema, ["key"], "ts", "ts",
        lower="1 hour", upper="0 seconds",
        select=[F.col("l.id").alias("lid"), F.col("r.id").alias("rid")],
        table_name="ij_parity",
    )
    assert {(r["lid"], r["rid"]) for r in streamed.collect()} == got_batch


def test_interval_join_is_single_shuffle_per_side_batch(spark):
    from feature_store_api_spark.streaming.stream_join import interval_join

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:00:00")], "id long, key string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = (
        interval_join(df, df, ["key"], "ts", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # equi-key join with range residual: SortMergeJoin/ShuffledHashJoin,
    # never a nested-loop/cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_streaming_dedup_ingest(spark, tmp_path):
    """Near-dup-gated streaming ingest: within-batch dups collapse to
    the min id, cross-batch near-dups of already-accepted docs are
    dropped via the persistent band store, novel docs land; the offline
    FG holds exactly the survivors and the band store only survivor
    bands."""
    import os

    from feature_store_api_spark import FeatureStore
    from feature_store_api_spark.streaming.dedup_ingest import (
        StreamingDedupStats,
        streaming_dedup_ingest,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and keeps on running "
        "through the wide open fields for hours without a single rest stop"
    )
    novel = (
        "completely different text about distributed query engines and "
        "columnar storage formats that shares no shingles with the fox story"
    )
    third = (
        "a third unrelated document mentioning point in time joins feature "
        "stores training datasets and deterministic negative sampling ops"
    )
    # batch 1: doc 1 + its near-dup 2 (one char changed) + novel 3
    # batch 2: another near-dup of 1 (id 10), an exact re-send of 3
    #          (id 11), and a brand-new doc 12
    src = str(tmp_path / "in")
    b1 = spark.createDataFrame(
        [(1, base), (2, base.replace("dog", "dogs")), (3, novel)],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(10, base.replace("hours", "days")), (11, novel), (12, third)],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.parquet(src + "/b1")
    b2.coalesce(1).write.parquet(src + "/b2")

    fs = FeatureStore(root=str(tmp_path / "store"))
    fg = fs.create_feature_group("stream_docs", primary_key=["doc_id"])
    stats = StreamingDedupStats()

    # drive the two batches in order (maxFilesPerTrigger=1 over the dirs
    # is racy on ordering; run two availableNow passes instead)
    for sub in ("b1", "b2"):
        sdf = spark.readStream.schema("doc_id long, text string").parquet(
            src + "/" + sub
        )
        q = streaming_dedup_ingest(
            fg, sdf, "text",
            checkpoint_dir=str(tmp_path / f"ckpt_{sub}"),
            trigger={"availableNow": True},
            await_termination=True,
            timeout=120,
            stats=stats,
        )
        assert not q.isActive

    got = sorted(r["doc_id"] for r in fg.read(spark).collect())
    # batch1: 1 survives (min id of {1,2}), 3 novel; batch2: 10 is a
    # near-dup of corpus doc 1 -> dropped, 11 re-sends novel -> dropped,
    # 12 novel -> kept
    assert got == [1, 3, 12]
    assert stats.seen == 6 and stats.accepted == 3 and stats.dropped == 3
    # band store holds ONLY survivor bands, partitioned per batch
    bands = spark.read.parquet(str(tmp_path / "store" / "stream_docs_1" / "_lsh_bands"))
    assert sorted(set(r["doc_id"] for r in bands.select("doc_id").collect())) == [1, 3, 12]


def test_two_queries_same_fg_no_batch_id_collision(spark, tmp_path):
    """Regression: Spark numbers micro-batches per CHECKPOINT from 0,
    so a second streaming query into the same FG (fresh checkpoint)
    used to collide with the first query's batch 0 and get silently
    skipped as a 'replay'. Idempotence keys are now checkpoint-scoped."""
    import os

    from feature_store_api_spark import FeatureStore

    fs = FeatureStore(root=str(tmp_path / "fs"))
    fg = fs.create_feature_group(
        "two_q", primary_key=["pk"], event_time="ts"
    )
    for i, sub in enumerate(("s1", "s2")):
        src = str(tmp_path / sub)
        spark.createDataFrame(
            [(i * 10 + 1, 100 + i, float(i))], "pk long, ts long, v double"
        ).coalesce(1).write.parquet(src)
        sdf = spark.readStream.schema("pk long, ts long, v double").parquet(src)
        insert_stream(
            fg, sdf, trigger={"availableNow": True},
            checkpoint_dir=str(tmp_path / f"ck_{sub}"),
            await_termination=True, timeout=120,
        )
    got = sorted(r["pk"] for r in fg.read(spark).collect())
    assert got == [1, 11]  # second query's batch 0 NOT swallowed


def test_legacy_bare_batch_id_replay_detected(spark, tmp_path):
    """Commits written before idempotence keys were checkpoint-scoped
    carry a BARE int batch id. A checkpoint recovery spanning the
    format change must still recognize them as committed instead of
    re-committing the replayed batch (duplicating rows in append-shaped
    sinks / burning a commit)."""
    from feature_store_api_spark import FeatureStore

    fs = FeatureStore(root=str(tmp_path / "fs"))
    fg = fs.create_feature_group("legacy_q", primary_key=["pk"], event_time="ts")
    # simulate a legacy commit: bare int stream_batch_id
    fg.insert(spark.createDataFrame([(1, 100, 1.0)], "pk long, ts long, v double"))
    store = fg.commit_store
    log = store._read_log()
    log[-1].setdefault("extra", {})["stream_batch_id"] = 0
    store._write_log(log)

    assert store.has_stream_batch("deadbeef:0", 0)      # legacy matched
    assert not store.has_stream_batch("deadbeef:1", 1)  # other batches not

    # end-to-end: a streaming replay of batch 0 is skipped
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 200, 9.0)], "pk long, ts long, v double"
    ).coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema("pk long, ts long, v double").parquet(src)
    insert_stream(
        fg, sdf, trigger={"availableNow": True},
        checkpoint_dir=str(tmp_path / "ck"),
        await_termination=True, timeout=120,
    )
    rows = fg.read(spark).collect()
    assert [(r["pk"], r["ts"]) for r in rows] == [(1, 100)]  # replay skipped
