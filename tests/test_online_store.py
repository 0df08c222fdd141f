"""Bucketed online store: per-bucket rewrite + partition-pruned lookups.

Scale contract: an upsert's write cost is O(touched buckets), not
O(table) — a 1-row micro-batch must rewrite exactly one bucket
directory and leave every other bucket's files untouched on disk.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark.online.store import OnlineStore, _BUCKET


def _bucket_files(path):
    """{bucket_dir: {filename: mtime_ns}} snapshot of the table."""
    out = {}
    latest = os.path.join(path, "latest")
    for d in os.listdir(latest):
        if not d.startswith(_BUCKET + "="):
            continue
        full = os.path.join(latest, d)
        out[d] = {
            f: os.stat(os.path.join(full, f)).st_mtime_ns
            for f in os.listdir(full)
            if f.endswith(".parquet")
        }
    return out


@pytest.fixture()
def store_dir():
    with tempfile.TemporaryDirectory(prefix="fsas_onlb_") as tmp:
        yield tmp


def test_single_row_upsert_rewrites_one_bucket(spark, store_dir):
    store = OnlineStore(store_dir, primary_key=["uid"], num_buckets=8)
    base = spark.range(0, 200).select(
        F.col("id").alias("uid"), (F.col("id") * 2).alias("v")
    )
    store.upsert(base)
    before = _bucket_files(store_dir)
    assert len(before) > 1  # data spread over several buckets

    one = spark.createDataFrame([(7, 999)], "uid long, v long")
    store.upsert(one)
    after = _bucket_files(store_dir)

    changed = [d for d in after if after[d] != before.get(d)]
    assert len(changed) == 1, f"expected 1 rewritten bucket, got {changed}"
    # the rewritten bucket is the one uid=7 hashes to
    assert changed[0] == f"{_BUCKET}={store._bucket_of({'uid': 7})}"
    # value visible, everything else intact
    got = {r["uid"]: r["v"] for r in store.read(spark).collect()}
    assert got[7] == 999 and got[8] == 16 and len(got) == 200


def test_precombine_ordering_survives_bucketing(spark, store_dir):
    store = OnlineStore(
        store_dir, primary_key=["uid"], event_time="ts",
        precombine_key="seq", num_buckets=4,
    )
    df1 = spark.createDataFrame([(1, 10, 1, "a"), (2, 10, 1, "b")],
                                "uid long, ts long, seq long, val string")
    store.upsert(df1)
    # same event time, higher precombine wins; lower loses even if later
    df2 = spark.createDataFrame([(1, 10, 5, "winner"), (2, 10, 0, "loser")],
                                "uid long, ts long, seq long, val string")
    store.upsert(df2)
    got = {r["uid"]: r["val"] for r in store.read(spark).collect()}
    assert got[1] == "winner"
    assert got[2] == "b"  # seq 1 > 0: original row kept


def test_schema_widening_rewrites_consistently(spark, store_dir):
    store = OnlineStore(store_dir, primary_key=["uid"], num_buckets=4)
    store.upsert(spark.createDataFrame([(1, 1.0), (2, 2.0)], "uid long, x double"))
    store.upsert(
        spark.createDataFrame([(1, 9.0, "new")], "uid long, x double, extra string")
    )
    rows = {r["uid"]: r for r in store.read(spark).collect()}
    assert rows[1]["extra"] == "new" and rows[1]["x"] == 9.0
    assert rows[2]["extra"] is None and rows[2]["x"] == 2.0


def test_lookup_prunes_to_bucket(spark, store_dir):
    store = OnlineStore(store_dir, primary_key=["uid"], num_buckets=8)
    store.upsert(
        spark.range(0, 100).select(F.col("id").alias("uid"), F.col("id").alias("v"))
    )
    vec = store.get_feature_vector(spark, {"uid": 42})
    assert vec == {"uid": 42, "v": 42}
    vecs = store.get_feature_vectors(spark, [{"uid": i} for i in (1, 5, 1000)])
    assert vecs[0]["v"] == 1 and vecs[1]["v"] == 5 and vecs[2] is None
    # the pruned scan reads one bucket directory, not the table
    pruned = store._pruned(spark, [{"uid": 42}])
    assert 0 < pruned.count() < 100
