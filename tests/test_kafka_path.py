"""Online Kafka path: Avro encode/decode + fake broker seam.

Parity targets: engine/spark.py:507-580 (sorted-pk key + record value +
headers), :951-1007 (stream decode), core/kafka_engine.py:118-142
(bounded offsets). The broker is file-backed (no jars offline); the
frame shapes match the real Kafka source/sink.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_api_spark.sources.avro_codec import (
    avro_schema_of_df, decode, encode,
)
from feature_store_api_spark.sources.fake_kafka import FakeKafkaBroker
from feature_store_api_spark.sources.kafka_encode import (
    decode_complex_features,
    decode_online_dataframe,
    encode_complex_features,
    encode_online_dataframe,
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(2, 10, "b", 1.5), (1, 20, "a", 2.5), (3, 30, None, None)],
        "uid long, ts long, name string, v double",
    )


def test_key_is_avro_string_of_sorted_pk_concat(spark, sample):
    # pk declared unsorted: the key must use sorted order (ts, uid)
    enc = encode_online_dataframe(sample, ["uid", "ts"], "fg", 1)
    rows = {decode(r["key"], "string"): r for r in enc.collect()}
    # sorted(["uid","ts"]) = ["ts","uid"] → concat casts ts first
    assert set(rows) == {"102", "201", "303"}


def test_value_roundtrip_and_headers(spark, sample):
    enc = encode_online_dataframe(sample, ["uid"], "my_fg", 7)
    assert set(enc.columns) == {"key", "value", "headers"}
    schema = avro_schema_of_df(sample, name="value")
    vals = sorted(
        (decode(r["value"], schema) for r in enc.collect()),
        key=lambda d: d["uid"],
    )
    assert vals[0] == {"uid": 1, "ts": 20, "name": "a", "v": 2.5}
    assert vals[2] == {"uid": 3, "ts": 30, "name": None, "v": None}
    hdr = {h["key"]: bytes(h["value"]) for h in enc.first()["headers"]}
    assert hdr == {b"featureGroupName".decode(): b"my_fg",
                   "featureGroupVersion": b"7"}
    # full Spark-side decode back to typed columns
    back = decode_online_dataframe(enc, sample.schema)
    assert sorted(back.collect(), key=lambda r: r["uid"]) == sorted(
        sample.collect(), key=lambda r: r["uid"]
    )


def test_complex_features_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], {"a": 1}, (5, "x")), (2, None, None, None)],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("emb", T.ArrayType(T.DoubleType())),
            T.StructField("tags", T.MapType(T.StringType(), T.LongType())),
            T.StructField("nested", T.StructType([
                T.StructField("n", T.LongType()),
                T.StructField("s", T.StringType()),
            ])),
        ]),
    )
    enc = encode_complex_features(df)
    kinds = dict(enc.dtypes)
    assert kinds["emb"] == "binary" and kinds["tags"] == "binary"
    dec = decode_complex_features(enc, df.schema)
    rows = {r["id"]: r for r in dec.collect()}
    assert rows[1]["emb"] == [1.0, 2.0]
    assert rows[1]["tags"] == {"a": 1}
    assert rows[1]["nested"]["n"] == 5 and rows[1]["nested"]["s"] == "x"
    assert rows[2]["emb"] is None and rows[2]["nested"] is None


def test_broker_offsets_and_bounded_backfill(spark, tmp_path):
    broker = FakeKafkaBroker(str(tmp_path), num_partitions=2)
    df1 = spark.createDataFrame(
        [(f"k{i}".encode(), f"v{i}".encode()) for i in range(10)],
        "key binary, value binary",
    )
    end1 = broker.produce(df1, "t")
    assert sum(end1.values()) == 10

    # first backfill sees all 10 and commits
    got1 = broker.backfill(spark, "t", group="mat_job")
    assert got1.count() == 10
    # nothing new → empty second backfill (exactly-once hand-off)
    assert broker.backfill(spark, "t", group="mat_job").count() == 0

    df2 = spark.createDataFrame(
        [(f"k{i}".encode(), f"w{i}".encode()) for i in range(4)],
        "key binary, value binary",
    )
    broker.produce(df2, "t")
    got2 = broker.backfill(spark, "t", group="mat_job")
    assert got2.count() == 4  # only the new window
    assert {bytes(r["value"])[:1] for r in got2.collect()} == {b"w"}
    # offsets are dense per partition
    all_rows = broker.read_batch(spark, "t").collect()
    for p in (0, 1):
        offs = sorted(r["offset"] for r in all_rows if r["partition"] == p)
        assert offs == list(range(len(offs)))


def test_timestamp_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2021, 3, 4, 5, 6, 7, 123456))],
        "id long, ts timestamp",
    )
    enc = encode_online_dataframe(df, ["id"])
    back = decode_online_dataframe(enc, df.schema)
    assert back.first()["ts"] == df.first()["ts"]


def test_materialize_from_broker_bounded_and_replayable(spark, tmp_path):
    """Two produce rounds → two materialization runs; each consumes only
    its window, and the FG converges to the latest state. Offsets commit
    AFTER the FG commit (crash-replay safe: upsert-by-record-key makes
    replays idempotent)."""
    from feature_store_api_spark import FeatureStore
    from feature_store_api_spark.sources.kafka_encode import (
        encode_online_dataframe,
    )
    from feature_store_api_spark.streaming.insert_stream import (
        materialize_from_broker,
    )

    fs = FeatureStore(root=str(tmp_path / "fs"))
    fg = fs.create_feature_group("mat_fg", primary_key=["uid"], event_time="ts")
    broker = FakeKafkaBroker(str(tmp_path / "broker"), num_partitions=2)

    df1 = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 2.0)], "uid long, ts long, v double"
    )
    broker.produce(encode_online_dataframe(df1, ["uid"], "mat_fg"), "t")
    c1 = materialize_from_broker(spark, fg, broker, "t", "job", df1.schema)
    assert c1 is not None and fg.read(spark).count() == 2

    # second window: update uid=1, add uid=3
    df2 = spark.createDataFrame(
        [(1, 20, 9.0), (3, 20, 3.0)], "uid long, ts long, v double"
    )
    broker.produce(encode_online_dataframe(df2, ["uid"], "mat_fg"), "t")
    c2 = materialize_from_broker(spark, fg, broker, "t", "job", df1.schema)
    assert c2 is not None and c2.commit_time > c1.commit_time
    got = {r["uid"]: r["v"] for r in fg.read(spark).collect()}
    assert got == {1: 9.0, 2: 2.0, 3: 3.0}

    # drained topic → empty run, no new commit
    assert materialize_from_broker(spark, fg, broker, "t", "job", df1.schema) is None
