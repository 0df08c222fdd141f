"""Stateful streaming EWMA (applyInPandasWithState) and windowed
aggregations (tumbling / sliding / session) — batch/stream parity."""

import math

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark.streaming.stateful import ewma_batch, ewma_stream
from feature_store_api_spark.streaming.windowed_aggs import (
    session_agg,
    streaming_windowed_agg,
    windowed_agg,
)


def _ref_ewma(values, alpha):
    ew = None
    for v in values:
        ew = v if ew is None else alpha * v + (1 - alpha) * ew
    return ew


@pytest.fixture()
def events_df(spark):
    rows = [
        # (user, ts-second, value) — user 1 has a tie on ts to pin ordering
        (1, 10, 1.0),
        (1, 10, 3.0),
        (1, 70, 5.0),
        (2, 5, 10.0),
        (2, 4000, 20.0),
        (3, 1, 7.0),
    ]
    return spark.createDataFrame(rows, "user_id long, sec long, value double").select(
        "user_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        "value",
    )


def test_ewma_batch_matches_reference_fold(spark, events_df):
    out = {
        r["user_id"]: (r["ewma"], r["n"])
        for r in ewma_batch(events_df, ["user_id"], "ts", "value", 0.5).collect()
    }
    # ties fold in (ts, value) order: user 1 sees 1.0, 3.0, 5.0
    assert out[1][1] == 3
    assert math.isclose(out[1][0], _ref_ewma([1.0, 3.0, 5.0], 0.5))
    assert math.isclose(out[2][0], _ref_ewma([10.0, 20.0], 0.5))
    assert math.isclose(out[3][0], 7.0)


def test_ewma_batch_plan_is_jvm_side(spark, events_df):
    plan = ewma_batch(events_df, ["user_id"], "ts", "value", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_ewma_stream_matches_batch(spark, tmp_path, events_df):
    # two ts-ordered micro-batch files → availableNow stream
    src = str(tmp_path / "src")
    events_df.where(F.col("ts") < F.timestamp_seconds(F.lit(60))).coalesce(
        1
    ).write.mode("append").parquet(src)
    events_df.where(F.col("ts") >= F.timestamp_seconds(F.lit(60))).coalesce(
        1
    ).write.mode("append").parquet(src)

    sdf = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    out = ewma_stream(sdf, ["user_id"], "ts", "value", 0.5)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # final state per key = last emitted row per key
    final = {
        r["user_id"]: (r["ewma"], r["n"])
        for r in spark.sql(
            "SELECT user_id, ewma, n FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY n DESC) rn FROM ewma_sink) WHERE rn = 1"
        ).collect()
    }
    expect = {
        r["user_id"]: (r["ewma"], r["n"])
        for r in ewma_batch(events_df, ["user_id"], "ts", "value", 0.5).collect()
    }
    for k, (ew, n) in expect.items():
        assert final[k][1] == n
        assert math.isclose(final[k][0], ew), (k, final[k], ew)


def test_tumbling_window_counts(spark, events_df):
    out = windowed_agg(events_df, "ts", ["user_id"], "1 minute")
    rows = {(r["user_id"], r["window_start"].minute): r["cnt"] for r in out.collect()}
    assert rows[(1, 0)] == 2  # two events in minute 0
    assert rows[(1, 1)] == 1  # one event in minute 1


def test_sliding_window_amplification(spark, events_df):
    out = windowed_agg(events_df, "ts", ["user_id"], "2 minutes", slide="1 minute")
    # user 3's single event (sec=1) lands in exactly 2 sliding windows
    assert out.where(F.col("user_id") == 3).count() == 2


def test_session_window_gap_merge(spark, events_df):
    out = session_agg(events_df, "ts", ["user_id"], "2 minutes")
    per_user = {r["user_id"]: r for r in out.collect() if r["user_id"] in (1, 2)}
    # user 1: events at 10s,10s,70s with 2-minute gap → ONE session of 3
    assert per_user[1]["cnt"] == 3
    # user 2: events 5s and 4000s → gap > 2 min, but one row per session
    assert out.where(F.col("user_id") == 2).count() == 2


def test_streaming_windowed_agg_emits_final_windows(spark, tmp_path, events_df):
    src = str(tmp_path / "wsrc")
    events_df.coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    out = streaming_windowed_agg(sdf, "ts", ["user_id"], "1 minute", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_sink").collect()
    # append mode emits only windows the watermark has closed: with the
    # max event at sec=4000, every window ending ≤ 4000s is final
    closed = {(r["user_id"], r["window_start"].minute, r["cnt"]) for r in got}
    assert (1, 0, 2) in closed and (1, 1, 1) in closed and (3, 0, 1) in closed


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ewma_rows = st.lists(
    st.tuples(
        st.integers(1, 3),            # key — tiny domain forces collisions
        st.integers(0, 5),            # ts-second — forces ties
        st.integers(-4, 4),           # value (small ints: float-exact)
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ewma_rows)
def test_ewma_batch_property_vs_python_fold(spark, rows):
    df = spark.createDataFrame(
        [(k, s, float(v)) for k, s, v in rows], "k long, sec long, value double"
    ).select("k", F.timestamp_seconds(F.col("sec")).alias("ts"), "value")
    got = {
        r["k"]: (r["ewma"], r["n"])
        for r in ewma_batch(df, ["k"], "ts", "value", 0.25).collect()
    }
    # brute force: fold per key in (ts, value) order
    per_key = {}
    for k, s, v in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        ew, n = per_key.get(k, (None, 0))
        ew = float(v) if ew is None else 0.25 * float(v) + 0.75 * ew
        per_key[k] = (ew, n + 1)
    for k, (ew, n) in per_key.items():
        assert got[k][1] == n
        assert math.isclose(got[k][0], ew, rel_tol=1e-12), (k, got[k][0], ew)


def test_ewma_stream_feeds_online_store(spark, tmp_path, events_df):
    """The documented serving loop: stateful EWMA stream → foreachBatch →
    OnlineStore upsert; the store ends with the final EWMA per key."""
    from feature_store_api_spark.online.store import OnlineStore

    src = str(tmp_path / "osrc")
    events_df.coalesce(1).write.parquet(src)
    store = OnlineStore(
        str(tmp_path / "online"), primary_key=["user_id"], event_time=None
    )
    sdf = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    out = ewma_stream(sdf, ["user_id"], "ts", "value", 0.5)
    q = (
        out.writeStream.foreachBatch(lambda bdf, bid: store.upsert(bdf))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ockpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r["ewma"] for r in store.read(spark).collect()}
    expect = {
        r["user_id"]: r["ewma"]
        for r in ewma_batch(events_df, ["user_id"], "ts", "value", 0.5).collect()
    }
    assert got.keys() == expect.keys()
    for k in expect:
        assert math.isclose(got[k], expect[k]), (k, got[k], expect[k])


def test_lag_and_rolling_features(spark, events_df):
    from feature_store_api_spark.operators.time_series import (
        lag_features,
        rolling_features,
    )

    lagged = lag_features(events_df, ["user_id"], "ts", ["value"], lags=[1], order_tiebreak=["value"])
    rows = {(r["user_id"], r["value"]): r["value_lag1"] for r in lagged.collect()}
    assert rows[(1, 1.0)] is None           # first event has no lag
    assert rows[(1, 3.0)] == 1.0            # tie on ts ordered by value
    assert rows[(1, 5.0)] == 3.0
    d = {(r["user_id"], r["value"]): r["value_delta"] for r in lagged.collect()}
    assert d[(1, 5.0)] == 2.0

    rolled = rolling_features(events_df, ["user_id"], "ts", "value", trailing="1 minute")
    got = {(r["user_id"], r["value"]): r["trailing_cnt"] for r in rolled.collect()}
    assert got[(1, 1.0)] == 2  # ties share a frame (RANGE semantics)
    assert got[(1, 5.0)] == 3  # 70s event: frame [10s, 70s] inclusive holds all 3
    assert got[(2, 20.0)] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rolling_features(events_df, ["user_id"], "ts", "value", trailing="fortnight")


def test_ewma_stream_with_idle_timeout_runs(spark, tmp_path, events_df):
    """State-TTL wiring: the ProcessingTimeTimeout variant folds and
    emits identically within one run (eviction fires across runs)."""
    src = str(tmp_path / "ttlsrc")
    events_df.coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    out = ewma_stream(sdf, ["user_id"], "ts", "value", 0.5, idle_timeout="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_ttl_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ttlckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r["ewma"] for r in spark.sql(
        "SELECT user_id, ewma FROM ewma_ttl_sink"
    ).collect()}
    expect = {
        r["user_id"]: r["ewma"]
        for r in ewma_batch(events_df, ["user_id"], "ts", "value", 0.5).collect()
    }
    for k in expect:
        assert math.isclose(got[k], expect[k])
