"""Monitoring windows (SURVEY §2.4: monitoring_window_config_engine
parity) + exact percentiles."""

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F
from feature_store_api_spark.sources.readers import read_parquet


def test_parse_time_offset():
    from feature_store_api_spark.operators.monitoring import parse_time_offset

    assert parse_time_offset("1w2d3h") == timedelta(weeks=1, days=2, hours=3)
    assert parse_time_offset("4w") == timedelta(weeks=4)
    assert parse_time_offset("12h") == timedelta(hours=12)
    assert parse_time_offset("2d") == timedelta(days=2)
    with pytest.raises(ValueError):
        parse_time_offset("")
    with pytest.raises(ValueError):
        parse_time_offset("3h1w")  # wrong component order
    with pytest.raises(ValueError):
        parse_time_offset("5x")


def test_window_bounds_rolling():
    from feature_store_api_spark.operators.monitoring import (
        MonitoringWindowConfig, window_bounds,
    )

    now = datetime(2024, 1, 29)
    cfg = MonitoringWindowConfig(
        window_type="ROLLING_TIME", time_offset="2w", window_length="1w"
    )
    assert window_bounds(cfg, now) == (datetime(2024, 1, 15), datetime(2024, 1, 22))

    # no window_length → extends to now
    cfg2 = MonitoringWindowConfig(window_type="ROLLING_TIME", time_offset="1w")
    assert window_bounds(cfg2, now) == (datetime(2024, 1, 22), now)

    # window_length past now is capped at now
    cfg3 = MonitoringWindowConfig(
        window_type="ROLLING_TIME", time_offset="1w", window_length="4w"
    )
    assert window_bounds(cfg3, now) == (datetime(2024, 1, 22), now)

    # ALL_TIME is unbounded
    cfg4 = MonitoringWindowConfig(window_type="ALL_TIME")
    assert window_bounds(cfg4, now) == (None, None)


def test_config_validation():
    from feature_store_api_spark.operators.monitoring import MonitoringWindowConfig

    with pytest.raises(ValueError):
        MonitoringWindowConfig(window_type="BOGUS")
    with pytest.raises(ValueError):
        MonitoringWindowConfig(window_type="ROLLING_TIME")  # no offset


def test_fetch_window_matches_range_filter(spark, sf_dir, duck):
    from feature_store_api_spark.operators.monitoring import (
        MonitoringWindowConfig, fetch_window,
    )

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    cfg = MonitoringWindowConfig(
        window_type="ROLLING_TIME", time_offset="2w", window_length="1w"
    )
    got = fetch_window(ev, "ts", cfg, now=datetime(2024, 1, 29)).count()
    want = duck.execute(
        "SELECT COUNT(*) FROM events WHERE ts >= TIMESTAMP '2024-01-15'"
        " AND ts < TIMESTAMP '2024-01-22'"
    ).fetchone()[0]
    assert got == want


def test_row_sampling_fraction(spark, sf_dir):
    from feature_store_api_spark.operators.monitoring import (
        MonitoringWindowConfig, fetch_window,
    )

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    cfg = MonitoringWindowConfig(window_type="ALL_TIME", row_percentage=0.2)
    n = ev.count()
    got = fetch_window(ev, "ts", cfg, now=datetime(2024, 1, 29), seed=5).count()
    assert 0.05 * n < got < 0.5 * n


def test_compare_windows():
    from feature_store_api_spark.operators.monitoring import compare_windows

    r = compare_windows(12.0, 10.0, threshold=1.0)
    assert r == {"difference": 2.0, "shift_detected": True}
    r = compare_windows(12.0, 10.0, threshold=0.5, relative=True)
    assert r["difference"] == pytest.approx(0.2)
    assert not r["shift_detected"]
    # strict: equality triggers
    assert compare_windows(11.0, 10.0, threshold=1.0, strict=True)["shift_detected"]
    assert not compare_windows(11.0, 10.0, threshold=1.0)["shift_detected"]
    assert compare_windows(None, 10.0, threshold=1.0) == {
        "difference": None, "shift_detected": False,
    }
    # zero reference
    assert compare_windows(1.0, 0.0, threshold=1.0, relative=True)["difference"] == float("inf")


def test_exact_percentiles_match_duckdb(spark, sf_dir, duck):
    from feature_store_api_spark.operators.statistics import exact_percentiles

    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    got = exact_percentiles(li, ["l_quantity", "l_discount"])
    want_q = duck.execute(
        "SELECT quantile_cont(l_quantity, [0.25, 0.5, 0.75]) FROM lineitem"
    ).fetchone()[0]
    want_d = duck.execute(
        "SELECT quantile_cont(l_discount, [0.25, 0.5, 0.75]) FROM lineitem"
    ).fetchone()[0]
    assert got["l_quantity"] == pytest.approx([float(x) for x in want_q])
    assert got["l_discount"] == pytest.approx([float(x) for x in want_d])


def test_transformation_statistics_exact_pctl(spark, sf_dir):
    from feature_store_api_spark.operators.statistics import transformation_statistics

    c = read_parquet(spark, f"{sf_dir}/customer.parquet")
    approx = transformation_statistics(c, ["c_acctbal"])
    exact = transformation_statistics(c, ["c_acctbal"], exact_pctl=True)
    # both present, exact within the approx pass's bin tolerance
    a, e = approx["c_acctbal"]["percentiles"], exact["c_acctbal"]["percentiles"]
    assert len(a) == len(e) == 3
    spread = float(exact["c_acctbal"]["max"]) - float(exact["c_acctbal"]["min"])
    for x, y in zip(a, e):
        assert abs(x - y) < spread / 100


def test_multi_table_lsh_recall(spark):
    """Planted colinear dups must always collide in every LSH table."""
    from feature_store_api_spark.operators.similarity import embedding_cosine_dup_pairs

    base = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(40)]
    dups = [(i + 1000, [x * 2.0 for x in v]) for i, v in base]
    df = spark.createDataFrame(base + dups, "id long, v array<double>")
    out = embedding_cosine_dup_pairs(df, "id", "v", dim=8, threshold=0.999)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert {(i, i + 1000) for i, _ in base} <= got


def test_fg_monitoring_config_lifecycle(spark, tmp_path):
    from datetime import datetime

    from feature_store_api_spark import FeatureStore
    from feature_store_api_spark.operators.monitoring import (
        FeatureMonitoringConfig,
        MonitoringWindowConfig,
    )

    fs = FeatureStore(root=str(tmp_path / "mon"))
    fg = fs.create_feature_group("mfg", primary_key=["k"], event_time="ts")
    rows = [(i, float(10 + (i % 3)), "2024-01-0%d" % (1 + i % 7)) for i in range(70)]
    fg.insert(
        spark.createDataFrame(rows, "k long, v double, day string").selectExpr(
            "k", "v", "to_timestamp(day) AS ts"
        )
    )
    fg.create_feature_monitoring_config(FeatureMonitoringConfig(
        name="v_drift",
        feature_name="v",
        statistic="mean_val",
        detection_window=MonitoringWindowConfig(
            window_type="ROLLING_TIME", time_offset="3d"
        ),
        reference_window=MonitoringWindowConfig(
            window_type="SPECIFIC_VALUE", specific_value=11.0
        ),
        threshold=0.5,
    ))
    out = fg.run_feature_monitoring("v_drift", spark, now=datetime(2024, 1, 8))
    assert out["reference_value"] == 11.0
    assert out["detection_value"] is not None
    assert isinstance(out["shift_detected"], bool)
    # persisted config survives a fresh store; result history recorded
    fg2 = FeatureStore(root=fs.root).get_feature_group("mfg")
    out2 = fg2.run_feature_monitoring("v_drift", spark, now=datetime(2024, 1, 8))
    assert out2["detection_value"] == out["detection_value"]
    import os

    results = os.listdir(os.path.join(fg.location, "monitoring_results"))
    assert len(results) == 2
    with pytest.raises(KeyError):
        fg.run_feature_monitoring("nope", spark)


def test_fv_monitoring_config_lifecycle(spark, tmp_path):
    """Feature-view-level monitoring (parity feature_view.py:3303-3430):
    the named config runs against the view's compiled PIT batch frame,
    persists with the view, and records result history."""
    import os
    from datetime import datetime

    from feature_store_api_spark import FeatureStore
    from feature_store_api_spark.operators.monitoring import (
        FeatureMonitoringConfig,
        MonitoringWindowConfig,
    )

    fs = FeatureStore(root=str(tmp_path / "fvmon"))
    fg = fs.create_feature_group("mfg", primary_key=["k"], event_time="ts")
    rows = [(i, float(10 + (i % 3)), "2024-01-0%d" % (1 + i % 7)) for i in range(70)]
    fg.insert(
        spark.createDataFrame(rows, "k long, v double, day string").selectExpr(
            "k", "v", "to_timestamp(day) AS ts"
        )
    )
    fv = fs.create_feature_view("mview", fg.select(["k", "v", "ts"]))
    fv.create_feature_monitoring_config(FeatureMonitoringConfig(
        name="v_drift",
        feature_name="v",
        statistic="mean_val",
        detection_window=MonitoringWindowConfig(
            window_type="ROLLING_TIME", time_offset="3d"
        ),
        reference_window=MonitoringWindowConfig(
            window_type="SPECIFIC_VALUE", specific_value=11.0
        ),
        threshold=0.5,
    ))
    out = fv.run_feature_monitoring("v_drift", spark, now=datetime(2024, 1, 8))
    assert out["reference_value"] == 11.0 and out["detection_value"] is not None

    # config survives a fresh store over the same root
    fv2 = FeatureStore(root=fs.root).get_feature_view("mview")
    out2 = fv2.run_feature_monitoring("v_drift", spark, now=datetime(2024, 1, 8))
    assert out2["detection_value"] == out["detection_value"]
    rd = os.path.join(
        fs.root, "_feature_views", "mview_1_monitoring_results"
    )
    assert len(os.listdir(rd)) == 2
    with pytest.raises(KeyError):
        fv.run_feature_monitoring("nope", spark)


def test_fv_monitoring_accessors(spark, tmp_path):
    from datetime import datetime

    from feature_store_api_spark import FeatureStore
    from feature_store_api_spark.operators.monitoring import (
        FeatureMonitoringConfig,
        MonitoringWindowConfig,
    )

    fs = FeatureStore(root=str(tmp_path / "acc"))
    fg = fs.create_feature_group("afg", primary_key=["k"], event_time="ts")
    fg.insert(
        spark.createDataFrame([(1, 5.0, "2024-01-03")], "k long, v double, d string")
        .selectExpr("k", "v", "to_timestamp(d) AS ts")
    )
    fv = fs.create_feature_view("aview", fg.select(["k", "v", "ts"]))
    assert fv.get_feature_monitoring_configs() == []
    fv.create_feature_monitoring_config(FeatureMonitoringConfig(
        name="c1", feature_name="v", statistic="mean_val",
        detection_window=MonitoringWindowConfig(window_type="ALL_TIME"),
        reference_window=MonitoringWindowConfig(
            window_type="SPECIFIC_VALUE", specific_value=5.0
        ),
        threshold=1.0,
    ))
    assert [c["name"] for c in fv.get_feature_monitoring_configs()] == ["c1"]
    assert fv.get_feature_monitoring_history("c1") == []
    fv.run_feature_monitoring("c1", spark, now=datetime(2024, 1, 5))
    assert len(fv.get_feature_monitoring_history("c1")) == 1


def test_distribution_drift_metrics(spark):
    from feature_store_api_spark.operators.monitoring import distribution_drift

    ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    same = spark.createDataFrame([(float(i % 100),) for i in range(500)], "v double")
    m = distribution_drift(same, ref, "v")
    # identical distributions: all metrics ~0
    assert abs(m["psi"]) < 1e-9 and abs(m["ks_statistic"]) < 1e-9
    assert m["detection_count"] == 500 and m["reference_count"] == 1000

    shifted = spark.createDataFrame(
        [(float(i % 100) + 80.0,) for i in range(500)], "v double"
    )
    s = distribution_drift(shifted, ref, "v")
    # mass clamps into the top bins: a major shift by every metric
    assert s["psi"] > 0.25 and s["ks_statistic"] > 0.5
    assert 0.0 < s["js_divergence"] <= 1.0

    # empty detection window → None metrics, not a crash
    e = distribution_drift(same.where("v < 0"), ref, "v")
    assert e["psi"] is None and e["detection_count"] == 0


def test_windowed_drift_matches_pairwise_drift(spark):
    """Per-window PSI from the one-plan windowed_drift must equal
    distribution_drift run window-by-window (same bins, same epsilon
    floors), and a shifted window must score drift while an identical
    one scores ~0."""
    import datetime as dt

    from feature_store_api_spark.operators.monitoring import (
        distribution_drift,
        windowed_drift,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # day 0: uniform 0..99 — the reference look
    for i in range(200):
        rows.append((base + dt.timedelta(minutes=i), float(i % 100)))
    # day 1: shifted distribution 50..149
    for i in range(200):
        rows.append(
            (base + dt.timedelta(days=1, minutes=i), 50.0 + float(i % 100))
        )
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    ref = df.where(F.col("ts") < dt.datetime(2024, 1, 2))

    out = {
        r["window_start"]: r
        for r in windowed_drift(
            df, "value", "ts", window="1 day", reference=ref, buckets=10
        ).collect()
    }
    assert len(out) == 2
    day0 = out[base]
    day1 = out[base + dt.timedelta(days=1)]
    assert day0["psi"] < 0.01          # same distribution as reference
    assert day1["psi"] > 0.25          # major shift by the PSI rule of thumb

    # parity with the pairwise operator, window by window
    for start, row in out.items():
        det = df.where(
            (F.col("ts") >= start)
            & (F.col("ts") < start + dt.timedelta(days=1))
        )
        pair = distribution_drift(det, ref, "value", buckets=10)
        assert abs(row["psi"] - round(pair["psi"], 6)) < 1e-6
        assert abs(row["js_divergence"] - round(pair["js_divergence"], 6)) < 1e-6
        assert row["n"] == pair["detection_count"]


def test_feature_view_fluent_monitoring_builder(spark, tmp_path):
    """FV-side create_feature_monitoring fluent builder (reference
    feature_view.py:3363): save() persists on the view,
    run_feature_monitoring executes against the compiled PIT frame."""
    from feature_store_api_spark import FeatureStore

    fs = FeatureStore(root=str(tmp_path))
    fg = fs.create_feature_group("fvmon_src", primary_key=["k"], event_time="ts")
    rows = [(i, datetime(2024, 1, 1) + timedelta(hours=i), float(i)) for i in range(48)]
    fg.insert(spark.createDataFrame(rows, "k long, ts timestamp, v double"))
    fv = fs.create_feature_view("fvmon", fg.select_all())

    (
        fv.create_feature_monitoring("v_mean", feature_name="v")
        .with_detection_window(time_offset="1d")
        .with_reference_value(10.0)
        .compare_on(metric="mean", threshold=100.0)
        .save()
    )
    assert any(c["name"] == "v_mean" for c in fv.get_feature_monitoring_configs())
    res = fv.run_feature_monitoring("v_mean", spark, now=datetime(2024, 1, 3))
    assert res["reference_value"] == 10.0
    assert res["detection_value"] is not None


def test_streaming_windowed_drift_matches_batch(spark, tmp_path):
    """Stream/batch parity for windowed drift: feeding the same rows
    through a file stream with availableNow produces exactly the batch
    windowed_drift rows (append mode, watermark-final windows)."""
    import os

    from feature_store_api_spark.operators.monitoring import (
        streaming_windowed_drift,
        windowed_drift,
    )

    base = datetime(2024, 1, 1)
    rows = []
    for d in range(3):
        for i in range(120):
            rows.append(
                (base + timedelta(days=d, minutes=i * 3),
                 float((i % 50) + d * 25))
            )
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    src_dir = str(tmp_path / "drift_src")
    df.coalesce(1).write.parquet(src_dir)
    ref = df.where(F.col("ts") < base + timedelta(days=1))

    batch = {
        r["window_start"]: r
        for r in windowed_drift(
            df, "value", "ts", window="1 day", reference=ref
        ).collect()
    }

    stream = spark.readStream.schema("ts timestamp, value double").parquet(src_dir)
    out = streaming_windowed_drift(
        stream, "value", "ts", reference=ref, window="1 day",
        watermark="1 minute",
    )
    sink = str(tmp_path / "drift_sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: r for r in spark.read.parquet(sink).collect()
    }
    # append mode: the LAST window stays open (watermark never passes
    # its end in a bounded run) — every emitted window must match batch
    assert len(got) >= 2
    for ws, row in got.items():
        assert row["psi"] == batch[ws]["psi"], ws
        assert row["js_divergence"] == batch[ws]["js_divergence"], ws
        assert row["n"] == batch[ws]["n"], ws
