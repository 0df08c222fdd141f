"""FeatureGroup metadata/statistics parity batch: StatisticsConfig,
commit-window stats, metadata updates, deprecation, validation/
monitoring accessors, child-direction provenance."""

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark import FeatureStore
from feature_store_api_spark.operators.statistics import StatisticsConfig


@pytest.fixture()
def fs(tmp_path):
    return FeatureStore(root=str(tmp_path))


def test_statistics_config_honored_and_persisted(spark, fs, tmp_path):
    cfg = StatisticsConfig(
        correlations=True, histograms=True, exact_uniqueness=True,
        columns=["a", "b"],
    )
    fg = fs.create_feature_group("sfg", primary_key=["k"], statistics_config=cfg)
    fg.insert(spark.createDataFrame(
        [(i, float(i), float(i * 2), "x" * (i % 3)) for i in range(20)],
        "k long, a double, b double, c string",
    ))
    stats = fg.compute_statistics(spark)
    # column restriction: only a/b profiled, c and k excluded
    assert set(k for k in stats if not k.startswith("_")) == {"a", "b"}
    assert stats["a"]["exactNumDistinctValues"] == 20
    assert "_correlations" in stats and "_histograms" in stats
    assert {r["a"] for r in stats["_histograms"]["a"]} == {
        float(i) for i in range(20)
    }

    # config survives rehydration; disabled config yields empty stats
    fg2 = FeatureStore(root=str(tmp_path)).get_feature_group("sfg")
    assert fg2.statistics_config.columns == ["a", "b"]
    fg2.update_statistics_config(StatisticsConfig(enabled=False))
    assert fg2.compute_statistics(spark) == {}
    # stats are keyed per commit: the re-run overwrote the same commit
    allstats = fg.get_all_statistics()
    assert len(allstats) == 1 and allstats[0]["statistics"] == {}


def test_commit_window_statistics(spark, fs):
    fg = fs.create_feature_group("wfg", primary_key=["k"], auto_compact_every=None)
    c1 = fg.insert(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"))
    c2 = fg.insert(spark.createDataFrame([(3, 30.0)], "k long, v double"))
    win = fg.get_statistics_by_commit_window(
        start_commit_time=c1.commit_time, end_commit_time=c2.commit_time,
        spark=spark,
    )
    assert win["v"]["count"] == 1 and win["v"]["mean"] == 30.0
    snap = fg.get_statistics_by_commit_window(
        end_commit_time=c1.commit_time, spark=spark
    )
    assert snap["v"]["count"] == 2


def test_metadata_updates_and_deprecation(spark, fs, tmp_path):
    fg = fs.create_feature_group("mfg", primary_key=["k"], description="old")
    fg.insert(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    fg.update_description("new words")
    fg.update_feature_description("v", "the value")
    fg.update_deprecated(True)

    fresh = FeatureStore(root=str(tmp_path)).get_feature_group("mfg")
    assert fresh.description == "new words"
    assert fresh.get_feature("v").description == "the value"
    assert fresh.deprecated
    with pytest.warns(DeprecationWarning, match="deprecated"):
        assert fresh.read(spark).count() == 1

    fg.delete()
    with pytest.raises(KeyError):
        FeatureStore(root=str(tmp_path)).get_feature_group("mfg")


def test_validation_and_monitoring_accessors(spark, fs):
    fg = fs.create_feature_group("vfg", primary_key=["k"])
    assert fg.get_latest_validation_report() is None
    assert fg.get_all_validation_reports() == []
    assert fg.get_feature_monitoring_configs() == []
    assert fg.get_feature_monitoring_history("any") == []
    assert fg.get_expectation_suite() is None


def test_generated_feature_groups_child_links(spark, fs):
    src = fs.create_feature_group("srcg", primary_key=["k"])
    src.insert(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    child = fs.create_feature_group("childg", primary_key=["k"])
    child.insert(src.read(spark))
    links = src.get_generated_feature_groups()
    assert [g.name for g in links.accessible] == ["childg"]
    assert child.get_generated_feature_groups().accessible == []


def test_avro_schema_property(spark, fs):
    """avro_schema: nullable-union record over the group's features —
    and it round-trips through the engine's own Avro codec."""
    import json

    from feature_store_api_spark.sources.avro_codec import decode, encode

    fg = fs.create_feature_group("avfg", primary_key=["k"])
    fg.insert(spark.createDataFrame(
        [(1, 2.5, ["a", "b"])], "k long, v double, tags array<string>"
    ))
    schema = json.loads(fg.avro_schema)
    assert schema["type"] == "record" and schema["name"] == "avfg"
    by_name = {f["name"]: f["type"] for f in schema["fields"]}
    assert by_name["k"] == ["null", "long"]
    assert by_name["v"] == ["null", "double"]
    assert by_name["tags"][1]["type"] == "array"
    # codec round-trip under the advertised schema
    rec = {"k": 1, "v": 2.5, "tags": ["a", "b"]}
    assert decode(encode(rec, schema), schema) == rec


def test_fg_validate_arbitrary_dataframe_without_insert(spark, fs):
    """fg.validate(df) (parity reference feature_group.py:1243): run the
    attached suite against a DataFrame WITHOUT inserting; save_report
    persists into the same history get_validation_history serves; an
    override suite runs but never persists."""
    from feature_store_api_spark.operators.validation import (
        ExpectationSuite,
        ExpectColumnValuesToBeBetween,
        ExpectColumnValuesToNotBeNull,
    )

    suite = ExpectationSuite(
        [ExpectColumnValuesToNotBeNull(column="v")], name="s"
    )
    fg = fs.create_feature_group("valfg", primary_key=["k"])
    fg.save_expectation_suite(suite)
    good = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    bad = spark.createDataFrame([(1, None)], "k long, v double")

    r = fg.validate(good)
    assert r.success and r.evaluated == 1
    assert fg.get_all_validation_reports() == []  # save_report defaulted off

    r2 = fg.validate(bad, save_report=True)
    assert not r2.success
    hist = fg.get_all_validation_reports()
    assert len(hist) == 1 and hist[0]["success"] is False

    # override suite: runs, but results are NEVER persisted (ref contract)
    alt = ExpectationSuite(
        [ExpectColumnValuesToBeBetween(column="v", min_value=0, max_value=1)],
        name="alt",
    )
    r3 = fg.validate(good, expectation_suite=alt, save_report=True)
    assert not r3.success  # v=2.0 out of [0,1]
    assert len(fg.get_all_validation_reports()) == 1

    # dataframe=None validates the group's own stored data (fg_data mode)
    fg.insert(good)  # ALWAYS policy: ingests + records a report
    r4 = fg.validate()
    assert r4.success and r4.ingestion_result == "FG_DATA"


def test_fg_save_validation_report_external(spark, fs):
    """save_validation_report (parity feature_group.py:1114): persist an
    externally produced report — ValidationReport or GE-format dict —
    alongside the group's history."""
    from feature_store_api_spark.operators.validation import (
        ExpectationResult,
        ValidationReport,
    )

    fg = fs.create_feature_group("extrep", primary_key=["k"])
    fg.insert(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    fg.save_validation_report(
        ValidationReport(
            True,
            [ExpectationResult("expect_column_values_to_not_be_null", "v", True, 0)],
            1,
        )
    )
    ge_dict = {
        "success": False,
        "results": [
            {
                "success": False,
                "expectation_config": {
                    "expectation_type": "expect_column_values_to_be_between",
                    "kwargs": {"column": "v", "min_value": 0, "max_value": 1},
                },
                "result": {"observed_value": 7.0},
            }
        ],
    }
    fg.save_validation_report(ge_dict)
    hist = fg.get_all_validation_reports()
    assert len(hist) == 2
    assert {h["success"] for h in hist} == {True, False}
    ge_rec = [h for h in hist if not h["success"]][0]
    assert ge_rec["results"][0]["observed"] == 7.0
    assert ge_rec["results"][0]["column"] == "v"


def test_fg_parity_tail_members(spark, fs):
    """Small reference-API tail: save(df) alias, get_fg_name,
    get_complex_features, update_features (description-only),
    hudi_precombine_key alias, statistics property, check_deprecated."""
    import warnings

    from feature_store_api_spark.feature import Feature

    fg = fs.create_feature_group(
        "tailfg", primary_key=["k"], precombine_key="k"
    )
    df = spark.createDataFrame(
        [(1, 2.0, ["a", "b"])], "k long, v double, tags array<string>"
    )
    commit = fg.save(df)  # DataFrame -> ingest
    assert commit is not None and fg.read(spark).count() == 1

    assert fg.get_fg_name() == "tailfg_1"
    assert fg.get_complex_features() == ["tags"]
    assert fg.hudi_precombine_key == "k"

    f = Feature("v", description="the value")
    fg.update_features(f)
    assert fg.get_feature("v").description == "the value"

    stats = fg.compute_statistics(spark)
    assert fg.statistics is not None and fg.statistics == fg.get_statistics()

    fg.deprecated = True
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fg.check_deprecated()
        assert any(issubclass(x.category, DeprecationWarning) for x in w)


def test_fg_monitoring_fluent_builder(spark, fs):
    """create_feature_monitoring / create_statistics_monitoring fluent
    parity: builder -> save() persists the config; run_feature_monitoring
    executes it; statistics-only builders refuse references."""
    import datetime as dt

    import pytest as _pt

    fg = fs.create_feature_group(
        "monfg", primary_key=["k"], event_time="ts"
    )
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), float(i))
            for i in range(48)]
    fg.insert(spark.createDataFrame(rows, "k long, ts timestamp, v double"))

    cfg = (
        fg.create_feature_monitoring("mean_drift", feature_name="v")
        .with_detection_window(time_offset="1d")
        .with_reference_window()
        .compare_on(metric="mean", threshold=5.0, relative=False)
        .save()
    )
    assert cfg.statistic == "mean_val"
    names = [c["name"] for c in fg.get_feature_monitoring_configs()]
    assert "mean_drift" in names

    res = fg.run_feature_monitoring(
        "mean_drift", spark, now=dt.datetime(2024, 1, 3)
    )
    assert res["detection_value"] is not None
    assert res["reference_value"] is not None
    assert "shift_detected" in res or "difference" in res

    stats_builder = fg.create_statistics_monitoring("just_stats", "v")
    with _pt.raises(ValueError, match="no reference"):
        stats_builder.with_reference_window()
    stats_builder.with_detection_window(time_offset="1d").save()
    assert any(
        c["name"] == "just_stats" for c in fg.get_feature_monitoring_configs()
    )


def test_validation_always_policy_records_ingested(spark, fs):
    """Non-strict (ALWAYS) policy ingests even a failing batch — the
    recorded fate must say 'ingested', not 'unknown'."""
    from feature_store_api_spark.operators.validation import (
        ExpectationSuite,
        ExpectColumnValuesToNotBeNull,
    )

    fg = fs.create_feature_group("alwaysfg", primary_key=["k"])
    fg.save_expectation_suite(ExpectationSuite(
        [ExpectColumnValuesToNotBeNull(column="v")], name="s",
        validation_ingestion_policy="ALWAYS",
    ))
    fg.insert(spark.createDataFrame([(1, None)], "k long, v double"))
    hist = fg.get_all_validation_reports()
    assert len(hist) == 1
    assert hist[0]["success"] is False
    assert hist[0]["ingestion_result"] == "INGESTED"
    assert fg.read(spark).count() == 1  # the data really did land


def test_materialization_job_surface(spark, tmp_path):
    """fg.materialization_job: reference-shaped Job handle whose run()
    does the engine's real recurring work (commit-store compaction);
    states use the reference vocabulary; schedule is metadata."""
    import pytest

    from feature_store_api_spark import FeatureStore

    fs = FeatureStore(root=str(tmp_path))
    fg = fs.create_feature_group(
        "mat_job", primary_key=["k"], online_enabled=True,
    )
    fg.insert(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    fg.insert(spark.createDataFrame([(1, 2.0)], "k long, v double"))

    job = fg.materialization_job
    assert job.name == "mat_job_1_offline_fg_materialization"
    assert job is fg.materialization_job  # stable handle
    with pytest.raises(ValueError, match="No executions"):
        job.get_state()

    out = job.run()
    assert out["online_compacted"] is True
    assert job.get_state() == "FINISHED"
    assert job.get_final_state() == "SUCCEEDED"
    assert len(job.executions) == 1 and job.executions[0].success

    # compaction preserved the data
    assert fg.read(spark).collect()[0]["v"] == 2.0

    sched = job.schedule("0 0 * * * ?")
    assert job.job_schedule.cron_expression == "0 0 * * * ?"
    assert sched.to_dict()["enabled"] is True
    job.unschedule()
    assert job.job_schedule is None
