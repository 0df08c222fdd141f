"""Feature logging: served vectors logged back into a dedicated FG and
read back for drift/audit (parity feature_view.py:3573-3790,
core/feature_logging.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark import FeatureStore
from feature_store_api_spark.feature_view import FeatureView


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def fv(spark, tmp_path):
    fs = FeatureStore(root=str(tmp_path))
    fg = fs.create_feature_group("profiles", primary_key=["cid"])
    fg.insert(
        spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a")],
            "cid long, bal double, seg string",
        )
    )
    view = fs.create_feature_view("scorer", fg.select_all())
    return view


def test_log_roundtrip_dataframe(spark, fv):
    fv.enable_logging()
    batch = spark.createDataFrame(
        [(1, 10.0, 0.9), (2, 20.0, 0.1)], "cid long, bal double, score double"
    )
    fv.log(batch, training_dataset_version=3, model="clf_2")
    back = fv.read_log(spark)
    rows = {r["cid"]: r for r in back.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["score"] == 0.9
    # plumbing columns stripped, metadata kept
    assert "log_id" not in back.columns and "log_time" not in back.columns
    assert rows[1]["td_version"] == 3 and rows[1]["hsml_model"] == "clf_2"


def test_log_list_of_dicts_with_predictions(spark, fv):
    fv.enable_logging()
    served = [{"cid": 1, "bal": 10.0}, {"cid": 3, "bal": 30.0}]
    preds = [{"score": 0.7}, {"score": 0.2}]
    fv.log(served, predictions=preds, spark=spark)
    back = {r["cid"]: r for r in fv.read_log(spark).collect()}
    assert back[1]["score"] == 0.7 and back[3]["score"] == 0.2
    # prediction length mismatch fails loudly
    with pytest.raises(ValueError, match="prediction"):
        fv.log(served, predictions=[{"score": 1.0}], spark=spark)


def test_log_filters_and_separate_transformed_log(spark, fv):
    fv.enable_logging()
    fv.log(
        spark.createDataFrame([(1, 0.5)], "cid long, score double"),
        training_dataset_version=1, model="m_1",
    )
    fv.log(
        spark.createDataFrame([(2, 0.6)], "cid long, score double"),
        training_dataset_version=2, model="m_1",
    )
    fv.log(
        spark.createDataFrame([(9, 0.0)], "cid long, score double"),
        transformed=True,
    )
    # td_version / model / feature filters
    assert [r["cid"] for r in fv.read_log(spark, training_dataset_version=2).collect()] == [2]
    assert fv.read_log(spark, model="m_1").count() == 2
    assert fv.read_log(spark, filter=F.col("score") > 0.55).count() == 1
    # the transformed log is a separate FG
    assert [r["cid"] for r in fv.read_log(spark, transformed=True).collect()] == [9]
    # timeline shows one commit per log() call
    assert len(fv.get_log_timeline()) == 2
    assert len(fv.get_log_timeline(transformed=True)) == 1


def test_log_warns_when_not_enabled_and_delete(spark, fv):
    with pytest.warns(UserWarning, match="not enabled"):
        fv.log(spark.createDataFrame([(1, 0.5)], "cid long, score double"))
    assert fv.read_log(spark).count() == 1
    # materialize = compaction; read unchanged after
    fv.materialize_log(spark)
    assert fv.read_log(spark).count() == 1
    # pause gates materialization (not logging), resume restores
    fv.pause_logging()
    assert fv.materialize_log(spark) == []
    fv.resume_logging()
    fv.delete_log()
    with pytest.raises(Exception):
        fv.read_log(spark).count()
