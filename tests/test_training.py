"""Tests: cached training-data pipeline (split + shared stats)."""

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark.functions.builtin_transformations import (
    label_encoder,
    min_max_scaler,
    one_hot_encoder,
    robust_scaler,
    standard_scaler,
)
from feature_store_api_spark.operators.training import prepare_training_data


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(i, float(i % 50), ["x", "y", "z"][i % 3]) for i in range(300)],
        "id bigint, v double, cat string",
    )


def test_random_split_shares_stats(frame):
    tfs = [min_max_scaler("v")]
    with prepare_training_data(
        frame, tfs, random={"train": 0.8, "test": 0.2}, seed=7
    ) as td:
        train, test = td["train"], td["test"]
        n_train, n_test = train.count(), test.count()
        assert n_train + n_test == 300
        assert 0.6 < n_train / 300 < 0.95
        # stats computed on train only
        assert set(td.statistics) == {"v"}
        # scaled with TRAIN min/max: a test row may fall outside [0,1]
        # only if its v is outside the train range; with v in 0..49 both
        # splits share the range, so all values are within [0,1]
        mm = test.agg(
            F.min("min_max_scaler_v").alias("lo"), F.max("min_max_scaler_v").alias("hi")
        ).collect()[0]
        assert mm["lo"] >= 0.0 and mm["hi"] <= 1.0
        # deterministic: same seed, same split
    with prepare_training_data(
        frame, tfs, random={"train": 0.8, "test": 0.2}, seed=7
    ) as td2:
        assert td2["train"].count() == n_train


def test_time_split_with_transformations(spark):
    df = spark.createDataFrame(
        [(i, f"2024-{1 + i % 12:02d}-15", float(i)) for i in range(120)],
        "id bigint, d string, v double",
    ).withColumn("ts", F.to_timestamp("d"))
    with prepare_training_data(
        df,
        [standard_scaler("v")],
        time_splits=[("train", "2024-01-01", "2024-09-01"), ("test", "2024-09-01", None)],
        event_time="ts",
    ) as td:
        assert td["train"].count() + td["test"].count() == 120
        assert "standard_scaler_v" in td["train"].columns


def test_no_split_single_train(frame):
    with prepare_training_data(frame, [robust_scaler("v")]) as td:
        assert list(td.splits) == ["train"]
        assert "robust_scaler_v" in td["train"].columns


def test_encoders_share_unique_values(frame):
    tfs = [label_encoder("cat"), one_hot_encoder("cat")]
    with prepare_training_data(
        frame, tfs, random={"train": 0.7, "test": 0.3}, seed=1
    ) as td:
        train = td["train"]
        le = [r["label_encoder_cat"] for r in train.select("label_encoder_cat").distinct().collect()]
        assert sorted(le) == [0, 1, 2]
        oh_cols = [c for c in train.columns if c.startswith("one_hot_encoder_cat")]
        assert len(oh_cols) == 3


def test_conflicting_split_specs(frame):
    with pytest.raises(ValueError):
        prepare_training_data(
            frame, random={"train": 1.0}, time_splits=[("train", None, None)],
            event_time="v",
        )
