"""Bucketed co-located joins (exchange-free) and salted skew joins
(result parity with the plain join)."""

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark.operators.skew import salted_join
from feature_store_api_spark.sources.bucketed import read_bucketed, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bkt_a", ["k"], num_buckets=8)
    write_bucketed(b, "bkt_b", ["k"], num_buckets=8)
    try:
        ta, tb = read_bucketed(spark, "bkt_a"), read_bucketed(spark, "bkt_b")
        # force a non-broadcast join so co-location is what's on trial
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = ta.join(tb, on="k")
            plan = _plan(j)
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # co-located
            assert j.count() == 10000
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


@pytest.fixture(scope="module")
def skewed(spark):
    # key 1 is hot: 5000 rows; keys 2..50 have 10 each
    hot = spark.range(0, 5000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(0, 490).select(
        (F.col("id") % 49 + 2).alias("k"), F.col("id").alias("v")
    )
    large = hot.unionByName(cold)
    small = spark.range(1, 51).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w")
    )
    return large, small


def test_salted_join_matches_plain_inner(spark, skewed):
    large, small = skewed
    plain = large.join(small, on="k")
    salted = salted_join(large, small, ["k"], salts=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_hot_key_split_matches_plain_left(spark, skewed):
    large, small = skewed
    # unmatched left rows: add keys absent from small
    extra = spark.range(0, 7).select(F.lit(999).alias("k"), F.col("id").alias("v"))
    large = large.unionByName(extra)
    hot = spark.createDataFrame([(1,)], "k long")
    plain = large.join(small, on="k", how="left")
    salted = salted_join(large, small, ["k"], how="left", salts=8, hot_keys=hot)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_rejects_outer(spark, skewed):
    large, small = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(large, small, ["k"], how="full")
