"""Unit coverage for the repartition-UP guard (operators/parallelism.py):
scan-rooted frames decide from the file count without physical
planning; derived/persisted frames fall back to the rdd probe rather
than guessing — a persisted single-partition cache must spread."""

from pyspark.sql import functions as F

from feature_store_api_spark.operators.parallelism import (
    estimated_scan_partitions,
    repartition_up,
)
from feature_store_api_spark.sources.readers import read_parquet


def test_scan_rooted_underparallel_repartitions(spark, tmp_path):
    p = str(tmp_path / "one_file")
    spark.range(0, 1000).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("t")
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert estimated_scan_partitions(df) == 1
    up = repartition_up(df, "k", 8)
    assert up.rdd.getNumPartitions() == 8
    assert up.count() == 1000


def test_scan_rooted_already_parallel_is_noop(spark, tmp_path):
    p = str(tmp_path / "many_files")
    spark.range(0, 1000).select(
        F.col("id").alias("k")
    ).repartition(16).write.parquet(p)
    df = spark.read.parquet(p)
    est = estimated_scan_partitions(df)
    assert est is not None and est >= 16
    up = repartition_up(df, "k", 8)
    # guard declined: the plan object is unchanged (no repartition node)
    assert "RepartitionByExpression" not in up._jdf.queryExecution().logical().toString()


def test_persisted_single_partition_cache_spreads(spark):
    """The round-7 regression shape: a persisted derived frame reports
    NO input files; skipping the guard would serialize compute onto its
    single cached partition (measured 3-12x at 10x data)."""
    base = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r"),
    ).coalesce(1).persist()
    base.count()
    try:
        assert estimated_scan_partitions(base) in (None, 0) or not base.inputFiles()
        up = repartition_up(base, "k", 8)
        assert up.rdd.getNumPartitions() == 8
        assert up.count() == 2000
    finally:
        base.unpersist()


def test_non_file_source_falls_back_not_crashes(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    up = repartition_up(df, "k", 8)
    assert up.count() == 100
