"""SparkSession factory with scale-oriented defaults.

Session config parity: ``/root/reference/python/hsfs/engine/spark.py:130-133``
(UTC pin, dynamic partitions); the rest is our 100 TB-oriented posture:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
Arrow for the pandas boundary, shuffle partitions sized by the
environment rather than Spark's 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "feature_store_api_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's synthetic parquet uses TIMESTAMP(NANOS); this flag
        # lets Spark 4 read those columns (surfaced as timestamp_ntz)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
