"""Training-dataset / file sinks.

Parity: ``/root/reference/python/hsfs/engine/spark.py:865-919``
(``write_training_dataset`` file path: csv/tsv/parquet/avro/orc/
tfrecord, per-split subdirectories, ``coalesce(1)`` option,
overwrite/append modes) and default write options
(``engine/spark.py:1111-1127``).

tfrecord requires the external ``spark-tensorflow-connector`` jar; we
gate it with a clear error instead of bundling. avro is served by the
jarless container-file writer/reader in ``avro_container.py`` (standard
.avro files, no spark-avro needed).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import DataFrame

_DEFAULT_WRITE_OPTIONS: Dict[str, Dict[str, str]] = {
    # parity engine/spark.py:1111-1127
    "csv": {"header": "true", "delimiter": ","},
    "tsv": {"header": "true", "delimiter": "\t"},
}

_FORMATS = {"csv", "tsv", "parquet", "orc", "avro", "tfrecord", "tfrecords"}


def write_dataframe(
    df: DataFrame,
    data_format: str,
    path: str,
    mode: str = "overwrite",
    options: Optional[Dict[str, str]] = None,
    coalesce: bool = False,
    partition_by: Optional[list] = None,
) -> None:
    """Write one DataFrame to files.

    ``coalesce=True`` mirrors the reference's single-file option
    (``engine/spark.py:682-683``) — note this funnels the whole dataset
    through one task; at scale prefer the default parallel write.
    """
    fmt = data_format.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"Unsupported training dataset format {data_format!r}")
    opts = dict(_DEFAULT_WRITE_OPTIONS.get(fmt, {}))
    opts.update(options or {})
    if fmt == "tsv":
        fmt = "csv"
    if fmt in ("tfrecord", "tfrecords"):
        # jarless tf.train.Example writer (no spark-tensorflow-connector)
        from .tfrecord import write_tfrecord

        out = df.coalesce(1) if coalesce else df
        if partition_by:
            raise NotImplementedError(
                "partitionBy is not supported by the jarless tfrecord writer"
            )
        write_tfrecord(out, path, mode=mode)
        return
    if fmt == "avro":
        # jarless container-file writer (spark-avro not on classpath)
        from .avro_container import write_avro

        out = df.coalesce(1) if coalesce else df
        if partition_by:
            raise NotImplementedError(
                "partitionBy is not supported by the jarless avro writer"
            )
        write_avro(out, path, mode=mode)
        return
    out = df.coalesce(1) if coalesce else df
    writer = out.write.mode(mode).options(**opts)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_training_dataset(
    splits: Dict[str, DataFrame],
    data_format: str,
    path: str,
    mode: str = "overwrite",
    options: Optional[Dict[str, str]] = None,
    coalesce: bool = False,
) -> Dict[str, str]:
    """Write each split under ``<path>/<split>`` (parity
    ``engine/spark.py:865-919``); single unsplit datasets pass
    ``{"": df}`` and land directly at ``path``. Returns split→dir."""
    written = {}
    for name, df in splits.items():
        target = os.path.join(path, name) if name else path
        write_dataframe(
            df, data_format, target, mode=mode, options=options, coalesce=coalesce
        )
        written[name or "all"] = target
    return written


def read_training_dataset(
    spark, data_format: str, path: str,
    options: Optional[Dict[str, str]] = None, schema=None,
) -> DataFrame:
    """Read a split directory back (multi-file union is implicit in the
    directory scan — parity ``engine/python.py:246-260``). tfrecord
    needs ``schema``."""
    from .readers import read

    return read(spark, data_format, path, options=options, schema=schema)
