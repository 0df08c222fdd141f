"""Jarless Delta reader: protocol-conformant logs built by hand
(delta.io PROTOCOL.md — no delta jars exist in this environment, so
the fixtures ARE the spec: JSON actions, checkpoint parquet,
partitionValues re-attachment, commitInfo timestamps)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403 - spark fixture

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_parquet(spark, rows, schema, path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table(rows), path)


def _commit(log_dir, version, actions, ts):
    os.makedirs(log_dir, exist_ok=True)
    actions = [{"commitInfo": {"timestamp": ts}}] + actions
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(partition_cols=()):
    return {
        "metaData": {
            "id": "t",
            "schemaString": SCHEMA_JSON,
            "partitionColumns": list(partition_cols),
            "format": {"provider": "parquet"},
        }
    }


def _build_unpartitioned(spark, root):
    log = os.path.join(root, "_delta_log")
    _write_parquet(
        spark, {"k": [1, 2], "v": [1.0, 2.0], "lang": ["en", "de"]}, None,
        os.path.join(root, "part-0.parquet"),
    )
    _write_parquet(
        spark, {"k": [3], "v": [3.0], "lang": ["fr"]}, None,
        os.path.join(root, "part-1.parquet"),
    )
    _write_parquet(
        spark, {"k": [1, 2, 3], "v": [10.0, 20.0, 3.0], "lang": ["en", "de", "fr"]},
        None, os.path.join(root, "part-2.parquet"),
    )
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(),
        {"add": {"path": "part-0.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ], ts=1_000)
    _commit(log, 1, [
        {"add": {"path": "part-1.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ], ts=2_000)
    # v2 = compaction: both old files removed, one rewritten file added
    _commit(log, 2, [
        {"remove": {"path": "part-0.parquet", "dataChange": False}},
        {"remove": {"path": "part-1.parquet", "dataChange": False}},
        {"add": {"path": "part-2.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": False}},
    ], ts=3_000)


def test_delta_snapshot_and_time_travel(spark, tmp_path):
    from feature_store_api_spark.sources.delta_reader import read_delta

    root = str(tmp_path / "tbl")
    _build_unpartitioned(spark, root)

    def rows(df):
        return sorted((r["k"], r["v"], r["lang"]) for r in df.collect())

    assert rows(read_delta(spark, root, version=0)) == [
        (1, 1.0, "en"), (2, 2.0, "de")]
    assert rows(read_delta(spark, root, version=1)) == [
        (1, 1.0, "en"), (2, 2.0, "de"), (3, 3.0, "fr")]
    head = read_delta(spark, root)  # HEAD = post-compaction rewrite
    assert rows(head) == [(1, 10.0, "en"), (2, 20.0, "de"), (3, 3.0, "fr")]
    assert [f.name for f in head.schema.fields] == ["k", "v", "lang"]

    # timestampAsOf: latest commit at-or-before
    assert rows(read_delta(spark, root, timestamp=2_500)) == rows(
        read_delta(spark, root, version=1))
    assert rows(read_delta(spark, root, timestamp=1_000)) == rows(
        read_delta(spark, root, version=0))
    with pytest.raises(ValueError):
        read_delta(spark, root, timestamp=500)
    with pytest.raises(ValueError):
        read_delta(spark, root, version=9)

    # generic reader dispatch (external-FG data_format="delta")
    from feature_store_api_spark.sources.readers import read as read_files

    assert rows(read_files(spark, "delta", root,
                           options={"versionAsOf": 1})) == rows(
        read_delta(spark, root, version=1))


def test_delta_partition_values_reattached(spark, tmp_path):
    """Partition columns live in add.partitionValues (NOT in the data
    files) and must come back typed through the table schema."""
    from feature_store_api_spark.sources.delta_reader import read_delta

    root = str(tmp_path / "ptbl")
    log = os.path.join(root, "_delta_log")
    _write_parquet(spark, {"k": [1], "v": [1.5]}, None,
                   os.path.join(root, "lang=en/p0.parquet"))
    _write_parquet(spark, {"k": [2], "v": [2.5]}, None,
                   os.path.join(root, "lang=de/p1.parquet"))
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(partition_cols=["lang"]),
        {"add": {"path": "lang=en/p0.parquet",
                 "partitionValues": {"lang": "en"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "lang=de/p1.parquet",
                 "partitionValues": {"lang": "de"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ], ts=1_000)
    df = read_delta(spark, root)
    assert dict((r["k"], (r["v"], r["lang"])) for r in df.collect()) == {
        1: (1.5, "en"), 2: (2.5, "de")}
    assert df.schema["lang"].dataType.typeName() == "string"


def test_delta_checkpoint_replay(spark, tmp_path):
    """A checkpoint parquet + _last_checkpoint replaces versions <= cp;
    only the tail JSON replays after it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feature_store_api_spark.sources.delta_reader import read_delta

    root = str(tmp_path / "ctbl")
    _build_unpartitioned(spark, root)
    log = os.path.join(root, "_delta_log")
    # checkpoint at v1: state = metaData + the two live adds
    add_t = pa.array(
        [None,
         {"path": "part-0.parquet", "partitionValues": {}},
         {"path": "part-1.parquet", "partitionValues": {}}],
        type=pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
        ]),
    )
    md_t = pa.array(
        [{"schemaString": SCHEMA_JSON, "partitionColumns": []}, None, None],
        type=pa.struct([
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
        ]),
    )
    pq.write_table(
        pa.table({"metaData": md_t, "add": add_t}),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": 3}, fh)
    # delete the pre-checkpoint json to PROVE replay starts at the cp
    os.remove(os.path.join(log, f"{0:020d}.json"))

    def rows(df):
        return sorted((r["k"], r["v"], r["lang"]) for r in df.collect())

    assert rows(read_delta(spark, root, version=1)) == [
        (1, 1.0, "en"), (2, 2.0, "de"), (3, 3.0, "fr")]
    assert rows(read_delta(spark, root)) == [
        (1, 10.0, "en"), (2, 20.0, "de"), (3, 3.0, "fr")]


def test_delta_protocol_gate(spark, tmp_path):
    from feature_store_api_spark.sources.delta_reader import read_delta

    root = str(tmp_path / "v3tbl")
    log = os.path.join(root, "_delta_log")
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
        _meta(),
    ], ts=1_000)
    with pytest.raises(NotImplementedError):
        read_delta(spark, root)
