"""Jarless Hudi COW reader: fixtures follow the published layout
(.hoodie timeline + <fileId>_<token>_<instant>.parquet base files)."""

import os

import pytest

from tests.conftest import *  # noqa: F401,F403 - spark fixture


def _pq(rows, path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table(rows), path)


def _commit(meta, instant):
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, f"{instant}.commit"), "w") as fh:
        fh.write("{}")


def _build(root):
    meta = os.path.join(root, ".hoodie")
    os.makedirs(meta, exist_ok=True)
    with open(os.path.join(meta, "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    # instant 100: two file groups (fg-a, fg-b) in partition dt=1
    _pq({"k": [1, 2], "v": [1.0, 2.0]},
        os.path.join(root, "dt=1", "fg-a_0-1-0_100.parquet"))
    _pq({"k": [3], "v": [3.0]},
        os.path.join(root, "dt=1", "fg-b_0-1-0_100.parquet"))
    _commit(meta, "100")
    # instant 200: COW rewrite of file group fg-a (k=1 updated)
    _pq({"k": [1, 2], "v": [10.0, 2.0]},
        os.path.join(root, "dt=1", "fg-a_0-2-0_200.parquet"))
    _commit(meta, "200")
    # instant 300: INFLIGHT (no .commit) rewrite of fg-b — invisible
    _pq({"k": [3], "v": [999.0]},
        os.path.join(root, "dt=1", "fg-b_0-3-0_300.parquet"))
    with open(os.path.join(meta, "300.commit.inflight"), "w") as fh:
        fh.write("")


def test_hudi_cow_snapshot_time_travel_incremental(spark, tmp_path):
    from feature_store_api_spark.sources.hudi_reader import (
        hudi_incremental,
        read_hudi,
    )

    root = str(tmp_path / "htbl")
    _build(root)

    def rows(df):
        return sorted((r["k"], r["v"]) for r in df.collect())

    # snapshot: fg-a@200 + fg-b@100; inflight 300 invisible
    assert rows(read_hudi(spark, root)) == [(1, 10.0), (2, 2.0), (3, 3.0)]
    # as-of 100: the original file group versions
    assert rows(read_hudi(spark, root, as_of_instant="100")) == [
        (1, 1.0), (2, 2.0), (3, 3.0)]
    with pytest.raises(ValueError):
        read_hudi(spark, root, as_of_instant="050")

    # incremental (100, 200]: only the rewritten file group's rows
    assert rows(hudi_incremental(spark, root, "100", "200")) == [
        (1, 10.0), (2, 2.0)]
    assert hudi_incremental(spark, root, "200", None).count() == 0

    # MOR gate
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.type=MERGE_ON_READ\n")
    with pytest.raises(NotImplementedError):
        read_hudi(spark, root)
