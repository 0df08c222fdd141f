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


def test_hudi_archived_instants_still_committed(spark, tmp_path):
    """Base files whose instant was archived out of the active timeline
    are committed by the file-system-view rule, not silently dropped."""
    from feature_store_api_spark.sources.hudi_reader import (
        hudi_incremental,
        read_hudi,
    )

    root = str(tmp_path / "harch")
    _build(root)
    meta = os.path.join(root, ".hoodie")
    # archive instant 100 out of the active timeline
    os.remove(os.path.join(meta, "100.commit"))
    arch = os.path.join(meta, "archived")
    os.makedirs(arch)
    with open(os.path.join(arch, ".commits_.archive.1_1-0-1"), "w") as fh:
        fh.write("")

    def rows(df):
        return sorted((r["k"], r["v"]) for r in df.collect())

    # fg-b's only base file carries archived instant 100 — must be kept
    assert rows(read_hudi(spark, root)) == [(1, 10.0), (2, 2.0), (3, 3.0)]
    # inflight 300 still invisible even though it's above the boundary
    assert rows(read_hudi(spark, root, as_of_instant="250")) == [
        (1, 10.0), (2, 2.0), (3, 3.0)]
    # incremental pull whose window reaches below the archive boundary
    # is unresolvable commit-by-commit (archived commits in the window
    # would be silently missing): loud error, not silent rows
    with pytest.raises(ValueError, match="archived"):
        hudi_incremental(spark, root, "050", "200")
    with pytest.raises(ValueError, match="archived"):
        hudi_incremental(spark, root, "100", "200")
    # pull windows starting at/inside the active timeline still work
    assert hudi_incremental(spark, root, "200", None).count() == 0


def test_hudi_replacecommit_excludes_replaced_groups(spark, tmp_path):
    """Clustering (replacecommit) supersedes old file groups; snapshots
    at/after the replace instant must not see both generations."""
    import json as _json

    from feature_store_api_spark.sources.hudi_reader import read_hudi

    root = str(tmp_path / "hrepl")
    _build(root)
    meta = os.path.join(root, ".hoodie")
    # instant 400: clustering rewrites fg-a+fg-b into one new group fg-c
    _pq({"k": [1, 2, 3], "v": [10.0, 2.0, 3.0]},
        os.path.join(root, "dt=1", "fg-c_0-4-0_400.parquet"))
    with open(os.path.join(meta, "400.replacecommit"), "w") as fh:
        _json.dump(
            {"partitionToReplaceFileIds": {"dt=1": ["fg-a", "fg-b"]}}, fh
        )

    def rows(df):
        return sorted((r["k"], r["v"]) for r in df.collect())

    # snapshot: only the clustered generation (no duplicates)
    assert rows(read_hudi(spark, root)) == [(1, 10.0), (2, 2.0), (3, 3.0)]
    # time travel BEFORE the replacecommit: the old generation
    assert rows(read_hudi(spark, root, as_of_instant="200")) == [
        (1, 10.0), (2, 2.0), (3, 3.0)]
    assert rows(read_hudi(spark, root, as_of_instant="100")) == [
        (1, 1.0), (2, 2.0), (3, 3.0)]
