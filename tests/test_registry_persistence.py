"""Registry persistence: feature groups, queries, and feature views
(with filters, joins and statistics-bound transformations) survive a
process restart — a FRESH FeatureStore over the same root rehydrates
them from sidecar JSON and produces identical results."""

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark import FeatureStore
from feature_store_api_spark.constructor.query import Query
from feature_store_api_spark.functions.builtin_transformations import (
    min_max_scaler,
)


@pytest.fixture()
def store_root(spark, tmp_path):
    root = str(tmp_path / "fs")
    fs = FeatureStore(root=root)
    ev = fs.create_feature_group(
        "events_fg", primary_key=["eid"], event_time="ts"
    )
    ev.insert(
        spark.createDataFrame(
            [(i, i % 5, float(i), "2024-01-0%d" % (1 + i % 7)) for i in range(40)],
            "eid long, uid long, v double, day string",
        ).select("eid", "uid", "v", F.to_timestamp("day").alias("ts"))
    )
    prof = fs.create_feature_group("profile_fg", primary_key=["uid"], event_time="ts")
    prof.insert(
        spark.createDataFrame(
            [(u, 10.0 * u, "2024-01-01") for u in range(5)],
            "uid long, score double, day string",
        ).select("uid", "score", F.to_timestamp("day").alias("ts"))
    )
    return root, fs


def _build_view(fs):
    ev = fs.get_feature_group("events_fg")
    prof = fs.get_feature_group("profile_fg")
    q = (
        ev.select(["eid", "uid", "ts", "v"])
        .join(prof.select(["score"]), on=["uid"], prefix="p_")
        .filter((ev.v >= 3.0) | (ev.uid == 0))
    )
    return fs.create_feature_view(
        "fv_persist", q, labels=["v"],
        transformation_functions=[min_max_scaler("p_score")],
    )


def test_feature_group_rehydrates(spark, store_root):
    root, fs = store_root
    fresh = FeatureStore(root=root)
    fg = fresh.get_feature_group("events_fg")
    assert fg.primary_key == ["eid"] and fg.event_time == "ts"
    assert fg.read(spark).count() == 40


def test_query_json_roundtrip(spark, store_root):
    root, fs = store_root
    ev = fs.get_feature_group("events_fg")
    q = ev.select(["eid", "v"]).filter(ev.v < 10.0)
    q2 = Query.from_dict(q.to_dict(), fs)
    a = sorted(r["eid"] for r in q.read(spark).collect())
    b = sorted(r["eid"] for r in q2.read(spark).collect())
    assert a == b and len(a) == 10


def test_feature_view_survives_restart(spark, store_root):
    root, fs = store_root
    fv = _build_view(fs)
    before = fv.training_data(spark)

    fresh = FeatureStore(root=root)  # simulates a new process
    fv2 = fresh.get_feature_view("fv_persist")
    assert fv2.labels == ["v"]
    assert [t.name for t in fv2.transformation_functions] == ["min_max_scaler"]
    after = fv2.training_data(spark)
    assert sorted(after.columns) == sorted(before.columns)
    key = [r["eid"] for r in before.select("eid").orderBy("eid").collect()]
    key2 = [r["eid"] for r in after.select("eid").orderBy("eid").collect()]
    assert key == key2
    # scaled column identical after rehydration
    a = {r["eid"]: r["min_max_scaler_p_score"] for r in before.collect()}
    b = {r["eid"]: r["min_max_scaler_p_score"] for r in after.collect()}
    assert a == b


def test_missing_view_raises(store_root):
    root, fs = store_root
    with pytest.raises(KeyError):
        fs.get_feature_view("nope")


def test_versioned_training_datasets(spark, store_root):
    root, fs = store_root
    fv = _build_view(fs)

    m1 = fv.create_training_dataset(
        spark, random={"train": 0.7, "test": 0.3}, seed=5
    )
    assert m1["version"] == 1 and set(m1["splits"]) == {"test", "train"}
    m2 = fv.create_training_dataset(
        spark, data_format="csv", random={"train": 0.7, "test": 0.3}, seed=5
    )
    assert m2["version"] == 2

    # read back: latest by default, pinned version on request
    latest = fv.read_training_dataset(spark)
    v1 = fv.read_training_dataset(spark, version=1)
    n_latest = latest["train"].count() + latest["test"].count()
    n_v1 = v1["train"].count() + v1["test"].count()
    assert n_latest == n_v1 > 0
    # single split read; rehydrated view sees the same datasets
    fv2 = FeatureStore(root=root).get_feature_view("fv_persist")
    tr = fv2.read_training_dataset(spark, version=1, split="train")
    assert tr.count() == v1["train"].count()
    assert "min_max_scaler_p_score" in tr.columns


def test_delete_feature_group_removes_artifacts(spark, tmp_path):
    import os

    fs = FeatureStore(root=str(tmp_path / "del"))
    fg = fs.create_feature_group("victim", primary_key=["k"], online_enabled=True)
    fg.insert(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    loc = fg.location
    assert os.path.isdir(loc)
    fs.delete_feature_group("victim")
    assert not os.path.isdir(loc)
    with pytest.raises(KeyError):
        fs.get_feature_group("victim")


def test_tags_roundtrip(spark, store_root):
    root, fs = store_root
    fg = fs.get_feature_group("events_fg")
    fg.add_tag("owner", "ml-platform")
    fg.add_tag("pii", {"columns": ["uid"]})
    assert fg.get_tag("owner") == "ml-platform"
    fresh = FeatureStore(root=root).get_feature_group("events_fg")
    assert fresh.get_tags() == {"owner": "ml-platform", "pii": {"columns": ["uid"]}}
    fresh.delete_tag("owner")
    assert fresh.get_tag("owner") is None


def test_delete_feature_view(spark, store_root):
    root, fs = store_root
    _build_view(fs)
    fs.delete_feature_view("fv_persist")
    with pytest.raises(KeyError):
        FeatureStore(root=root).get_feature_view("fv_persist")


def test_multi_version_feature_groups(spark, tmp_path):
    fs = FeatureStore(root=str(tmp_path / "mv"))
    v1 = fs.create_feature_group("prices", version=1, primary_key=["k"])
    v1.insert(spark.createDataFrame([(1, 10.0)], "k long, p double"))
    v2 = fs.create_feature_group("prices", version=2, primary_key=["k"])
    v2.insert(spark.createDataFrame([(1, 99.0), (2, 5.0)], "k long, p double"))

    assert fs.get_feature_group("prices").read(spark).count() == 1
    assert fs.get_feature_group("prices", 2).read(spark).count() == 2
    # fs.sql binds <name> to v1 and <name>_<version> for each
    n2 = fs.sql("SELECT count(*) AS n FROM prices_2", spark).first()["n"]
    n1 = fs.sql("SELECT count(*) AS n FROM prices", spark).first()["n"]
    assert (n1, n2) == (1, 2)
    # both rehydrate independently
    fresh = FeatureStore(root=fs.root)
    assert fresh.get_feature_group("prices", 2).read(spark).count() == 2
    assert fresh.get_feature_group("prices", 1).read(spark).count() == 1


def test_get_all_versions_of_groups_and_views(spark, tmp_path):
    """fs.get_feature_groups/get_feature_views return every version,
    ascending — registered AND persisted-on-disk (parity
    feature_store.py:168,1725)."""
    from feature_store_api_spark import FeatureStore

    fs = FeatureStore(root=str(tmp_path))
    for v in (1, 2):
        fg = fs.create_feature_group("multi", version=v, primary_key=["k"])
        fg.insert(spark.createDataFrame([(1, v)], "k long, x long"))
        fs.create_feature_view("mview", fg.select_all(), version=v)
    # name-prefix cousin must not leak into the version list
    fs.create_feature_group("multi_extra", primary_key=["k"])

    fresh = FeatureStore(root=str(tmp_path))  # nothing registered in memory
    groups = fresh.get_feature_groups("multi")
    assert [(g.name, g.version) for g in groups] == [("multi", 1), ("multi", 2)]
    views = fresh.get_feature_views("mview")
    assert [(v.name, v.version) for v in views] == [("mview", 1), ("mview", 2)]
    assert fresh.get_feature_groups("nope") == []


def test_store_level_registries(spark, tmp_path):
    """Store-level registries: get_or_create_feature_view, named
    storage connectors, and the persisted transformation-function
    registry (parity feature_store.py create/get_transformation_function,
    get_storage_connector)."""
    import pytest as _pytest

    from feature_store_api_spark import FeatureStore
    from feature_store_api_spark.functions.udf import udf
    from feature_store_api_spark.sources.connectors import JdbcConnector

    fs = FeatureStore(root=str(tmp_path))
    fg = fs.create_feature_group("g", primary_key=["k"])
    fg.insert(spark.createDataFrame([(1, 2.0)], "k long, v double"))

    fv1 = fs.get_or_create_feature_view("gv", fg.select_all())
    fv2 = fs.get_or_create_feature_view("gv")  # existing: query optional
    assert fv1 is fv2
    with _pytest.raises(ValueError, match="no\\s+query"):
        fs.get_or_create_feature_view("missing")

    conn = JdbcConnector("warehouse", "jdbc:postgresql://h/db", user="u", password="p")
    fs.register_storage_connector(conn)
    assert fs.get_storage_connector("warehouse") is conn
    with _pytest.raises(KeyError):
        fs.get_storage_connector("nope")
    with _pytest.raises(NotImplementedError):
        fs.get_online_storage_connector()

    @udf("double")
    def plus_one(v):
        return v + 1

    fs.create_transformation_function(plus_one, version=2)
    got = fs.get_transformation_function("plus_one", version=2)
    assert got.name == "plus_one"
    # persisted: a fresh store over the same root revives it from source
    fresh = FeatureStore(root=str(tmp_path))
    revived = fresh.get_transformation_function("plus_one", version=2)
    assert revived.name == "plus_one"
    assert [f.name for f in fresh.get_transformation_functions()] == ["plus_one"]
    with _pytest.raises(KeyError):
        fresh.get_transformation_function("plus_one", version=9)
