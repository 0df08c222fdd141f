"""Explicit provenance links (parity core/explicit_provenance.py,
feature_group.py:534-601, feature_view.py:1145-1155)."""

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark import FeatureStore


@pytest.fixture()
def fs(tmp_path):
    return FeatureStore(root=str(tmp_path))


def test_view_parent_feature_groups(spark, fs):
    a = fs.create_feature_group("fg_a", primary_key=["k"])
    a.insert(spark.createDataFrame([(1, 10.0)], "k long, x double"))
    b = fs.create_feature_group("fg_b", primary_key=["k"])
    b.insert(spark.createDataFrame([(1, 5.0)], "k long, y double"))
    fv = fs.create_feature_view(
        "ab_view", a.select_all().join(b.select(["y"]), on=["k"])
    )
    links = fv.get_parent_feature_groups()
    assert {g.name for g in links.accessible} == {"fg_a", "fg_b"}
    assert links.deleted == []


def test_fg_generated_feature_views_incl_persisted(spark, fs, tmp_path):
    a = fs.create_feature_group("fg_a", primary_key=["k"])
    a.insert(spark.createDataFrame([(1, 10.0)], "k long, x double"))
    fs.create_feature_view("v1", a.select_all())
    links = a.get_generated_feature_views()
    assert [v.name for v in links.accessible] == ["v1"]

    # a FRESH store over the same root resolves the persisted view too
    fs2 = FeatureStore(root=str(tmp_path))
    a2 = fs2.get_feature_group("fg_a")
    links2 = a2.get_generated_feature_views()
    assert [v.name for v in links2.accessible] == ["v1"]


def test_fg_parents_derived_from_ingest_plan(spark, fs):
    """insert(df) where df reads other managed groups records those
    groups as parents — lineage straight from the physical plan."""
    src = fs.create_feature_group("src_fg", primary_key=["k"])
    src.insert(spark.createDataFrame([(1, 10.0), (2, 4.0)], "k long, x double"))
    other = fs.create_feature_group("other_fg", primary_key=["k"])
    other.insert(spark.createDataFrame([(1, 1.0)], "k long, z double"))

    derived = fs.create_feature_group("derived_fg", primary_key=["k"])
    derived.insert(
        src.read(spark).withColumn("x2", F.col("x") * 2).drop("x")
    )
    parents = derived.get_parent_feature_groups()
    assert [g.name for g in parents.accessible] == ["src_fg"]

    # explicit parents= augments (e.g. lineage-truncated plans)
    derived.insert(
        spark.createDataFrame([(9, 0.0)], "k long, x2 double"),
        parents=[other],
    )
    parents = derived.get_parent_feature_groups()
    assert {g.name for g in parents.accessible} == {"src_fg", "other_fg"}


def test_deleted_parent_shows_in_deleted_bucket(spark, fs):
    src = fs.create_feature_group("gone_fg", primary_key=["k"])
    src.insert(spark.createDataFrame([(1, 1.0)], "k long, x double"))
    derived = fs.create_feature_group("child_fg", primary_key=["k"])
    derived.insert(src.read(spark))
    fs.delete_feature_group("gone_fg")
    links = derived.get_parent_feature_groups()
    assert links.accessible == []
    assert [(a.name, a.artifact_type) for a in links.deleted] == [
        ("gone_fg", "FEATURE_GROUP")
    ]


def test_generated_views_skip_sidecar_jsons(spark, fs, tmp_path):
    """_feature_views/ also holds monitoring configs and tags
    ({name}_{ver}_monitoring.json / _tags.json) with different shapes —
    get_generated_feature_views must skip them instead of KeyErroring
    once a view has monitoring or tags attached."""
    a = fs.create_feature_group("fg_a", primary_key=["k"])
    a.insert(spark.createDataFrame([(1, 10.0)], "k long, x double"))
    v = fs.create_feature_view("v1", a.select_all())
    v.add_tag("owner", "ops")  # writes v1_1_tags.json into _feature_views/

    fs2 = FeatureStore(root=str(tmp_path))
    a2 = fs2.get_feature_group("fg_a")
    links = a2.get_generated_feature_views()
    assert [x.name for x in links.accessible] == ["v1"]


# ---------------------------------------------------------------------------
# model registry provenance (parity feature_view.py:1157-1208)
# ---------------------------------------------------------------------------

def _view_with_models(spark, fs):
    from feature_store_api_spark.model_registry import Model

    a = fs.create_feature_group("fg_m", primary_key=["k"])
    a.insert(spark.createDataFrame([(1, 10.0), (2, 3.0)], "k long, x double"))
    fv = fs.create_feature_view("mv", a.select_all())
    reg = fs.get_model_registry()
    reg.save(Model("clf", created=1000, feature_view_name="mv",
                   feature_view_version=1, training_dataset_version=1,
                   metrics={"auc": 0.7}))
    reg.save(Model("clf", created=3000, feature_view_name="mv",
                   feature_view_version=1, training_dataset_version=2,
                   metrics={"auc": 0.9}))
    reg.save(Model("other", created=2000, feature_view_name="unrelated",
                   feature_view_version=1))
    return fv, reg


def test_feature_view_get_models_filters_by_view_and_td(spark, fs):
    fv, _ = _view_with_models(spark, fs)
    assert [(m.name, m.version) for m in fv.get_models()] == [
        ("clf", 1), ("clf", 2)
    ]
    assert [m.version for m in fv.get_models(training_dataset_version=2)] == [2]
    assert fv.get_models(training_dataset_version=9) == []


def test_feature_view_get_newest_model_sorts_by_created(spark, fs):
    fv, _ = _view_with_models(spark, fs)
    assert fv.get_newest_model().created == 3000
    assert fv.get_newest_model(training_dataset_version=1).created == 1000
    assert fv.get_newest_model(training_dataset_version=9) is None


def test_model_registry_versioning_and_fetch(spark, fs):
    fv, reg = _view_with_models(spark, fs)
    # auto-increment over existing versions of the same name
    from feature_store_api_spark.model_registry import Model
    m3 = reg.save(Model("clf", created=4000, feature_view_name="mv",
                        feature_view_version=1), version=None)
    assert m3.version == 3
    assert reg.get_model("clf").version == 3
    assert reg.get_model("clf", version=1).metrics == {"auc": 0.7}
    with pytest.raises(KeyError):
        reg.get_model("absent")
    reg.delete_model("clf", 3)
    assert reg.get_model("clf").version == 2


def test_models_provenance_classifies_faulty(spark, fs, tmp_path):
    import os

    fv, reg = _view_with_models(spark, fs)
    # a corrupt version sidecar of a model LINKED to this view is faulty…
    with open(os.path.join(reg.root, "clf_9.json"), "w") as fh:
        fh.write("{not json")
    # …but an unrelated corrupt file must NOT pollute this view's links
    with open(os.path.join(reg.root, "broken_1.json"), "w") as fh:
        fh.write("{not json")
    links = fv.get_models_provenance()
    assert [m.name for m in links.accessible] == ["clf", "clf"]
    assert [a.name for a in links.faulty] == ["clf_9"]
    assert links.deleted == []


def test_model_registry_name_prefix_isolation(spark, fs):
    """'churn' must not absorb 'churn_v2' entries (churn_v2_1.json
    starts with 'churn_') — versions, auto-increment and get_model stay
    scoped to the exact parsed name."""
    from feature_store_api_spark.model_registry import Model

    reg = fs.get_model_registry()
    reg.save(Model("churn_v2", created=100), version=5)
    m = reg.save(Model("churn", created=200), version=None)
    assert m.version == 1  # not max(churn_v2)+1
    assert reg.get_model("churn").name == "churn"
    assert [x.version for x in reg._load("churn")] == [1]


def test_model_registry_numeric_version_ordering(spark, fs):
    from feature_store_api_spark.model_registry import Model

    reg = fs.get_model_registry()
    for v in (1, 2, 10):
        reg.save(Model("m", created=v), version=v)
    assert [x.version for x in reg._load("m")] == [1, 2, 10]
    assert reg.get_model("m").version == 10


def test_model_registry_survives_fresh_store(spark, fs, tmp_path):
    _view_with_models(spark, fs)
    fs2 = FeatureStore(root=fs.root)
    fv2 = fs2.get_feature_view("mv")
    newest = fv2.get_newest_model()
    assert (newest.name, newest.training_dataset_version) == ("clf", 2)


def test_models_provenance_faulty_survives_td_filter(spark, fs):
    """A corrupt sidecar of a model linked to the view stays faulty even
    when a training_dataset_version filter empties `accessible`."""
    import os

    fv, reg = _view_with_models(spark, fs)
    with open(os.path.join(reg.root, "clf_9.json"), "w") as fh:
        fh.write("{not json")
    links = fv.get_models_provenance(training_dataset_version=999)
    assert links.accessible == []
    assert [a.name for a in links.faulty] == ["clf_9"]


def test_storage_connector_provenance(spark, tmp_path):
    """FG <-> connector lineage (parity reference feature_group.py:549-586):
    external groups expose their connector parent as Links; managed
    groups have none; a deregistered connector surfaces as deleted and
    a name-only reference as inaccessible."""
    import warnings

    from feature_store_api_spark import FeatureStore
    from feature_store_api_spark.sources.connectors import StorageConnector

    fs = FeatureStore(root=str(tmp_path))
    managed = fs.create_feature_group("mg_conn", primary_key=["k"])
    links = managed.get_storage_connector_provenance()
    assert links.accessible == [] and links.deleted == []
    assert managed.get_storage_connector() is None

    csv = str(tmp_path / "ext.csv")
    with open(csv, "w") as f:
        f.write("k,v\n1,2\n")
    conn = StorageConnector("lake")
    fs.register_storage_connector(conn)
    ext = fs.create_external_feature_group(
        "ext_conn", conn, path=csv, data_format="csv",
        options={"header": "true", "inferSchema": "true"},
    )
    links = ext.get_storage_connector_provenance()
    assert links.accessible == [conn]
    assert ext.get_storage_connector() is conn

    # deregistered -> deleted (minimal Artifact info)
    fs._connectors.pop("lake")
    links = ext.get_storage_connector_provenance()
    assert not links.accessible
    assert [a.name for a in links.deleted] == ["lake"]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert ext.get_storage_connector() is None
    assert any("deleted or inaccessible" in str(x.message) for x in w)

    # name-only reference -> inaccessible
    ext.storage_connector = "lake"
    links = ext.get_storage_connector_provenance()
    assert [a.name for a in links.inaccessible] == ["lake"]
    assert [a.artifact_type for a in links.inaccessible] == ["STORAGE_CONNECTOR"]
