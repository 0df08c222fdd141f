"""Query compiler tests against the DuckDB oracle (FIXTURES.md F6)."""

import pytest

from tests.conftest import assert_df_equal


def test_select_filter(catalog, spark, duck):
    li = catalog.get_feature_group("lineitem")
    q = li.select(["l_orderkey", "l_quantity"]).filter(li.l_quantity > 40)
    assert_df_equal(
        q.read(spark),
        duck.execute("SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 40"),
    )


def test_select_all_excludes(catalog, spark):
    o = catalog.get_feature_group("orders")
    q = o.select_all(include_primary_key=False)
    assert "o_orderkey" not in [f.name for f in q.left_features]
    q2 = o.select_all(include_event_time=False)
    assert "o_orderdate" not in [f.name for f in q2.left_features]


def test_join_pk_inference_and_prefix(catalog, spark, duck):
    c = catalog.get_feature_group("customer")
    q = c.select(["c_custkey", "c_name"]).join(
        catalog.get_feature_group("customer").select(["c_acctbal"]), prefix="p_"
    )
    assert_df_equal(
        q.read(spark),
        duck.execute(
            "SELECT a.c_custkey, a.c_name, b.c_acctbal AS p_c_acctbal "
            "FROM customer a LEFT JOIN customer b USING (c_custkey)"
        ),
    )


def test_join_no_shared_pk_raises(catalog, spark):
    o = catalog.get_feature_group("orders")
    n = catalog.get_feature_group("nation")
    q = o.select_all().join(n.select_all())
    with pytest.raises(ValueError, match="No join keys"):
        q.read(spark)


def test_ambiguous_selection_raises(catalog, spark):
    c1 = catalog.get_feature_group("customer")
    c2 = catalog.get_feature_group("customer")
    q = c1.select(["c_custkey", "c_acctbal"]).join(c2.select(["c_acctbal"]))
    with pytest.raises(ValueError, match="Ambiguous"):
        q.read(spark)


def test_filters_survive_joins(catalog, spark, duck):
    """Sub-query filters land in the root WHERE (constructor/query.py:775-785)."""
    o = catalog.get_feature_group("orders")
    c = catalog.get_feature_group("customer")
    sub = c.select(["c_custkey", "c_acctbal"]).filter(c.c_acctbal > 5000)
    q = o.select(["o_orderkey", "o_custkey"]).join(
        sub, left_on=["o_custkey"], right_on=["c_custkey"]
    )
    assert_df_equal(
        q.read(spark),
        duck.execute(
            "SELECT o_orderkey, o_custkey, c_custkey, c_acctbal "
            "FROM orders LEFT JOIN customer ON o_custkey = c_custkey "
            "WHERE c_acctbal > 5000"
        ),
    )


def test_self_join_scoped_filters(catalog, spark, duck):
    """Same FG on both sides: each side's filter resolves to its own columns."""
    c1 = catalog.get_feature_group("customer")
    c2 = catalog.get_feature_group("customer")
    lo = c1.select(["c_custkey", "c_name"]).filter(c1.c_acctbal < 0)
    hi = c2.select(["c_mktsegment"]).filter(c2.c_acctbal >= 0)
    q = lo.join(hi, on=["c_custkey"], join_type="inner")
    # inner join + conjunct filters: a customer can't satisfy both → empty
    assert q.read(spark).count() == 0


def test_cross_join(catalog, spark, duck):
    r = catalog.get_feature_group("region")
    n = catalog.get_feature_group("nation")
    q = r.select(["r_name"]).join(n.select(["n_name"]), join_type="cross", prefix="x_")
    assert q.read(spark).count() == duck.execute(
        "SELECT COUNT(*) FROM region CROSS JOIN nation"
    ).fetchone()[0]


def test_append_feature(catalog, spark):
    c = catalog.get_feature_group("customer")
    q = c.select(["c_custkey"])
    q.append_feature(c.get_feature("c_acctbal"))
    assert set(q.read(spark).columns) == {"c_custkey", "c_acctbal"}


def test_fs_sql(catalog, spark, duck):
    df = catalog.sql("SELECT COUNT(*) AS n FROM orders", spark)
    assert df.collect()[0]["n"] == duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]

def test_online_preview_strips_where_and_limits(spark, tmp_path):
    """Query.preview(online=True) mirrors the reference's preview
    statement (online_store_sql_engine.py:464-465): WHERE stripped,
    LIMIT applied to the latest-per-key online view."""
    from feature_store_api_spark import FeatureStore

    fs = FeatureStore(root=str(tmp_path))
    fg = fs.create_feature_group(
        "prev_fg", primary_key=["uid"], event_time="ts", online_enabled=True,
    )
    df = spark.createDataFrame(
        [(u, t, float(u * 10 + t)) for u in range(5) for t in range(3)],
        "uid long, ts long, v double",
    )
    fg.insert(df, compute_stats=False)
    q = fg.select(["uid", "ts", "v"]).filter(fg.v > 1e9)  # drops everything
    # offline read honors the filter
    assert q.read(spark).count() == 0
    # online preview ignores it: 5 latest rows (one per uid), ts == 2
    full = q.preview(n=100, spark=spark, online=True).collect()
    assert len(full) == 5 and all(r["ts"] == 2 for r in full)
    # and the limit caps the row count
    assert len(q.preview(n=3, spark=spark, online=True).collect()) == 3


def test_read_dataframe_type_conversions(spark, catalog):
    fg = catalog.get_feature_group("nation")
    q = fg.select(["n_nationkey", "n_name"])
    import pandas as pd

    pdf = q.read(spark, dataframe_type="pandas")
    assert isinstance(pdf, pd.DataFrame) and len(pdf) == 25
    arr = q.read(spark, dataframe_type="numpy")
    assert arr.shape == (25, 2)
    rows = q.read(spark, dataframe_type="python")
    assert len(rows) == 25 and isinstance(rows[0], list)
    with pytest.raises(ValueError):
        q.read(spark, dataframe_type="polars")
