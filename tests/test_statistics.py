"""Statistics engine vs DuckDB oracle."""

import math

import pytest

from feature_store_api_spark.operators import statistics as st


def test_describe_matches_oracle(spark, catalog, duck):
    li = catalog.get_feature_group("lineitem").read(spark)
    prof = st.describe(li, ["l_quantity", "l_returnflag"], exact_distinct=True)
    o = duck.execute(
        """SELECT COUNT(*) total, COUNT(l_quantity) nn, MIN(l_quantity) mn,
                  MAX(l_quantity) mx, AVG(l_quantity) mean, STDDEV_SAMP(l_quantity) sd,
                  COUNT(DISTINCT l_quantity) ed FROM lineitem"""
    ).fetchone()
    q = prof["l_quantity"]
    assert q["count"] == o[0] and q["numNonNullValues"] == o[1]
    assert q["min"] == o[2] and q["max"] == o[3]
    assert abs(q["mean"] - o[4]) < 1e-9
    assert abs(q["stddev"] - o[5]) < 1e-9
    assert q["exactNumDistinctValues"] == o[6]
    assert prof["l_returnflag"]["exactNumDistinctValues"] == duck.execute(
        "SELECT COUNT(DISTINCT l_returnflag) FROM lineitem"
    ).fetchone()[0]


def test_percentiles_close(spark, catalog, duck):
    li = catalog.get_feature_group("lineitem").read(spark)
    prof = st.describe(li, ["l_extendedprice"])
    p = prof["l_extendedprice"]["percentiles"]
    o = duck.execute(
        "SELECT quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) FROM lineitem"
    ).fetchone()[0]
    for a, b in zip(p, o):
        assert abs(a - b) / abs(b) < 0.02  # approx within 2%


def test_entropy_uniqueness(spark, duck, catalog):
    li = catalog.get_feature_group("lineitem").read(spark)
    ent = st.entropy(li, "l_returnflag")
    o = duck.execute(
        """WITH c AS (SELECT COUNT(*) n FROM lineitem GROUP BY l_returnflag),
                t AS (SELECT SUM(n) s FROM c)
           SELECT -SUM((n/(SELECT s FROM t)) * LN(n/(SELECT s FROM t))) FROM c"""
    ).fetchone()[0]
    assert abs(ent - o) < 1e-9
    u = st.uniqueness(li, "l_orderkey")
    o2 = duck.execute(
        """WITH c AS (SELECT COUNT(*) n FROM lineitem GROUP BY l_orderkey)
           SELECT SUM(CASE WHEN n=1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*) FROM c"""
    ).fetchone()[0]
    assert abs(u - o2) < 1e-12


def test_correlations(spark, catalog, duck):
    li = catalog.get_feature_group("lineitem").read(spark)
    out = {(r["feature_a"], r["feature_b"]): r["corr"]
           for r in st.correlations(li, ["l_quantity", "l_extendedprice"]).collect()}
    o = duck.execute("SELECT CORR(l_quantity, l_extendedprice) FROM lineitem").fetchone()[0]
    assert abs(out[("l_quantity", "l_extendedprice")] - round(o, 6)) <= 1e-6
    assert out[("l_quantity", "l_quantity")] == 1.0


def test_value_counts_topk(spark, catalog, duck):
    li = catalog.get_feature_group("lineitem").read(spark)
    rows = st.value_counts(li, "l_linestatus", k=2).collect()
    o = duck.execute(
        "SELECT l_linestatus, COUNT(*) FROM lineitem GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 2"
    ).fetchall()
    assert [(r["l_linestatus"], r["value_count"]) for r in rows] == o


def test_unique_values(spark, catalog):
    n = catalog.get_feature_group("nation").read(spark)
    vals = st.unique_values(n, "n_regionkey")
    assert sorted(vals) == [0, 1, 2, 3, 4]


def test_footer_minmax_many_files(spark, tmp_path):
    """The footer fast path must fire on a plain scan of a MULTI-file
    table beyond the old 256-file cap (threaded footer reads), return
    the exact global bounds, and reject a filtered plan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "many"
    d.mkdir()
    n_files = 300
    for i in range(n_files):
        pq.write_table(
            pa.table({"v": pa.array([i * 2, i * 2 + 1], type=pa.int64())}),
            str(d / f"part-{i:05d}.parquet"),
        )
    df = spark.read.parquet(str(d))
    mm = st._file_scan_minmax(df.select("v"), ["v"])
    assert mm == {"v": (0, (n_files - 1) * 2 + 1)}
    # a filter could shrink the true range below the footers' — reject
    assert st._file_scan_minmax(df.where("v > 10"), ["v"]) == {}
