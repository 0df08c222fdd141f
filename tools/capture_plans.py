"""Capture .explain("formatted") for the bench query shapes.

Usage: python tools/capture_plans.py <outdir-suffix> [query ...]

Writes plans/r15/<query>_<suffix>.txt for every lazily-constructible
bench frame (the noop-forced DataFrame right before the sink). Queries
whose timed region is a composition of collects (b6, b7, b9 probes)
capture the dominant sub-plan(s) instead, labeled inside the file.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from feature_store_api_spark import FeatureStore, get_spark, testdata_catalog
from feature_store_api_spark.sources.readers import read_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")


def _explained(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def b1_scan_filter(spark):
    cat = testdata_catalog(spark, SF_DIR)
    li = cat.get_feature_group("lineitem")
    q = (
        li.select(["l_orderkey", "l_linenumber", "l_extendedprice",
                   "l_discount", "l_shipdate"])
        .filter((li.l_shipdate < "1996-01-01") & (li.l_discount >= 0.05))
    )
    return {"main": q.read(spark)}


def b2_multi_join(spark):
    cat = testdata_catalog(spark, SF_DIR)
    o, c, n = (cat.get_feature_group(x) for x in ("orders", "customer", "nation"))
    q = (
        o.select(["o_orderkey", "o_custkey", "o_totalprice"])
        .join(c.select(["c_custkey", "c_name", "c_nationkey"]),
              left_on=["o_custkey"], right_on=["c_custkey"])
        .join(n.select(["n_name"]),
              left_on=["c_nationkey"], right_on=["n_nationkey"], prefix="nat_")
        .filter(o.o_totalprice > 100000)
    )
    return {"main": q.read(spark)}


def b3_upsert_timetravel(spark):
    tmp = tempfile.mkdtemp(prefix="plan_tt_")
    fs = FeatureStore(root=tmp)
    fg = fs.create_feature_group(
        "orders_fg", primary_key=["o_orderkey"], event_time="o_orderdate"
    )
    orders = read_parquet(spark, f"{SF_DIR}/orders.parquet")
    c1 = fg.insert(orders, compute_stats=False)
    fg.insert(
        orders.where(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1),
        compute_stats=False,
    )
    out = {"asof_read": fg.as_of(c1.commit_time).read(spark)}
    # note: tmp intentionally leaked until process exit so the lazy
    # frame stays readable while we explain it
    import atexit
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return out


def b4_pit_join(spark):
    from feature_store_api_spark.operators.pit_join import point_in_time_join_many

    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    orders = read_parquet(spark, f"{SF_DIR}/orders.parquet")
    li = read_parquet(spark, f"{SF_DIR}/lineitem.parquet")
    spine = ev.select("event_id", F.col("user_id").alias("ck"), "ts")
    f1 = orders.select(F.col("o_custkey").alias("ck"), "o_orderdate", "o_totalprice")
    f2 = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("ck"), F.col("l_shipdate"), "l_extendedprice")
    )
    out = point_in_time_join_many(
        spine,
        [
            {"df": f1, "feature_ts": "o_orderdate", "features": ["o_totalprice"], "prefix": "o_"},
            {"df": f2, "feature_ts": "l_shipdate", "features": ["l_extendedprice"], "prefix": "l_"},
        ],
        spine_keys_default=["ck"],
        spine_ts="ts",
    )
    return {"main": out}


def b5_training_data(spark):
    from feature_store_api_spark.functions.builtin_transformations import (
        min_max_scaler, standard_scaler,
    )
    from feature_store_api_spark.operators.pit_join import point_in_time_join
    from feature_store_api_spark.operators.training import prepare_training_data

    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    orders = read_parquet(spark, f"{SF_DIR}/orders.parquet")
    spine = ev.select("event_id", F.col("user_id").alias("ck"), "ts", "value")
    feat = orders.select(F.col("o_custkey").alias("ck"), "o_orderdate", "o_totalprice")
    td = point_in_time_join(
        spine, feat, keys=["ck"], spine_ts="ts", feature_ts="o_orderdate",
        features=["o_totalprice"],
    )
    tfs = [min_max_scaler("value"), standard_scaler("o_totalprice")]
    tdm = prepare_training_data(td, tfs, random={"train": 0.8, "test": 0.2}, seed=42)
    return {"train": tdm["train"], "test": tdm["test"]}


def b6_stats_profile(spark):
    li = read_parquet(spark, f"{SF_DIR}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag"]
    src = li.select(*cols)
    basic = [F.count(F.lit(1)).alias("__total")]
    for c in cols[:4]:
        basic += [F.count(c).alias(f"{c}__nn"), F.min(c).alias(f"{c}__mn"),
                  F.max(c).alias(f"{c}__mx"), F.sum(c).alias(f"{c}__sum"),
                  F.avg(c).alias(f"{c}__avg"), F.stddev(c).alias(f"{c}__sd")]
    return {
        "scalar_agg": src.agg(*basic),
        "exact_distinct_l_extendedprice": src.agg(
            F.countDistinct("l_extendedprice").alias("d")
        ),
        "pctl_bin_l_quantity": (
            src.select(
                F.floor((F.col("l_quantity") - F.lit(1.0)) / F.lit(49.0) * 8192)
                .cast("int").alias("b"))
            .where(F.col("b").isNotNull())
            .groupBy("b").agg(F.count(F.lit(1)).alias("n"))
        ),
    }


def b7_stream_online(spark):
    from feature_store_api_spark.online.store import OnlineStore

    tmp = tempfile.mkdtemp(prefix="plan_onl_")
    import atexit
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    fs = FeatureStore(root=tmp)
    fg = fs.create_feature_group(
        "events_fg", primary_key=["user_id"], event_time="ts", online_enabled=True
    )
    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    online = OnlineStore.for_feature_group(fg)
    seq = online._counter("_seq", bump=True)
    batch = (
        ev.where(F.col("event_id") % 5 == 0)
        .withColumn("_online_seq", F.lit(seq))
        .withColumn("_online_bucket", online._bucket_expr())
    )
    return {"upsert_batch": batch}


def b8_minhash_dedup(spark):
    from feature_store_api_spark.operators.dedup import minhash_lsh_duplicate_pairs

    d = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    return {"main": minhash_lsh_duplicate_pairs(d, "text", "doc_id",
                                                num_hashes=64, bands=16)}


def b9_ann_topk(spark):
    from feature_store_api_spark.operators.similarity import (
        build_ann_index, find_neighbors_ann,
    )

    e = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    idx = build_ann_index(e, "embedding", dim=64)
    return {
        "index_build": idx,
        "probe": find_neighbors_ann(idx, [0.1] * 64, col="embedding", k=10),
    }


def b10_corpus_curation(spark):
    from feature_store_api_spark.operators.dedup import minhash_lsh_duplicate_pairs

    d = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    gated = d.where(F.length("text") >= 100)
    pairs = minhash_lsh_duplicate_pairs(gated, "text", "doc_id",
                                        num_hashes=64, bands=16)
    # duplicate_clusters collects eagerly; capture the pair frame (the
    # dominant cost per r11 profiling) plus the final survivor shape
    # with a stand-in cluster frame
    clusters = pairs.groupBy(F.col("id_a").alias("doc_id")).agg(
        F.min("id_b").alias("cluster_id")
    )
    survivors = gated.join(clusters, on="doc_id", how="left").where(
        F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id"))
    )
    return {
        "pairs": pairs,
        "survivor_join_shape": survivors.select("doc_id", "lang", "source"),
    }


def b11_knn_batch(spark):
    from feature_store_api_spark.operators.similarity import (
        build_ann_index, find_neighbors_batch,
    )

    e = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    idx = build_ann_index(
        e.withColumn("embedding", F.col("embedding").cast("array<double>")),
        "embedding", dim=64,
    )
    qs = [(f"q{i}", [0.03 * (i % 7 + 1)] * 64) for i in range(16)]
    return {"batch_probe": find_neighbors_batch(idx, qs, col="embedding", k=10)}


def e2_incremental_dedup(spark):
    from feature_store_api_spark.operators.dedup import dedup_new_against_corpus

    d = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    return {"main": dedup_new_against_corpus(
        d.where(F.col("doc_id") % 3 == 0),
        d.where(F.col("doc_id") % 3 != 0),
        "text", "doc_id", num_hashes=32, bands=8,
    )}


def e3_doc_chunks(spark):
    from feature_store_api_spark.operators.packing import chunk_documents

    d = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    return {"main": chunk_documents(d, "text", "doc_id", chunk_size=200, overlap=50)}


def e4_exact_window_dedup(spark):
    from feature_store_api_spark.operators.dedup import exact_window_dedup

    d = read_parquet(spark, f"{SF_DIR}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    return {"main": exact_window_dedup(d, "text", "doc_id", window=10)}


def e5_semantic_dedup(spark):
    from feature_store_api_spark.operators.similarity import semantic_dedup

    e = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = e.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.2).alias("embedding"),
    )
    return {"main": semantic_dedup(
        e.unionByName(planted), "embedding", num_clusters=32, threshold=0.99
    )}


def e6_drift_windows(spark):
    from feature_store_api_spark.operators.monitoring import windowed_drift

    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    return {"main": windowed_drift(ev, "value", "ts", window="1 day", buckets=10)}


def e7_label_window(spark):
    from feature_store_api_spark.operators.time_series import label_window_join

    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    orders = read_parquet(spark, f"{SF_DIR}/orders.parquet")
    spine = ev.select("event_id", F.col("user_id").alias("ck"), "ts")
    fut = orders.select(F.col("o_custkey").alias("ck"), "o_orderdate", "o_totalprice")
    return {"main": label_window_join(
        spine, fut, keys=["ck"], spine_ts="ts", event_ts="o_orderdate",
        value_col="o_totalprice", horizon="365 days", aggs=("count", "sum", "max"),
    )}


def e8_negative_sampling(spark):
    from feature_store_api_spark.operators.splits import negative_sampling

    li = read_parquet(spark, f"{SF_DIR}/lineitem.parquet").where(
        F.col("l_linenumber") == 1
    )
    pos = li.select(F.col("l_suppkey").alias("u"), F.col("l_partkey").alias("it"))
    cand = read_parquet(spark, f"{SF_DIR}/part.parquet").select(
        F.col("p_partkey").alias("it")
    )
    return {"main": negative_sampling(pos, cand, "u", "it", n_negatives=4, seed=42)}


BUILDERS = {
    "b1_scan_filter": b1_scan_filter,
    "b2_multi_join": b2_multi_join,
    "b3_upsert_timetravel": b3_upsert_timetravel,
    "b4_pit_join": b4_pit_join,
    "b5_training_data": b5_training_data,
    "b6_stats_profile": b6_stats_profile,
    "b7_stream_online": b7_stream_online,
    "b8_minhash_dedup": b8_minhash_dedup,
    "b9_ann_topk": b9_ann_topk,
    "b10_corpus_curation": b10_corpus_curation,
    "b11_knn_batch": b11_knn_batch,
    "e2_incremental_dedup": e2_incremental_dedup,
    "e3_doc_chunks": e3_doc_chunks,
    "e4_exact_window_dedup": e4_exact_window_dedup,
    "e5_semantic_dedup": e5_semantic_dedup,
    "e6_drift_windows": e6_drift_windows,
    "e7_label_window": e7_label_window,
    "e8_negative_sampling": e8_negative_sampling,
}


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(BUILDERS)
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("fsas-plans")
    for name in names:
        try:
            frames = BUILDERS[name](spark)
            parts = []
            for label, df in frames.items():
                parts.append(f"== {label} ==\n" + _explained(df))
            path = os.path.join(OUT, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write("\n\n".join(parts))
            print(f"wrote {path}")
        except Exception as exc:  # keep going; report at the end
            print(f"FAILED {name}: {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
