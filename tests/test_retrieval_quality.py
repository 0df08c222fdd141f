"""BM25 retrieval, unigram-LM perplexity, temperature sampling."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403 - spark fixture


def _docs(spark):
    rows = [
        (1, "the feature store serves training data to the model"),
        (2, "a data pipeline writes feature data into the feature store"),
        (3, "dogs and cats play in the park all day long"),
        (4, "training a model needs data data data and more data"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_matches_reference_math(spark):
    """Scores equal a driver-side reference implementation of Okapi
    BM25 (+1 idf) on a corpus small enough to hand-verify; docs with no
    query term are absent; ranking total (score desc, id asc)."""
    from feature_store_api_spark.operators.retrieval import (
        bm25_scores,
        bm25_topk,
        tokenize_query,
    )

    docs = _docs(spark).where(F.col("text").isNotNull())
    query = "feature data"
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, query, "text", "doc_id").collect()
    }

    corpus = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    qterms = set(tokenize_query(query))
    df = {
        t: sum(1 for toks in corpus.values() if t in toks) for t in qterms
    }
    expect = {}
    for d, toks in corpus.items():
        s = 0.0
        for t in qterms:
            tf = toks.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        if s:
            expect[d] = round(s, 6)
    assert got == expect
    assert 3 not in got  # no query term -> unscored

    top = [r["doc_id"] for r in bm25_topk(docs, query, "text", "doc_id", k=2).collect()]
    ranked = sorted(expect, key=lambda d: (-expect[d], d))[:2]
    assert top == ranked

    with pytest.raises(ValueError):
        bm25_scores(docs, "!!!", "text", "doc_id")


def test_bm25_plan_shape(spark, sf_dir):
    """Per-query work is pruned to query terms BEFORE the tf agg; no
    cartesian against the corpus; no Python in the plan."""
    from feature_store_api_spark.operators.retrieval import bm25_topk
    from feature_store_api_spark.sources.readers import read_parquet

    d = read_parquet(spark, f"{sf_dir}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    plan = (
        bm25_topk(d, "feature store", "text", "doc_id", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the isin(query terms) filter sits under the tf aggregate
    assert "__tok" in plan and ("feature" in plan and "store" in plan)


def test_unigram_lm_perplexity(spark):
    """avg_nll/ppl equal the closed-form add-alpha unigram math; unseen
    tokens at score time take the smoothed zero-count probability;
    perplexity_filter keeps exactly the low-ppl docs."""
    from feature_store_api_spark.operators.quality_lm import (
        perplexity,
        perplexity_filter,
        train_unigram_lm,
    )

    train = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], "doc_id long, text string"
    )
    lm = train_unigram_lm(train, "text", alpha=0.5)
    # counts: a=3, b=2, c=1; total=6, vocab=3; denom = 6 + 0.5*4 = 8
    p = {"a": 3.5 / 8, "b": 2.5 / 8, "c": 1.5 / 8, None: 0.5 / 8}

    score = spark.createDataFrame(
        [(10, "a b"), (11, "z z")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"], r["ppl"])
        for r in perplexity(score, lm, "text", "doc_id").collect()
    }
    nll_ab = -(math.log(p["a"]) + math.log(p["b"])) / 2
    nll_zz = -math.log(p[None])
    assert got[10] == (2, round(nll_ab, 6), round(math.exp(nll_ab), 6))
    assert got[11] == (2, round(nll_zz, 6), round(math.exp(nll_zz), 6))
    assert got[11][2] > got[10][2]  # unseen text is higher perplexity

    kept = perplexity_filter(
        score, lm, "text", "doc_id", max_ppl=math.exp(nll_ab) + 0.01
    )
    assert [r["doc_id"] for r in kept.collect()] == [10]


def test_temperature_sample_limits(spark):
    """T=1 reproduces the natural distribution (nothing dropped);
    higher T flattens toward uniform (majority class downsampled,
    minority kept whole); deterministic across calls."""
    from feature_store_api_spark.operators.splits import temperature_sample

    rows = [(i, "en" if i < 900 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    t1 = temperature_sample(df, "lang", ["doc_id"], temperature=1.0)
    assert t1.count() == 1000  # natural mixture: keep everything

    t4 = temperature_sample(df, "lang", ["doc_id"], temperature=4.0)
    by = {r["lang"]: r["n"] for r in t4.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by["de"] == 100  # minority class kept whole
    # en target: (900/100)^(1/4) ~ 1.73x de's weight -> ~173 rows ± hash noise
    assert 120 < by["en"] < 230
    again = temperature_sample(df, "lang", ["doc_id"], temperature=4.0)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in t4.collect()
    )

    with pytest.raises(ValueError):
        temperature_sample(df, "lang", ["doc_id"], temperature=0.0)


def test_bm25_persisted_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The persisted BM25 index returns IDENTICAL top-k to the direct
    path, and its tf/df scans prune by the query terms' hash buckets
    (parquet PartitionFilters on __bkt) — per-query I/O tracks the
    query, not the corpus."""
    from feature_store_api_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        save_bm25_index,
    )
    from feature_store_api_spark.sources.readers import read_parquet

    d = read_parquet(spark, f"{sf_dir}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    idx = save_bm25_index(d, str(tmp_path / "bm25"), "text", "doc_id", buckets=16)
    q = "feature store training data pipeline"
    direct = [(r["doc_id"], r["score"]) for r in bm25_topk(d, q, "text", "doc_id", k=15).collect()]
    via_idx = [(r["doc_id"], r["score"]) for r in bm25_topk_indexed(idx, q, k=15).collect()]
    assert via_idx == direct

    plan = (
        bm25_topk_indexed(idx, q, k=15)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    import re
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("__bkt" in x for x in pf), plan


def test_bm25_batch_and_hard_negatives(spark):
    """Batched scoring equals the single-query path per query; hard
    negatives = top candidates minus known positives, re-ranked."""
    from feature_store_api_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_batch,
        mine_hard_negatives,
    )

    docs = _docs(spark).where(F.col("text").isNotNull())
    queries = spark.createDataFrame(
        [(100, "feature data"), (200, "training model")],
        "query_id long, qtext string",
    )
    batch = bm25_topk_batch(
        docs, queries, "text", "doc_id", "qtext", "query_id", k=3
    ).collect()
    for qid, qtext in ((100, "feature data"), (200, "training model")):
        single = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(docs, qtext, "text", "doc_id", k=3).collect()
        ]
        got = sorted(
            ((r["doc_id"], r["score"], r["rank"]) for r in batch
             if r["query_id"] == qid),
            key=lambda x: x[2],
        )
        assert [(d, s) for d, s, _ in got] == single
        assert [rk for _, _, rk in got] == list(range(1, len(got) + 1))

    positives = spark.createDataFrame(
        [(100, 2), (200, 4)], "query_id long, doc_id long"
    )
    negs = mine_hard_negatives(
        docs, queries, positives, "text", "doc_id", "qtext", "query_id",
        k=2, depth=4,
    ).collect()
    by_q = {}
    for r in negs:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    # positives excluded, ranks renumbered from 1
    assert all(d != 2 for _, d in by_q[100])
    assert all(d != 4 for _, d in by_q[200])
    for q in by_q:
        assert [rk for rk, _ in sorted(by_q[q])] == list(range(1, len(by_q[q]) + 1))


def test_dsir_weights_prefer_target_like_docs(spark):
    """DSIR importance log-weights rank raw docs that share the target
    distribution's n-grams above off-distribution docs; dsir_sample is
    deterministic and returns k rows with rounded keys."""
    from feature_store_api_spark.operators.quality_lm import (
        dsir_log_weights,
        dsir_sample,
    )

    target = spark.createDataFrame(
        [(i, "the feature store serves fresh features online") for i in range(20)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (100, "the feature store serves fresh features to models"),
            (101, "zzz qqq xxx vvv kkk jjj www uuu"),
            (102, "feature store features online serving fresh data"),
        ],
        "doc_id long, text string",
    )
    lw = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw, target, "text", "doc_id").collect()
    }
    assert lw[100] > lw[101] and lw[102] > lw[101]

    s1 = dsir_sample(raw, target, "text", "doc_id", k=2).collect()
    s2 = dsir_sample(raw, target, "text", "doc_id", k=2).collect()
    assert [(r["doc_id"], r["gumbel_key"]) for r in s1] == [
        (r["doc_id"], r["gumbel_key"]) for r in s2
    ]
    assert len(s1) == 2
    # single-token docs (no bigrams) must not error
    one = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    assert dsir_log_weights(one, target, "text", "doc_id").count() == 1


def test_retrieval_metrics_math(spark):
    """recall@k / MRR@k / NDCG@k equal hand-computed values; queries
    with truth but no hits score 0; unjudged predictions are dropped."""
    import math

    from feature_store_api_spark.operators.eval_metrics import (
        retrieval_metrics,
        retrieval_metrics_summary,
    )

    preds = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2),
         (9, 90, 1)],  # query 9 has no judgments -> dropped
        "q long, doc long, rank long",
    )
    truth = spark.createDataFrame(
        [(1, 11), (1, 12), (1, 99),   # q1: 3 relevant, hits at rank 2,3
         (2, 77),                     # q2: 1 relevant, no hit
         (3, 30)],                    # q3: judged, never predicted
        "q long, doc long",
    )
    got = {
        r["q"]: (r["n_relevant"], r["hits"], r["recall"], r["mrr"], r["ndcg"])
        for r in retrieval_metrics(preds, truth, "q", "doc", k=3).collect()
    }
    dcg1 = 1 / math.log2(3) + 1 / math.log2(4)
    idcg1 = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert got[1] == (3, 2, round(2 / 3, 6), 0.5, round(dcg1 / idcg1, 6))
    assert got[2] == (1, 0, 0.0, 0.0, 0.0)
    assert got[3] == (1, 0, 0.0, 0.0, 0.0)
    assert 9 not in got

    summary = retrieval_metrics_summary(preds, truth, "q", "doc", k=3).first()
    assert summary["n_queries"] == 3
    assert summary["recall_at_k"] == round((2 / 3) / 3, 6)


def test_bm25_batch_indexed_matches_direct_and_prunes(spark, sf_dir, tmp_path):
    """The INDEXED batch probe returns identical (query, doc, score,
    rank) rows to the direct batch path, its tf scan carries parquet
    PartitionFilters on __bkt, and mine_hard_negatives(index=...) mines
    without re-tokenizing the corpus."""
    import re

    from feature_store_api_spark.operators.retrieval import (
        bm25_topk_batch,
        bm25_topk_batch_indexed,
        mine_hard_negatives,
        save_bm25_index,
    )
    from feature_store_api_spark.sources.readers import read_parquet

    d = read_parquet(spark, f"{sf_dir}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    idx = save_bm25_index(d, str(tmp_path / "bmi"), "text", "doc_id",
                          buckets=16)
    queries = spark.createDataFrame(
        [(1, "feature store training data"), (2, "model pipeline quality"),
         (3, "document text")],
        "query_id long, qtext string",
    )

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in df.collect()
        )

    direct = rows(bm25_topk_batch(
        d, queries, "text", "doc_id", "qtext", "query_id", k=7))
    via_idx = rows(bm25_topk_batch_indexed(
        idx, queries, "qtext", "query_id", k=7))
    assert via_idx == direct and direct

    plan = (
        bm25_topk_batch_indexed(idx, queries, "qtext", "query_id", k=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("__bkt" in x for x in pf), plan

    positives = spark.createDataFrame(
        [(1, direct[0][2])], "query_id long, doc_id long")
    negs_direct = rows(mine_hard_negatives(
        d, queries, positives, "text", "doc_id", "qtext", "query_id",
        k=3, depth=7))
    negs_idx = rows(mine_hard_negatives(
        None, queries, positives, None, "doc_id", "qtext", "query_id",
        k=3, depth=7, index=idx))
    assert negs_idx == negs_direct
    assert all(not (q == 1 and doc == direct[0][2])
               for q, _, doc, _ in negs_idx)
