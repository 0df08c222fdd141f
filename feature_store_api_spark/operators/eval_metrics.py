"""Retrieval evaluation metrics: recall@k, MRR@k, NDCG@k.

Companion to the retrieval/ANN family: score a table of ranked
predictions against a ground-truth table, entirely as aggregations —
the offline-eval loop for BM25/ANN indexes runs on the cluster, not
row-by-row on the driver.

Definitions (binary relevance, the standard IR forms):

* recall@k   = |retrieved@k ∩ relevant| / |relevant| per query;
* MRR@k      = 1 / rank of the first relevant hit (0 if none);
* NDCG@k     = Σ_{hits} 1/log2(rank+1)  /  Σ_{i=1..min(|relevant|,k)}
  1/log2(i+1).

Shape: one equi-join of predictions (already ≤ k rows/query) against
the truth pairs, one groupBy(query) for the per-query metrics, one
tiny global mean. Everything is rounded for engine portability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    predictions: DataFrame,
    truth: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str = "rank",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Per-query metrics: ``(query_col, n_relevant, hits, recall,
    mrr, ndcg)``. Queries with truth but no predictions score 0;
    predictions for queries absent from ``truth`` are dropped (no
    relevance judgments — the convention of trec_eval)."""
    preds = predictions.where(F.col(rank_col) <= k).select(
        F.col(query_col), F.col(doc_col), F.col(rank_col).alias("__rank")
    )
    t = truth.select(query_col, doc_col).distinct()
    n_rel = t.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_relevant")
    )
    hits = preds.join(t, on=[query_col, doc_col], how="inner")
    per_q = hits.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("hits"),
        F.min("__rank").alias("__first"),
        F.sum(1.0 / F.log2(F.col("__rank") + 1.0)).alias("__dcg"),
    )
    out = (
        n_rel.join(per_q, on=query_col, how="left")
        .select(
            query_col,
            "n_relevant",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_relevant"),
                round_to,
            ).alias("recall"),
            F.round(
                F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), round_to
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("__dcg"), F.lit(0.0))
                / F.aggregate(
                    F.sequence(
                        F.lit(1), F.least(F.col("n_relevant"), F.lit(k))
                    ),
                    F.lit(0.0),
                    lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
                ),
                round_to,
            ).alias("ndcg"),
        )
    )
    return out


def retrieval_metrics_summary(
    predictions: DataFrame,
    truth: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Macro-averaged one-row summary over all judged queries."""
    per_q = retrieval_metrics(
        predictions, truth, query_col, doc_col, rank_col, k, round_to=9
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 6).alias("recall_at_k"),
        F.round(F.avg("mrr"), 6).alias("mrr_at_k"),
        F.round(F.avg("ndcg"), 6).alias("ndcg_at_k"),
    )
