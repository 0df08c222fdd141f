"""Distributed lexical retrieval: BM25 scoring / top-k.

Beyond-reference operator for training-data pipelines (the reference's
vector search covers dense retrieval; this is its sparse twin): rank a
document corpus against a query with Okapi BM25 (Robertson/Sparck
Jones; the +1 idf variant Lucene uses so scores never go negative).
Used for hard-negative mining, dedup-aware retrieval evaluation, and
seed-document expansion over raw corpora.

Spark-first shape (100 TB posture):

* tokenization and term stats are plain codegen'd expressions —
  explode → two hash aggregations; no Python in the plan;
* everything PER-QUERY is pruned to the query's terms BEFORE the tf
  aggregation, so the per-query cost tracks ``docs containing a query
  term``, not the corpus; only the document-length pass (an intrinsic
  BM25 input) touches every token once;
* the 1-row corpus stats (N, avgdl) and the ≤|query|-row df table ride
  broadcast joins — no shuffle joins anywhere except the two
  aggregations.

Scores are deterministic: final ordering breaks ties by document id,
and the score is rounded so an external engine (the DuckDB oracle)
reproduces the ranking bit-for-bit.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = "[^a-z0-9]+"


def _tokens(col):
    """lowercase → non-alphanumeric runs to spaces → split; empty
    strings filtered by the caller (explode of filter())."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(col), _TOKEN_RE, " "), " "),
        lambda t: t != "",
    )


def tokenize_query(query: str) -> list:
    """Driver-side twin of :func:`_tokens` for the query string."""
    return [t for t in re.sub(_TOKEN_RE, " ", query.lower()).split(" ") if t]


def bm25_scores(
    docs: DataFrame,
    query: str,
    text_col: str,
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """Okapi BM25 score of every document matching ≥1 query term.

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    Returns ``(id_col, score)``. The token pass and the per-document
    length pass are each ONE aggregation; the query-term pruning
    happens before the tf aggregation so a 3-term query against a
    100 TB corpus aggregates only the rows of those 3 terms.
    """
    qterms = sorted(set(tokenize_query(query)))
    if not qterms:
        raise ValueError("bm25: query has no tokens")
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("__tok")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        toks.where(F.col("__tok").isin(qterms))
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    score = (
        tf.join(F.broadcast(dfreq), on="__tok")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(idf * tf_part).alias("score"))
    )
    if round_to is not None:
        score = score.select(
            id_col, F.round(F.col("score"), round_to).alias("score")
        )
    return score


def bm25_topk(
    docs: DataFrame,
    query: str,
    text_col: str,
    id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 retrieval; ties broken by ascending document id so
    the ranking is total and engine-portable."""
    scored = bm25_scores(docs, query, text_col, id_col, k1=k1, b=b)
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    query_text_col: str,
    query_id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """BM25 top-k for a whole TABLE of queries in ONE plan — the shape
    of offline retrieval evaluation and hard-negative mining, where
    per-query jobs would mean millions of driver round trips.

    Unique (query, term) rows join the corpus tf table on term (one
    hash equi-join; a hot term fans out to its posting list exactly as
    an inverted index would), scores aggregate per (query, doc), and a
    per-query window keeps the top k (score desc, doc id asc — total
    order). Document frequencies are computed only for terms some query
    uses (semi-join pruning). Output: (query_id, id_col, score, rank).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("__tok")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    qtok = queries.select(
        F.col(query_id_col),
        F.explode(_tokens(F.col(query_text_col))).alias("__tok"),
    ).distinct()  # BM25 sums each query term once
    tf = (
        toks.join(
            F.broadcast(qtok.select("__tok").distinct()), on="__tok",
            how="left_semi",
        )
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(qtok, on="__tok")
        .join(F.broadcast(dfreq), on="__tok")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, id_col)
        .agg(F.sum(idf * tf_part).alias("score"))
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def mine_hard_negatives(
    docs: Optional[DataFrame],
    queries: DataFrame,
    positives: DataFrame,
    text_col: Optional[str],
    id_col: str,
    query_text_col: str,
    query_id_col: str,
    k: int = 10,
    depth: int = 50,
    index: Optional["BM25Index"] = None,
) -> DataFrame:
    """Contrastive-training hard negatives: per query, the top-scoring
    BM25 documents that are NOT known positives — lexically confusable
    non-answers (the standard DPR/sentence-transformers mining recipe,
    with BM25 as the retriever). ``positives`` holds
    (query_id_col, id_col) pairs; retrieval goes ``depth`` deep so k
    negatives usually survive the anti-join; ranks are re-numbered
    after filtering.

    Pass ``index=`` (a persisted :class:`BM25Index`; ``docs`` and
    ``text_col`` may then be None) to mine against a large fixed
    corpus without re-tokenizing it — the probe reads only the query
    terms' pruned buckets."""
    from pyspark.sql import Window

    if index is not None:
        cand = bm25_topk_batch_indexed(
            index, queries, query_text_col, query_id_col, k=depth,
        )
        id_col = index.id_col
    else:
        cand = bm25_topk_batch(
            docs, queries, text_col, id_col, query_text_col, query_id_col,
            k=depth,
        )
    negs = cand.join(
        positives.select(query_id_col, id_col),
        on=[query_id_col, id_col],
        how="left_anti",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# -- persisted index: the repeated-query scale path --------------------------
#
# One-off corpus pass -> (tf, df, dl, stats) tables on disk, with the
# term-keyed tables PARTITIONED BY a hash bucket of the term. A probe
# then reads only the query terms' buckets — parquet PartitionFilters
# prune everything else — so per-query I/O is corpus_size/buckets *
# |query terms| worst case, independent of how many queries run. Same
# layout discipline as the persisted ANN indexes in similarity.py.


class BM25Index:
    def __init__(self, spark, path: str, buckets: int, id_col: str):
        self.spark = spark
        self.path = path
        self.buckets = buckets
        self.id_col = id_col
        self._frames = None

    def frames(self):
        """The four table plans, listed once per index handle — a probe
        filters these (partition pruning re-plans per query); repeated
        probes skip the file-listing/footer cost of re-reading."""
        if self._frames is None:
            r = self.spark.read
            self._frames = (
                r.parquet(f"{self.path}/tf"),
                r.parquet(f"{self.path}/df"),
                r.parquet(f"{self.path}/dl"),
                r.parquet(f"{self.path}/stats"),
            )
        return self._frames


def _tok_bucket(col, buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def save_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    buckets: int = 64,
) -> "BM25Index":
    """Build + persist the BM25 index. tf and df are written
    partitioned by ``__bkt = pmod(xxhash64(term), buckets)``; dl and
    the 1-row corpus stats sit beside them."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("__tok")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    dl.write.mode("overwrite").parquet(f"{path}/dl")
    dl = spark.read.parquet(f"{path}/dl")  # stats from the written copy
    dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    ).write.mode("overwrite").parquet(f"{path}/stats")
    tf = toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__tf"))
    tf.withColumn("__bkt", _tok_bucket(F.col("__tok"), buckets)).write.mode(
        "overwrite"
    ).partitionBy("__bkt").parquet(f"{path}/tf")
    (
        spark.read.parquet(f"{path}/tf")
        .groupBy("__bkt", "__tok")
        .agg(F.count(F.lit(1)).cast("double").alias("__df"))
        .write.mode("overwrite")
        .partitionBy("__bkt")
        .parquet(f"{path}/df")
    )
    return BM25Index(spark, path, buckets, id_col)


def load_bm25_index(spark, path: str, id_col: str, buckets: int = 64) -> BM25Index:
    return BM25Index(spark, path, buckets, id_col)


def bm25_topk_indexed(
    index: BM25Index,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """Top-k over a persisted index: the tf/df scans carry BOTH the
    bucket predicate (→ parquet PartitionFilters, whole directories
    skipped) and the term IN-list (→ row-group pushdown inside the
    touched buckets). Identical scores to :func:`bm25_topk` over the
    same corpus."""
    qterms = sorted(set(tokenize_query(query)))
    if not qterms:
        raise ValueError("bm25: query has no tokens")
    spark, path, id_col = index.spark, index.path, index.id_col
    # bucket predicate from CONSTANT-FOLDABLE expressions — Catalyst
    # folds pmod(xxhash64(<literal term>), B) to a literal at plan time,
    # so partition pruning fires WITHOUT a driver job to pre-hash terms
    bkt_pred = None
    for t in qterms:
        p = F.col("__bkt") == _tok_bucket(F.lit(t), index.buckets)
        bkt_pred = p if bkt_pred is None else (bkt_pred | p)
    prune = bkt_pred & F.col("__tok").isin(qterms)
    tf_all, df_all, dl, stats = index.frames()
    tf = tf_all.where(prune)
    dfreq = df_all.where(prune).drop("__bkt")
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), on="__tok")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(idf * tf_part).alias("score"))
    )
    if round_to is not None:
        scored = scored.select(
            id_col, F.round(F.col("score"), round_to).alias("score")
        )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def bm25_topk_batch_indexed(
    index: BM25Index,
    queries: DataFrame,
    query_text_col: str,
    query_id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: Optional[int] = 6,
    max_inlist_terms: int = 1000,
) -> DataFrame:
    """Batch top-k over a persisted index — evaluation / mining over a
    large FIXED corpus without recomputing tf/dl per run.

    The partition predicate is a literal ``__bkt IN (...)`` built from
    ONE tiny job over the queries table (cost ∝ queries, never corpus;
    the IN-list is bounded by ``index.buckets``), so the tf/df scans
    carry parquet PartitionFilters exactly like the single-query probe.
    When the distinct query vocabulary is small (≤ ``max_inlist_terms``)
    a term IN-list additionally pushes into row groups; larger
    vocabularies rely on the broadcast semi-join alone. Scores are
    identical to :func:`bm25_topk_batch` over the same corpus (df/dl/
    stats come from the index's full-corpus pass)."""
    from pyspark.sql import Window

    qtok = queries.select(
        F.col(query_id_col),
        F.explode(_tokens(F.col(query_text_col))).alias("__tok"),
    ).distinct()  # BM25 sums each query term once
    # one small job over the QUERIES table: the touched buckets
    bkts = sorted(
        r["__b"]
        for r in qtok.select(
            _tok_bucket(F.col("__tok"), index.buckets).alias("__b")
        ).distinct().collect()
    )
    if not bkts:
        raise ValueError("bm25: queries have no tokens")
    terms = None
    if len(bkts) < index.buckets:  # all-buckets IN-list prunes nothing
        term_rows = qtok.select("__tok").distinct().limit(
            max_inlist_terms + 1
        ).collect()
        if len(term_rows) <= max_inlist_terms:
            terms = sorted(r["__tok"] for r in term_rows)
    prune = F.col("__bkt").isin(bkts)
    if terms is not None:
        prune = prune & F.col("__tok").isin(terms)
    tf_all, df_all, dl, stats = index.frames()
    qterms_b = F.broadcast(qtok.select("__tok").distinct())
    tf = tf_all.where(prune).join(qterms_b, on="__tok", how="left_semi")
    dfreq = (
        df_all.where(prune)
        .join(qterms_b, on="__tok", how="left_semi")
        .drop("__bkt")
    )
    id_col = index.id_col
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qtok), on="__tok")
        .join(F.broadcast(dfreq), on="__tok")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, id_col)
        .agg(F.sum(idf * tf_part).alias("score"))
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
