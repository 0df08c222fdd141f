"""Language-model quality scoring: unigram LM perplexity.

Beyond-reference operator for training-data pipelines: the CCNet /
RedPajama recipe filters web text by the perplexity of a small LM
trained on a trusted corpus (Wenzek et al. 2020, "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data"). This is the
distributed unigram variant: train = ONE token-count aggregation over
the reference corpus; score = token join + per-document average
negative log-likelihood. No model binary, no UDF — the "LM" is a
DataFrame of counts and two scalars, so both phases are plain codegen
plans and the whole pipeline is reproducible in any SQL engine.

Smoothing is add-alpha over (vocab + 1) outcomes (the +1 is the unseen
token bucket), so scoring NEW text against a trained LM never hits a
log(0).

Scale posture: training shuffles (token) partial counts once; scoring
joins tokens against the count table — broadcast when the vocab is
small, hash equi-join otherwise — then ONE groupBy(doc). Per-document
cost is linear in its tokens.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import _tokens


@dataclass
class UnigramLM:
    """counts: (token, cnt); totals: 1 row (total_tokens, vocab)."""

    counts: DataFrame
    totals: DataFrame
    alpha: float


def train_unigram_lm(
    corpus: DataFrame, text_col: str, alpha: float = 0.5
) -> UnigramLM:
    toks = corpus.select(F.explode(_tokens(F.col(text_col))).alias("__tok"))
    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    totals = counts.agg(
        F.sum("__cnt").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("double").alias("__vocab"),
    )
    return UnigramLM(counts=counts, totals=totals, alpha=alpha)


def perplexity(
    docs: DataFrame,
    lm: UnigramLM,
    text_col: str,
    id_col: str,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """Per-document unigram perplexity under ``lm``.

    p(t) = (cnt(t) + alpha) / (total + alpha * (vocab + 1)); unseen
    tokens take cnt = 0. Returns ``(id_col, n_tokens, avg_nll, ppl)``
    with ppl = exp(avg_nll); documents with no tokens are dropped (no
    tokens → no likelihood). Low ppl = fluent/common text, high ppl =
    noise — threshold downstream per CCNet."""
    a = float(lm.alpha)
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("__tok")
    )
    nll = -F.log(
        (F.coalesce(F.col("__cnt"), F.lit(0)).cast("double") + F.lit(a))
        / (F.col("__total") + F.lit(a) * (F.col("__vocab") + 1.0))
    )
    out = (
        toks.join(lm.counts, on="__tok", how="left")
        .crossJoin(F.broadcast(lm.totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(nll).alias("avg_nll"),
        )
        .withColumn("ppl", F.exp(F.col("avg_nll")))
    )
    if round_to is not None:
        out = out.select(
            id_col,
            "n_tokens",
            F.round("avg_nll", round_to).alias("avg_nll"),
            F.round("ppl", round_to).alias("ppl"),
        )
    return out


def _hashed_ngram_buckets(col, buckets: int, hash_fn: str = "xxhash64"):
    """Unigram + bigram hashed features of a text column, as an array
    of bucket ids in [0, buckets) — the DSIR feature space (Xie et al.
    2023, 'Data Selection for Language Models via Importance
    Resampling': hashed n-grams make the feature space fixed-size, so
    the 'LM' is a bucket-count vector regardless of vocabulary)."""
    from .dedup import _md5_64 as md5_64
    from .retrieval import _tokens

    toks = _tokens(col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    h = (
        (lambda g: md5_64(g))
        if hash_fn == "md5_64"
        else (lambda g: F.xxhash64(g))
    )
    return F.transform(grams, lambda g: F.pmod(h(g), F.lit(buckets)).cast("int"))


def _bucket_counts(df: DataFrame, text_col: str, buckets: int, hash_fn: str):
    b = df.select(
        F.explode(
            _hashed_ngram_buckets(F.col(text_col), buckets, hash_fn)
        ).alias("__b")
    )
    return b.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = 10_000,
    alpha: float = 0.5,
    hash_fn: str = "xxhash64",
    round_to: Optional[int] = 6,
) -> DataFrame:
    """Per-document DSIR importance log-weight:
    ``sum over hashed n-grams of log p_target(b) - log p_raw(b)`` with
    add-alpha smoothing over the fixed ``buckets`` outcomes. Two
    bucket-count aggregations (one per corpus) + one join + one
    per-document sum — each distribution is a ``buckets``-row table, so
    both ride broadcast joins at any corpus size."""
    tc = _bucket_counts(target, text_col, buckets, hash_fn)
    rc = _bucket_counts(raw, text_col, buckets, hash_fn)
    t_tot = tc.agg(F.sum("__cnt").cast("double").alias("__tt"))
    r_tot = rc.agg(F.sum("__cnt").cast("double").alias("__rt"))
    feats = raw.select(
        F.col(id_col),
        F.explode(
            _hashed_ngram_buckets(F.col(text_col), buckets, hash_fn)
        ).alias("__b"),
    )
    a = float(alpha)
    log_ratio = F.log(
        (F.coalesce(F.col("__tcnt"), F.lit(0)).cast("double") + a)
        / (F.col("__tt") + a * buckets)
    ) - F.log(
        (F.coalesce(F.col("__rcnt"), F.lit(0)).cast("double") + a)
        / (F.col("__rt") + a * buckets)
    )
    out = (
        feats.join(
            F.broadcast(tc.select(F.col("__b"), F.col("__cnt").alias("__tcnt"))),
            on="__b", how="left",
        )
        .join(
            F.broadcast(rc.select(F.col("__b"), F.col("__cnt").alias("__rcnt"))),
            on="__b", how="left",
        )
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .groupBy(id_col)
        .agg(F.sum(log_ratio).alias("log_weight"))
    )
    if round_to is not None:
        out = out.withColumn("log_weight", F.round("log_weight", round_to))
    return out


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    buckets: int = 10_000,
    alpha: float = 0.5,
    seed: int = 13,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Select ``k`` raw documents by importance resampling WITHOUT
    replacement via the Gumbel-top-k trick: rank by
    ``log_weight + g`` where ``g = -ln(-ln(u))`` and ``u`` is a
    deterministic per-document hash uniform — equivalent to sampling
    proportional to the importance weights, but reproducible (and
    oracle-checkable with ``hash_fn='md5_64'``). Returns
    ``(id_col, log_weight, gumbel_key)``; the global top-k is a
    distributed TakeOrdered (no single-partition sort)."""
    from .dedup import _md5_64

    lw = dsir_log_weights(
        raw, target, text_col, id_col, buckets, alpha, hash_fn,
        round_to=None,
    )
    key = F.concat_ws(
        "\x1f", F.col(id_col).cast("string"), F.lit(str(seed))
    )
    h = _md5_64(key) if hash_fn == "md5_64" else F.xxhash64(key, F.lit(seed))
    u = (F.pmod(h, F.lit(1_000_000_000)) + 1) / F.lit(1_000_000_002.0)
    g = -F.log(-F.log(u))
    ranked = lw.select(
        F.col(id_col),
        F.round("log_weight", 6).alias("log_weight"),
        F.round((F.col("log_weight") + g), 6).alias("gumbel_key"),
    )
    return ranked.orderBy(
        F.col("gumbel_key").desc(), F.col(id_col).asc()
    ).limit(k)


def perplexity_filter(
    docs: DataFrame,
    lm: UnigramLM,
    text_col: str,
    id_col: str,
    max_ppl: float,
) -> DataFrame:
    """Keep documents whose perplexity under ``lm`` is ≤ ``max_ppl``
    (the CCNet 'head/middle' gate). Returns the original rows."""
    keep = perplexity(docs, lm, text_col, id_col, round_to=None).where(
        F.col("ppl") <= max_ppl
    )
    return docs.join(keep.select(id_col), on=id_col, how="left_semi")
