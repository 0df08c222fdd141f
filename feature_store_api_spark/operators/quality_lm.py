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
