"""Property-based BM25 check: random tiny corpora and queries must
agree with a brute-force Python Okapi-BM25 oracle — both the
single-query and the batched plan (which must also agree with each
other). Complements the fixed cases in test_retrieval_quality.py."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny vocabulary forces term collisions, repeated terms, and docs
# with zero query overlap
_WORDS = ["data", "spark", "join", "store", "cat"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
    min_size=1,
    max_size=8,
)
query_strategy = st.lists(
    st.sampled_from(_WORDS), min_size=1, max_size=3
)


def _brute_bm25(corpus, qterms, k1=1.2, b=0.75):
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df = {t: sum(1 for toks in corpus.values() if t in toks) for t in qterms}
    out = {}
    for d, toks in corpus.items():
        s = 0.0
        for t in qterms:
            tf = toks.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        if s:
            out[d] = round(s, 6)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, query=query_strategy)
def test_bm25_matches_brute_force(spark, docs, query):
    from feature_store_api_spark.operators.retrieval import (
        bm25_scores,
        bm25_topk_batch,
    )

    frame = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    corpus = {i: toks for i, toks in enumerate(docs)}
    expect = _brute_bm25(corpus, sorted(set(query)))

    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(frame, " ".join(query), "text", "doc_id").collect()
    }
    assert got == expect

    qframe = spark.createDataFrame(
        [(0, " ".join(query))], "query_id long, qtext string"
    )
    batch = {
        r["doc_id"]: r["score"]
        for r in bm25_topk_batch(
            frame, qframe, "text", "doc_id", "qtext", "query_id",
            k=len(docs) + 1,
        ).collect()
    }
    assert batch == expect
