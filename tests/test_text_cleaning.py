"""Paragraph-level dedup + PII redaction (C4-style corpus cleaning)."""

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark.operators.text import (
    redact_pii,
    remove_repeated_paragraphs,
)


def test_remove_repeated_paragraphs(spark):
    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"unique intro\n{boiler}\nreal content one"),
        (2, f"{boiler}\nreal content two"),
        (3, "all original\nnothing shared"),
        (4, boiler),  # nothing but boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_repeated_paragraphs(df, "text", "doc_id").collect()
    }
    assert out[1]["text_clean"] == "unique intro\nreal content one"
    assert out[1]["n_kept"] == 2 and out[1]["n_removed"] == 1
    assert out[2]["text_clean"] == "real content two"
    assert out[3]["text_clean"] == "all original\nnothing shared"
    assert out[3]["n_removed"] == 0
    assert out[4]["text_clean"] == "" and out[4]["n_kept"] == 0

    # order preserved even when kept paragraphs are non-contiguous
    df2 = spark.createDataFrame(
        [(1, "z\nX\na"), (2, "X\nq")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text_clean"]
        for r in remove_repeated_paragraphs(df2, "text", "doc_id").collect()
    }
    assert got[1] == "z\na" and got[2] == "q"


def test_strip_boilerplate(spark):
    """jusText-style intra-document classifier: short menus, high-symbol
    footers and stopword-free link lists drop even though they occur
    ONCE in the corpus; prose paragraphs survive with order intact —
    and the plan is a single map-side projection (no shuffle)."""
    from feature_store_api_spark.operators.text import strip_boilerplate

    prose1 = "the quick brown fox jumps over the lazy dog for fun"
    prose2 = "it is a truth universally acknowledged that data is messy"
    rows = [
        (1, f"Home | About | Contact\n{prose1}\n© 2024 Corp. "
            "All-rights-reserved. ®™\n" + prose2),
        (2, "Menu\nLogin\n" + prose1),
        (3, "\n".join([prose1, prose2])),  # pure prose
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            df, "text", "doc_id", min_stopword_ratio=0.1
        ).collect()
    }
    assert out[1]["text_clean"] == f"{prose1}\n{prose2}"
    assert out[1]["n_kept"] == 2 and out[1]["n_removed"] == 2
    assert out[2]["text_clean"] == prose1 and out[2]["n_removed"] == 2
    assert out[3]["n_removed"] == 0
    # map-side only: no exchange in the plan
    plan = (
        strip_boilerplate(df, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@example.co.uk please"),
            (2, "server at 192.168.0.1 answered"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "clean text with no pii"),
            (5, "both: a@b.io and 10.0.0.255"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "text", "doc_id").collect()}
    assert out[1]["text_redacted"] == "mail me at <EMAIL> please"
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 0
    assert out[2]["text_redacted"] == "server at <IP> answered"
    assert out[3]["text_redacted"] == "call <PHONE> now"
    assert out[3]["n_phone"] == 1
    assert out[4]["text_redacted"] == "clean text with no pii"
    assert out[5]["text_redacted"] == "both: <EMAIL> and <IP>"
    assert out[5]["n_email"] == 1 and out[5]["n_ip"] == 1

    # no Python stages: pure Column expressions
    plan = redact_pii(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_ngram_contamination(spark):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps over the lazy dog appears verbatim here"),
            (2, "completely unrelated writing about query engines and shuffles"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    from feature_store_api_spark.operators.text import ngram_contamination

    out = {
        r["doc_id"]: r
        for r in ngram_contamination(corpus, eval_df, "text", "doc_id", n=8).collect()
    }
    assert out[1]["is_contaminated"] and out[1]["contaminated_ngrams"] >= 1
    assert not out[2]["is_contaminated"] and out[2]["contamination"] == 0.0
    assert out[3]["total_ngrams"] == 1 and not out[3]["is_contaminated"]
    # fraction bounded and consistent
    r1 = out[1]
    assert abs(r1["contamination"] - round(r1["contaminated_ngrams"] / r1["total_ngrams"], 6)) < 1e-9

    # broadcast join: no shuffle of the corpus gram stream
    plan = ngram_contamination(corpus, eval_df, "text", "doc_id", n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_rebalance_to_mixture(spark):
    from feature_store_api_spark.operators.splits import rebalance_to_mixture

    rows = [(i, "a" if i < 1000 else ("b" if i < 1200 else "c")) for i in range(1300)]
    df = spark.createDataFrame(rows, "k long, cls string")
    # target 50/50 a/b: b (200 rows) binds -> keep all b, ~200 of a; c dropped
    out = rebalance_to_mixture(df, "cls", {"a": 0.5, "b": 0.5}, key_cols=["k"])
    got = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert "c" not in got
    assert got["b"] == 200
    assert 150 <= got["a"] <= 250  # hash draw approximates the fraction
    # deterministic: same seed -> same exact row set
    again = rebalance_to_mixture(df, "cls", {"a": 0.5, "b": 0.5}, key_cols=["k"])
    assert sorted(r["k"] for r in out.collect()) == sorted(r["k"] for r in again.collect())
    # absent target classes raise
    import pytest as _pytest
    with _pytest.raises(ValueError, match="No target class"):
        rebalance_to_mixture(df, "cls", {"zz": 1.0}, key_cols=["k"])


def test_tfidf_top_terms(spark):
    from feature_store_api_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "spark spark spark shuffle"),
            (2, "spark window"),
            (3, "window window filter"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, "text", "doc_id", k=2)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    # 'spark' appears in 2/3 docs, 'shuffle' in 1/3: doc1's top term is
    # the one with the higher tf*ln(N/df)
    import math
    s_spark = 3 * math.log(3 / 2)
    s_shuffle = 1 * math.log(3 / 1)
    top = rows[(1, 1)]
    assert top["term"] == ("spark" if s_spark > s_shuffle else "shuffle")
    assert abs(top["score"] - round(max(s_spark, s_shuffle), 6)) < 1e-9
    # ubiquitous terms score ln(1)=0
    assert all(
        r["score"] == 0.0 for r in out.collect() if r["doc_freq"] == 3
    )
    # rarity wins: 1*ln(3) for 'filter' beats 2*ln(3/2) for 'window'
    assert rows[(3, 1)]["term"] == "filter"
    assert rows[(3, 2)]["term"] == "window"


def test_gopher_quality_flags(spark):
    from feature_store_api_spark.operators.text import gopher_quality_flags

    good = " ".join(f"word{i}" for i in range(60))  # 60 alpha words
    rows = [
        (1, good),
        (2, "too few words here"),                    # fails word count
        (3, " ".join(["####"] * 60)),                 # symbols, no alpha
        (4, "- a\n- b\n- c\n" + good),                # bullets but <=0.9? 3/4 lines
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_flags(df, "text", "doc_id").collect()}
    assert out[1]["passes_gopher"]
    assert not out[2]["pass_word_count"] and not out[2]["passes_gopher"]
    assert not out[3]["pass_symbol_ratio"] and not out[3]["pass_alpha_words"]
    assert out[4]["bullet_line_ratio"] == 0.75 and out[4]["pass_bullet_lines"]


def test_text_ops_value_pins(spark):
    """Hand-computed value pins for the per-document text operators
    (r15 retirement backing: oracle rows text_stats / text_quality /
    text_language retired in favor of text_analysis, which composes
    exactly these ops — these pins keep each op independently
    verified)."""
    from feature_store_api_spark.operators.text import (
        language_id, quality_score, token_count,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog"),
            (2, "der schnelle braune fuchs und der hund"),
            (3, "zz9!!"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tok"),
            language_id(F.col("text")).alias("lang"),
            quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    # whitespace token counts
    assert out[1]["n_tok"] == 8
    assert out[2]["n_tok"] == 7
    assert out[4]["n_tok"] == 0
    # stopword-argmax language id; no markers -> 'und'
    assert out[1]["lang"] == "en"
    assert out[2]["lang"] == "de"
    assert out[3]["lang"] == "und"
    # quality: exact blend for doc 1 (36 chars, 8 words, all-alpha
    # except 8 spaces, 0 punct, stopword hits: the, and, the = 3,
    # mean word len 29/8)
    import math
    len_score = 36 / 500.0
    alpha_ratio = 29 / 36.0
    punct_penalty = 1.0
    stop_ratio = min(3 * 3.0 / 8, 1.0)
    wl_score = 1.0  # 29/8 = 3.625 in [3, 10]
    expect = round(
        0.25 * len_score + 0.25 * alpha_ratio + 0.2 * punct_penalty
        + 0.15 * stop_ratio + 0.15 * wl_score, 6)
    assert math.isclose(out[1]["q"], expect, abs_tol=1e-9)
    # degenerate strings stay in [0, 1]
    assert 0.0 <= out[3]["q"] <= 1.0 and 0.0 <= out[4]["q"] <= 1.0
