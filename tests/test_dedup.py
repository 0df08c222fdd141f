"""Dedup operators: exact, latest-per-key, MinHash-LSH, n-gram Jaccard,
SimHash, embedding near-dup."""

import pytest
from pyspark.sql import functions as F

from feature_store_api_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("quick", "speedy")),  # near dup
        (4, "completely different text about spark engines and query plans at scale"),
        (5, "yet another unrelated document mentioning feature stores and pipelines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_all_columns(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id long, v string")
    assert dedup.dedup_exact(df).count() == 2


def test_dedup_exact_subset_deterministic(docs):
    out = dedup.dedup_exact(docs, columns=["text"], keep_col="doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids and 2 not in ids  # min doc_id survives
    assert len(ids) == 4


def test_latest_per_key(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")], "k long, t long, v string"
    )
    out = dedup.latest_per_key(df, ["k"], order_by=["t"])
    assert {r["v"] for r in out.collect()} == {"new", "only"}


def test_latest_per_key_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 10, 2, "b")], "k long, t long, seq long, v string"
    )
    out = dedup.latest_per_key(df, ["k"], order_by=["t"], tie_breakers=["seq"])
    assert out.collect()[0]["v"] == "b"


def test_minhash_lsh_finds_near_dups(docs):
    pairs = dedup.minhash_lsh_duplicate_pairs(
        docs, "text", "doc_id", num_hashes=32, bands=16
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always collides
    assert (1, 3) in got or (2, 3) in got  # near dup collides in some band
    assert (1, 4) not in got and (4, 5) not in got


def test_ngram_jaccard_verification(docs):
    cand = dedup.minhash_lsh_duplicate_pairs(docs, "text", "doc_id", num_hashes=32, bands=16)
    verified = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.5, candidates=cand
    )
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert rows[(1, 2)] == 1.0
    assert all(v >= 0.5 for v in rows.values())


def test_ngram_jaccard_allpairs(docs):
    # the O(n^2) path requires explicit opt-in
    with pytest.raises(ValueError, match="cartesian"):
        dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.9)
    out = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.9, allow_all_pairs=True
    )
    rows = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert rows == {(1, 2)}


def test_simhash_similarity(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sigs[1], sigs[3]) < ham(sigs[1], sigs[4])


def test_embedding_cosine_dup_pairs(spark):
    from feature_store_api_spark.operators.similarity import embedding_cosine_dup_pairs

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = embedding_cosine_dup_pairs(df, "id", "v", dim=4, threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got)


def test_latest_per_key_agg_matches_window(spark):
    rows = [
        (1, 10, 1, "a"), (1, 10, 2, "b"), (1, 20, 0, "c"),   # order wins over tie
        (2, 5, 9, "d"),                                        # singleton
        (3, None, 1, "e"), (3, None, 2, "f"),                  # null order col
        (3, 7, 0, "g"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, seq long, payload string")
    from feature_store_api_spark.operators.dedup import latest_per_key

    win = latest_per_key(df, ["k"], ["ts"], ["seq"])
    agg = latest_per_key(df, ["k"], ["ts"], ["seq"], strategy="agg")
    w = {r["k"]: (r["ts"], r["seq"], r["payload"]) for r in win.collect()}
    a = {r["k"]: (r["ts"], r["seq"], r["payload"]) for r in agg.collect()}
    assert w == a == {1: (20, 0, "c"), 2: (5, 9, "d"), 3: (7, 0, "g")}
    assert sorted(agg.columns) == sorted(df.columns)


def test_latest_per_key_agg_plan_has_partial_aggregation(spark):
    df = spark.createDataFrame([(1, 1, 1, "x")], "k long, ts long, seq long, p string")
    from feature_store_api_spark.operators.dedup import latest_per_key

    plan = latest_per_key(df, ["k"], ["ts"], ["seq"], strategy="agg")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan  # map-side combine before the exchange


def test_duplicate_clusters_transitive(spark):
    """A~B, B~C, D~E → {A,B,C} one cluster, {D,E} another; cluster id =
    min member; long chain converges."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 4)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 4: 4, 5: 4}
    # chain of 12 (diameter > a couple of rounds)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(chain).collect()
    }
    assert set(got.values()) == {100} and len(got) == 13


def test_duplicate_clusters_two_phase_matches_min_label(spark):
    """large-star/small-star must agree with min-label propagation —
    including on a 120-node chain whose diameter (120) far exceeds the
    two-phase round budget (O(log n))."""
    import random

    rng = random.Random(42)
    edges = [(i, i + 1) for i in range(200, 320)]  # chain, diameter 120
    edges += [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(40)]
    edges = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    two = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(
            pairs, algorithm="two_phase", max_iterations=15
        ).collect()
    }
    ml = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs, max_iterations=200).collect()
    }
    assert two == ml
    assert two[320] == 200  # chain collapses to its min


def test_duplicate_clusters_raises_on_iteration_cap(spark):
    """Exiting on max_iterations without convergence must raise — an
    unconverged labeling silently keeps transitive duplicates."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        dedup.duplicate_clusters(chain, max_iterations=3)


def test_select_survivors_policies(spark):
    """Survivor selection: canonical (min-id) policy is a filter;
    quality policy keeps the best row per cluster with deterministic
    ties; unclustered docs always survive; ascending flips to min_by."""
    docs = spark.createDataFrame(
        [
            (1, "short", 5),
            (2, "a much longer text", 18),
            (3, "medium text!", 12),
            (9, "standalone", 10),
        ],
        "doc_id long, text string, quality long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    canonical = dedup.select_survivors(docs, clusters)
    assert {r["doc_id"] for r in canonical.collect()} == {1, 9}

    best = dedup.select_survivors(docs, clusters, order_by=["quality"])
    assert {r["doc_id"] for r in best.collect()} == {2, 9}

    worst = dedup.select_survivors(
        docs, clusters, order_by=["quality"], descending=False
    )
    assert {r["doc_id"] for r in worst.collect()} == {1, 9}

    # column-expression order key + tie-break by highest doc_id
    tied = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbb"), (7, "c")], "doc_id long, text string"
    )
    tclusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    from pyspark.sql import functions as F2
    out = dedup.select_survivors(tied, tclusters, order_by=[F2.length("text")])
    assert {r["doc_id"] for r in out.collect()} == {2, 7}


def test_duplicate_clusters_confirming_round_budgeted_separately(spark):
    """The unchanged-sum proof round must not consume a propagation hop:
    a star already converged at init succeeds with max_iterations=1,
    and a graph settling exactly on the final allowed hop still
    converges instead of spuriously raising."""
    star = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(star, max_iterations=1).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    # path of 3 nodes: init hop + 1 propagation hop reaches the
    # fixpoint exactly on the final allowed hop; max_iterations=2 must
    # succeed via the separately-budgeted proof round (previously
    # required budget for a full extra round and raised).
    path = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(path, max_iterations=2).collect()
    }
    assert set(got.values()) == {1} and len(got) == 3


def test_duplicate_clusters_auto_matches_distributed(spark):
    """auto (driver union-find at small scale) must equal the
    distributed algorithms exactly, and fall back to two_phase above
    the pair threshold."""
    import random

    rng = random.Random(5)
    edges = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randint(0, 80), rng.randint(0, 80))
                               for _ in range(120)) if a != b})
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    auto = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs, algorithm="auto").collect()
    }
    ml = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert auto == ml
    # above threshold: routes to two_phase, same answer
    big = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(
            pairs, algorithm="auto", driver_pair_threshold=1
        ).collect()
    }
    assert big == ml


def test_incremental_pairs_against_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different text about spark engines and query plans at scale"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),  # dup of corpus doc 1
            (11, base.replace("quick", "speedy")),  # near dup of corpus doc 1
            (12, "a genuinely novel document describing minhash banding at warehouse scale"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_pairs_against(
        new, corpus, "text", "doc_id", num_hashes=32, bands=16
    )
    got = {(r["new_id"], r["corpus_id"]) for r in pairs.collect()}
    assert (10, 1) in got
    assert (11, 1) in got
    assert all(n != 12 for n, _ in got)


def test_dedup_new_against_corpus_survivors(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    novel = "a genuinely novel document describing minhash banding at warehouse scale"
    corpus = spark.createDataFrame([(1, base)], "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (10, base),   # dup of corpus → dropped
            (11, novel),  # novel, first copy → kept
            (12, novel),  # second copy within the batch → dropped
            (13, "another unrelated text mentioning feature stores and pipelines"),
        ],
        "doc_id long, text string",
    )
    out = dedup.dedup_new_against_corpus(
        new, corpus, "text", "doc_id", num_hashes=32, bands=16
    )
    assert {r["doc_id"] for r in out.collect()} == {11, 13}


def test_incremental_pairs_no_cartesian(spark):
    corpus = spark.createDataFrame([(1, "aaa bbb ccc ddd eee")], "doc_id long, text string")
    new = spark.createDataFrame([(2, "fff ggg hhh iii jjj")], "doc_id long, text string")
    plan = (
        dedup.minhash_lsh_pairs_against(new, corpus, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_window_dedup_flags_copied_passage(spark):
    """A verbatim 12-token passage inside an otherwise-unique larger doc
    must flag the LARGER id; whole-doc-unique texts stay clean; short
    docs (< window tokens) have zero windows and never dup."""
    from feature_store_api_spark.operators.dedup import exact_window_dedup

    passage = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (1, "intro words here " + passage + " and an original ending one"),
        (2, "different beginning text " + passage + " completely other tail"),
        (3, "totally unrelated content with no overlap whatsoever in any span of words at all"),
        (4, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for hf in ("xxhash64", "none"):
        out = {r["doc_id"]: r for r in
               exact_window_dedup(df, "text", "doc_id", window=12,
                                  hash_fn=hf).collect()}
        assert out[2]["is_dup"] is True      # shares the passage with doc 1
        assert out[1]["is_dup"] is False     # smallest id survives
        assert out[3]["is_dup"] is False
        assert out[4]["is_dup"] is False and out[4]["n_windows"] == 0


def test_two_phase_clustering_over_real_minhash_pairs(spark, docs):
    """Regression: clustering the HOF-based LSH pair plan directly
    (algorithm='two_phase'/'min_label', no auto-checkpoint first) used
    to crash in Spark's UnionBase.rewriteConstraints ('key not found:
    src#N') — localCheckpoint snapshotted constraints referencing
    lambda-internal attributes. All three algorithms must agree."""
    pairs = dedup.minhash_lsh_duplicate_pairs(
        docs, "text", "doc_id", num_hashes=32, bands=16
    )

    def rows(alg):
        return sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dedup.duplicate_clusters(pairs, algorithm=alg).collect()
        )

    two_phase = rows("two_phase")
    assert two_phase == rows("min_label") == rows("auto")
    assert len(two_phase) > 0
    # conf restored after the workaround scope
    assert (
        spark.conf.get("spark.sql.constraintPropagation.enabled") == "true"
    )


def test_verify_pairs_by_signature(spark, docs):
    """Signature-space candidate verification: est_jaccard from stored
    signatures approximates true shingle Jaccard on near-dups, real
    near-dup pairs survive the threshold, and the operator never
    touches document text (no text column in its plan)."""
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", num_hashes=64)
    pairs = dedup.minhash_lsh_duplicate_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16
    )
    out = dedup.verify_pairs_by_signature(pairs, sigs, "doc_id", threshold=0.5)
    rows = out.collect()
    assert rows, "expected surviving near-dup pairs"
    assert set(out.columns) == {"id_a", "id_b", "est_jaccard"}
    assert all(0.5 <= r["est_jaccard"] <= 1.0 for r in rows)
    # identical docs estimate 1.0
    import pyspark.sql.functions as SF

    twin = docs.limit(1).select(
        SF.lit(900001).alias("doc_id"), "text"
    ).unionByName(docs.limit(1).select(SF.lit(900002).alias("doc_id"), "text"))
    tsigs = dedup.minhash_signatures(twin, "text", "doc_id", num_hashes=64)
    tpairs = spark.createDataFrame([(900001, 900002)], "id_a long, id_b long")
    got = dedup.verify_pairs_by_signature(tpairs, tsigs, "doc_id").collect()
    assert got[0]["est_jaccard"] == 1.0
