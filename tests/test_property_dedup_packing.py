"""Property-based checks for the iterative/distributed round-3
operators: duplicate clustering vs a brute-force union-find, sequence
packing vs a sequential scan, and the fused multi-FG PIT vs the
sequential per-FG joins."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

edges_strategy = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=20,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges_strategy)
def test_duplicate_clusters_matches_union_find(spark, edges):
    from feature_store_api_spark.operators.dedup import duplicate_clusters

    pairs = [(min(a, b), max(a, b)) for a, b in edges]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(df).collect()
    }
    assert got == _union_find(edges)


tokens_strategy = st.lists(st.integers(0, 500), min_size=1, max_size=40)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(tokens_strategy, st.integers(1, 4))
def test_pack_documents_matches_sequential_scan(spark, tokens, nparts):
    from feature_store_api_spark.operators.packing import pack_documents

    df = spark.createDataFrame(list(enumerate(tokens)), "doc_id long, n long")
    out = {
        r["doc_id"]: (r["start_token"], r["pack_id"], r["spans_boundary"])
        for r in pack_documents(
            df, "n", "doc_id", budget=700, num_partitions=nparts
        ).collect()
    }
    acc = 0
    for i, n in enumerate(tokens):
        assert out[i] == (acc, acc // 700, acc % 700 + n > 700), i
        acc += n


pit_feat = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 4), st.integers(0, 99)),
    min_size=0,
    max_size=10,
)
pit_spine = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 4)), min_size=1, max_size=8
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pit_spine, pit_feat, pit_feat)
def test_fused_multi_pit_equals_sequential(spark, spine_rows, f1_rows, f2_rows):
    """The fused one-window multi-FG PIT must return exactly what the
    sequential per-FG joins return, including on ties/duplicates."""
    from feature_store_api_spark.operators.pit_join import (
        _pit_union_window_many, point_in_time_join,
    )

    base = dt.datetime(2024, 1, 1)

    def ts(d):
        return base + dt.timedelta(days=d)

    spine = spark.createDataFrame(
        [(k, ts(d), i) for i, (k, d) in enumerate(spine_rows)],
        "k long, ts timestamp, row_id long",
    )
    f1 = spark.createDataFrame(
        [(k, ts(d), float(v)) for k, d, v in f1_rows] or [(99, ts(0), 0.0)],
        "k long, fts timestamp, v double",
    )
    f2 = spark.createDataFrame(
        [(k, ts(d), float(v)) for k, d, v in f2_rows] or [(99, ts(0), 0.0)],
        "k long, gts timestamp, w double",
    )
    specs = [
        {"df": f1, "feature_ts": "fts", "features": ["v"], "prefix": "a_"},
        {"df": f2, "feature_ts": "gts", "features": ["w"], "prefix": "b_"},
    ]
    fused = _pit_union_window_many(spine, specs, ["k"], "ts")
    seq = spine
    for s in specs:
        seq = point_in_time_join(
            seq, s["df"], keys=["k"], spine_ts="ts",
            feature_ts=s["feature_ts"], features=s["features"],
            prefix=s["prefix"],
        )
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, seq.collect()))
    assert a == b


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges_strategy)
def test_two_phase_clusters_match_union_find(spark, edges):
    """large-star/small-star must agree with brute-force union-find on
    arbitrary random graphs (not just chains)."""
    from feature_store_api_spark.operators.dedup import duplicate_clusters

    pairs = [(min(a, b), max(a, b)) for a, b in edges]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(df, algorithm="two_phase").collect()
    }
    assert got == _union_find(edges)


docs_strategy = st.lists(
    st.text(alphabet="abc\n", min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy, st.integers(2, 3))
def test_paragraph_dedup_matches_bruteforce(spark, texts, min_occ):
    """remove_repeated_paragraphs vs a straight Python reimplementation
    on arbitrary newline-structured corpora."""
    from collections import Counter

    from feature_store_api_spark.operators.text import remove_repeated_paragraphs

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_removed"])
        for r in remove_repeated_paragraphs(
            df, "text", "doc_id", min_occurrences=min_occ
        ).collect()
    }
    counts = Counter(p for _i, t in rows for p in t.split("\n"))
    for i, t in rows:
        paras = t.split("\n")
        kept = [p for p in paras if counts[p] < min_occ]
        assert got[i] == ("\n".join(kept), len(kept), len(paras) - len(kept)), (
            i, t, got[i]
        )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 3), st.integers(0, 5)),
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    )
)
def test_select_survivors_matches_bruteforce(spark, rows):
    """Quality-policy survivor selection vs a Python argmax per cluster
    (docs: (id, cluster, quality); cluster c applies to ids with that
    cluster value; singletons pass through)."""
    from feature_store_api_spark.operators.dedup import select_survivors

    docs = spark.createDataFrame(
        [(i, q) for i, _c, q in rows], "doc_id long, quality long"
    )
    # only ids appearing in a multi-member cluster get a cluster row
    from collections import defaultdict

    groups = defaultdict(list)
    for i, c, _q in rows:
        groups[c].append(i)
    cluster_rows = [
        (i, min(members))
        for c, members in groups.items()
        if len(members) > 1
        for i in members
    ]
    expected = {i for c, members in groups.items() if len(members) == 1 for i in members}
    by_id = {i: q for i, _c, q in rows}
    for c, members in groups.items():
        if len(members) > 1:
            expected.add(max(members, key=lambda i: (by_id[i], i)))
    if cluster_rows:
        clusters = spark.createDataFrame(cluster_rows, "doc_id long, cluster_id long")
    else:
        from pyspark.sql import types as T

        clusters = spark.createDataFrame(
            [], T.StructType([
                T.StructField("doc_id", T.LongType()),
                T.StructField("cluster_id", T.LongType()),
            ])
        )
    got = {
        r["doc_id"]
        for r in select_survivors(
            docs, clusters, order_by=["quality"]
        ).collect()
    }
    assert got == expected, (rows, got, expected)


# ---------------------------------------------------------------------------
# round-5 operators vs brute force
# ---------------------------------------------------------------------------

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(st.text(alphabet="abcd ", min_size=0, max_size=40),
                   min_size=1, max_size=6),
    chunk_size=st.integers(2, 12),
    overlap=st.integers(0, 6),
)
def test_chunk_documents_matches_brute_force(spark, texts, chunk_size, overlap):
    from feature_store_api_spark.operators.packing import chunk_documents

    if overlap >= chunk_size:
        overlap = chunk_size - 1
    stride = chunk_size - overlap
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_index"], r["chunk_text"])
        for r in chunk_documents(
            df, "text", "doc_id", chunk_size=chunk_size, overlap=overlap
        ).collect()
    }
    want = set()
    for i, t in enumerate(texts):
        if not t:
            continue
        k = 0
        while k * stride < len(t):
            want.add((i, k, t[k * stride : k * stride + chunk_size]))
            k += 1
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),      # key
            st.integers(0, 50_000), # ts seconds offset
        ),
        min_size=0, max_size=14,
    ),
    lower_s=st.integers(0, 7200),
)
def test_interval_join_matches_brute_force(spark, rows, lower_s):
    from feature_store_api_spark.streaming.stream_join import interval_join

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, f"k{k}", base + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "id long, key string, ts timestamp")
    left = df.where("id % 2 = 0")
    right = df.where("id % 2 = 1")
    from pyspark.sql import functions as F
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right, ["key"], "ts", "ts",
            lower=f"{lower_s} seconds", upper="0 seconds",
        ).select(
            F.col("l.id").alias("lid"), F.col("r.id").alias("rid")
        ).collect()
    }
    want = {
        (i, j)
        for i, (k1, s1) in enumerate(rows)
        for j, (k2, s2) in enumerate(rows)
        if i % 2 == 0 and j % 2 == 1 and k1 == k2
        and s1 - lower_s <= s2 <= s1
    }
    assert got == want


# --- round-6: exact_window_dedup vs a brute-force Python scan --------------

docs_strategy = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


def _brute_window_dedup(texts, window):
    import re

    wins = []
    for t in texts:
        words = [w for w in re.split(r"[^a-z0-9']+", t.lower()) if w]
        ws = {
            " ".join(words[i : i + window])
            for i in range(len(words) - window + 1)
        } if len(words) >= window else set()
        wins.append(ws)
    out = []
    for i, ws in enumerate(wins):
        dup = any(ws & wins[j] for j in range(i))
        out.append((i, len(ws), dup))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy, st.integers(1, 3))
def test_exact_window_dedup_matches_bruteforce(spark, texts, window):
    from feature_store_api_spark.operators.dedup import exact_window_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["is_dup"])
        for r in exact_window_dedup(df, "text", "doc_id", window=window).collect()
    }
    for i, n_wins, dup in _brute_window_dedup(texts, window):
        assert got[i] == (n_wins, dup), (i, texts)


# --- round-6: semantic_dedup vs a brute-force assignment + pair check ------

vecs_strategy = st.lists(
    st.lists(
        st.floats(-1, 1, allow_nan=False, allow_infinity=False, width=32),
        min_size=4, max_size=4,
    ),
    min_size=2,
    max_size=14,
)


def _brute_semantic_dedup(vecs, k, tau):
    import math

    def cos(a, b, seed_side=False):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0:
            return None
        if nb == 0:
            # engine contract: a zero SEED's norm is guarded to 1.0, so
            # the cosine against it is 0.0 (dot of anything with zero);
            # a zero non-seed vector stays undefined (None)
            return 0.0 if seed_side else None
        return round(sum(x * y for x, y in zip(a, b)) / (na * nb), 6)

    seeds = vecs[:k]
    clusters = []
    for v in vecs:
        nv = math.sqrt(sum(x * x for x in v))
        if nv == 0:
            # Spark scores every seed -2.0 for a zero vector; the
            # struct-max tiebreak picks the smallest seed index
            clusters.append(0)
            continue
        scored = []
        for i, s in enumerate(seeds):
            c = cos(v, s, seed_side=True)
            scored.append((c if c is not None else -2.0, -i, i))
        clusters.append(max(scored)[2])
    dups = set()
    for j in range(len(vecs)):
        for i in range(j):
            if clusters[i] == clusters[j]:
                c = cos(vecs[i], vecs[j])
                if c is not None and c >= tau:
                    dups.add(j)
    return clusters, dups


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs_strategy)
def test_semantic_dedup_matches_bruteforce(spark, vecs):
    from feature_store_api_spark.operators.similarity import semantic_dedup

    k, tau = 2, 0.9
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: (r["cluster"], r["is_dup"])
        for r in semantic_dedup(
            df, "embedding", num_clusters=k, threshold=tau
        ).collect()
    }
    clusters, dups = _brute_semantic_dedup(
        [[float(x) for x in v] for v in vecs], k, tau
    )
    for i in range(len(vecs)):
        assert out[i] == (clusters[i], i in dups), (i, vecs)
