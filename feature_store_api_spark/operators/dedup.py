"""Deduplication operators.

``latest_per_key`` is the reference's online-store / precombine
semantics (``/root/reference/python/hsfs/core/hudi_engine.py:126-149``,
SURVEY §2.5). The rest is the driver-mandated LLM-data-pipeline dedup
suite: exact, MinHash-LSH, SimHash, n-gram Jaccard — all pure
DataFrame ops sized for 100 TB (hash-partitioned shuffles, no
driver-side loops, no Python row UDFs in the hot path).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .parallelism import repartition_up


from contextlib import contextmanager


@contextmanager
def _constraint_propagation_disabled(spark):
    """Workaround for a Spark 4.1 Catalyst defect: ``localCheckpoint``
    of a plan containing higher-order-function lambdas (the LSH bucket
    pair expansion's ``transform``) snapshots plan constraints that
    reference lambda-internal attributes; any later ``union`` over the
    checkpointed frame then crashes in ``UnionBase.rewriteConstraints``
    with ``key not found: src#N``. Creating the checkpoints with
    constraint propagation disabled makes the ``LogicalRDD`` snapshot
    EMPTY constraints, so every downstream plan is safe regardless of
    the (restored) session setting. Scope is one operator call on the
    driver thread — the engine never builds clustering plans
    concurrently on one session."""
    key = "spark.sql.constraintPropagation.enabled"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    tie_breakers: Sequence[str] = (),
    strategy: str = "window",
) -> DataFrame:
    """Newest row per key. The precombine tie-breaker mirrors Hudi's
    ``PAYLOAD_ORDERING_FIELD`` (``core/hudi_engine.py:141-149``).

    ``strategy="window"``: ``ROW_NUMBER() OVER (PARTITION BY keys ORDER
    BY order_by DESC, tie_breakers DESC) = 1`` — one shuffle, sort per
    key partition. A hot key funnels into ONE task (AQE's skew
    splitting applies to joins, not windows), so for skew-prone keys
    prefer:

    ``strategy="agg"``: ``max_by(payload, struct(order cols))`` — the
    same shuffle key, but partial aggregation collapses every map
    task's rows to one row per key BEFORE the exchange: a 10⁹-row hot
    key costs each map task O(1) state instead of one reducer sorting
    10⁹ rows. Requires a TOTAL ordering (make ``tie_breakers`` end in a
    unique column, e.g. an arrival sequence) — with ties, max_by picks
    an arbitrary survivor where the window picks a deterministic one.
    Null ordering fields sort lowest under both strategies
    (``desc_nulls_last`` ≡ max-of-struct with nulls-smallest).

    Choosing: when the caller can BOUND rows-per-key driver-side (the
    commit store bounds it by merge-tail length, the online store by
    its upserts-since-compaction counter), the window is both skew-safe
    by construction and ~1.7× cheaper at benign skew (flat rows, no
    per-row struct buffers — measured, BENCH b3/b7). Reserve ``agg``
    for genuinely unbounded duplication.
    """
    order_cols = list(order_by) + list(tie_breakers)
    if strategy == "agg":
        keys = list(keys)
        payload = [c for c in df.columns if c not in keys]
        picked = df.groupBy(*keys).agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]),
                F.struct(*[F.col(c) for c in order_cols]),
            ).alias("__r")
        )
        out = picked.select(*keys, "__r.*")
        return out.select(*df.columns)  # original column order
    order = [F.col(c).desc_nulls_last() for c in order_cols]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(
    df: DataFrame, columns: Optional[Sequence[str]] = None, keep_col: Optional[str] = None
) -> DataFrame:
    """Exact dedup by hash-groupBy.

    With ``columns=None`` this is ``DISTINCT`` over all columns. With a
    column subset it keeps one arbitrary-but-deterministic row per
    group (min of ``keep_col`` or of the remaining columns is used to
    make the survivor deterministic for testing).
    """
    if columns is None:
        return df.distinct()
    cols = list(columns)
    if keep_col is None:
        return df.dropDuplicates(cols)
    w = Window.partitionBy(*cols).orderBy(F.col(keep_col).asc_nulls_last())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# fuzzy text dedup: shingling + MinHash + LSH banding
# ---------------------------------------------------------------------------

def _shingles(col, n: int):
    """Character n-gram shingles of a lowercased, whitespace-collapsed
    string column — JVM-side via sequence/transform, no Python UDF."""
    norm = F.regexp_replace(F.lower(col), r"\s+", " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(norm) - n, F.lit(0))),
            lambda i: norm.substr(i + F.lit(1), F.lit(n)),
        )
    )


def _md5_64(col):
    """60-bit hash from the md5 hex prefix.

    Exactly reproducible in other engines (DuckDB:
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``), which makes the
    md5-variant dedup operators oracle-checkable end-to-end. xxhash64
    stays the default fast path for production runs.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 5,
    seed: int = 13,
    num_partitions: Optional[int] = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document MinHash signature as ``array<bigint>``.

    Formulated for whole-stage codegen (higher-order-function lambdas
    are interpreted per element in Spark — an order of magnitude slower
    here): explode shingle positions to rows, hash each shingle once
    with a plain (codegen'd) expression, then ONE groupBy(id) computing
    all ``num_hashes`` mins as ``min(xxhash64(h, i))`` aggregate
    expressions. Partial aggregation reduces each task's stream to
    ``num_hashes`` longs per document before the shuffle, so the
    exchange carries signatures, not shingles. No ``array_distinct`` —
    min over a multiset equals min over the set.

    ``hash_fn='md5_64'`` swaps the per-(shingle, i) hash for the
    engine-portable :func:`_md5_64` (correctness-oracle path); default
    ``'xxhash64'`` is the fast path.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    # The hash work is ~65 hashes per input CHARACTER — compute-bound,
    # not IO-bound — so parallelism must come from the cluster, not the
    # input layout: a single small parquet file scans as ONE partition
    # and would serialize the whole signature pass onto one core.
    # Repartition the (id, text) rows (tiny: pre-explosion) across the
    # default parallelism, hash-partitioned BY ID so the groupBy(id)
    # below reuses the partitioning instead of adding an exchange.
    base = df.select(F.col(id_col), norm.alias("__t"))
    # only repartition UP: at warehouse scale the input layout already
    # provides parallelism, and forcing defaultParallelism would both
    # shuffle the text payload and coalesce thousands of partitions
    # into oversized ones (plan-analysis-free guard: parallelism.py)
    base = repartition_up(base, id_col, num_partitions)
    exploded = (
        base
        .select(
            F.col(id_col),
            F.col("__t"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.length("__t") - shingle_size, F.lit(0)),
                )
            ).alias("__i"),
        )
        .select(
            F.col(id_col),
            F.col("__t").substr(F.col("__i") + 1, F.lit(shingle_size)).alias("__s"),
        )
    )
    # The num_hashes min-aggregates are rendered as ONE SQL string and
    # parsed server-side in a single F.expr: building them as nested
    # Column objects costs 4+ py4j round trips per hash (min, xxhash64,
    # lit, alias) — ~0.5 s of pure DRIVER time per call at 64 hashes,
    # visible as plan-build latency on every repeated invocation.
    if hash_fn == "md5_64":
        # hash of (shingle, i) = md5_64(shingle || US || i) — no
        # pre-hash so the oracle can reproduce it byte-for-byte
        mins = ", ".join(
            "min(cast(conv(substring(md5(concat(__s, chr(31), "
            f"'{i}')), 1, 15), 16, 10) as bigint))"
            for i in range(num_hashes)
        )
    else:
        exploded = exploded.select(
            F.col(id_col), F.xxhash64(F.col("__s"), F.lit(seed)).alias("__s")
        )
        mins = ", ".join(
            f"min(xxhash64(__s, {i}))" for i in range(num_hashes)
        )
    return exploded.groupBy(id_col).agg(
        F.expr(f"array({mins})").alias("minhash")
    )


def _band_table(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int, hash_fn: str
) -> DataFrame:
    """(id, band, bucket) rows from a signature table: each signature
    split into ``bands`` slices, slice (or its hash) = the bucket key.
    With ``hash_fn='md5_64'`` the key is the raw slice (arrays are
    hashable equi-join keys) so an oracle can reproduce it.

    Rendered as ONE SQL expression (single py4j round trip) — see the
    plan-build note in :func:`minhash_signatures`."""

    def band_key(b):
        sl = f"slice(minhash, {b * rows_per_band + 1}, {rows_per_band})"
        return sl if hash_fn == "md5_64" else f"xxhash64({sl})"

    structs = ", ".join(
        f"struct({b} as band, {band_key(b)} as bucket)" for b in range(bands)
    )
    return sigs.select(
        id_col,
        F.expr(f"explode(array({structs}))").alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_duplicate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 13,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    signature → split into ``bands`` bands of ``num_hashes//bands`` rows
    → hash each band → group members per (band_index, band_hash) bucket
    → expand i<j pairs in place. Output: ``(id_a, id_b)`` with
    id_a < id_b, distinct. The signature pipeline runs exactly ONCE
    (single consumer), so no materialization barrier is needed; a
    caller consuming the RESULT repeatedly should checkpoint it —
    ``duplicate_clusters`` does.

    With ``hash_fn='md5_64'`` the band key is the signature slice
    itself (arrays are hashable grouping keys in Spark) so the whole
    pipeline stays engine-portable for the oracle.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size, seed, hash_fn=hash_fn
    )
    banded = _band_table(sigs, id_col, bands, rows_per_band, hash_fn)
    # Pair generation is a GROUP-BY, not a self-join: collecting each
    # (band, bucket)'s member ids and expanding i<j pairs in-place
    # computes the signature pipeline exactly ONCE with exactly ONE
    # shuffle of (band, bucket, id) rows. The self-join formulation
    # reads identical, but Spark plans its small side as a
    # BroadcastExchange — which canonicalizes differently from the
    # probe side's shuffle, so ReuseExchange never fires and the whole
    # shingle+minhash aggregation runs TWICE (measured: 2 FileScans, 6
    # HashAggregates; +13% at sf0.1 and 5x worse x10 scaling).
    # Memory bound: one bucket's ids live in one agg buffer — LSH
    # buckets are near-duplicate groups and stay small by construction;
    # a degenerate bucket of 10M identical docs would hold ~80 MB of
    # longs (the quadratic PAIR OUTPUT, not the buffer, is the real
    # limit either way — cap upstream if a corpus is that degenerate).
    members = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("__ids"))
        .where(F.size("__ids") > 1)
    )
    pairs = members.select(
        F.expr(
            "explode(flatten(transform(__ids, (x, i) -> "
            "transform(slice(__ids, i + 2, size(__ids)), "
            "y -> struct(x as id_a, y as id_b)))))"
        ).alias("__p")
    )
    return pairs.select("__p.id_a", "__p.id_b").distinct()


def minhash_lsh_pairs_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 13,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs BETWEEN a new batch and an existing
    corpus — the incremental-ingest dedup shape: a daily batch checks
    against the accumulated corpus without the corpus×corpus self-join
    ever re-running. Output ``(new_id, corpus_id)``, distinct.

    Scale posture: the join is an equi-join on (band, bucket); the
    corpus side shuffles on the bucket key once (at warehouse scale,
    materialize the corpus band table with the same parameters and pass
    a DataFrame read from it as ``corpus_df`` bands — signatures are
    deterministic given (num_hashes, shingle_size, seed)), and a small
    new batch broadcasts under the autoBroadcast threshold. Never
    O(|new| × |corpus|)."""
    rows_per_band = num_hashes // bands
    new_b = _band_table(
        minhash_signatures(
            new_df, text_col, id_col, num_hashes, shingle_size, seed,
            hash_fn=hash_fn,
        ),
        id_col, bands, rows_per_band, hash_fn,
    ).alias("a")
    corp_b = _band_table(
        minhash_signatures(
            corpus_df, text_col, id_col, num_hashes, shingle_size, seed,
            hash_fn=hash_fn,
        ),
        id_col, bands, rows_per_band, hash_fn,
    ).alias("b")
    return (
        new_b.join(
            corp_b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("new_id"),
            F.col(f"b.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )


def dedup_new_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 13,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """New-batch survivors: rows of ``new_df`` with NO LSH near-dup
    candidate in the corpus AND no duplicate of a smaller-id row within
    the batch itself (so a batch containing two copies of a novel doc
    keeps exactly one). Candidates are LSH candidates — chain
    :func:`ngram_jaccard_pairs` over them for an exact-threshold
    verify. Left-anti joins keep the plan shuffle-minimal.

    The new batch's band table is materialized ONCE (localCheckpoint)
    and reused by BOTH the vs-corpus join and the within-batch
    self-join — the signature pass over the batch is the expensive
    part, and composing the two helpers naively would run it twice."""
    rows_per_band = num_hashes // bands
    new_b = _band_table(
        minhash_signatures(
            new_df, text_col, id_col, num_hashes, shingle_size, seed,
            hash_fn=hash_fn,
        ),
        id_col, bands, rows_per_band, hash_fn,
    ).localCheckpoint(eager=True)
    corp_b = _band_table(
        minhash_signatures(
            corpus_df, text_col, id_col, num_hashes, shingle_size, seed,
            hash_fn=hash_fn,
        ),
        id_col, bands, rows_per_band, hash_fn,
    )
    a, b = new_b.alias("a"), corp_b.alias("b")
    vs_corpus = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("new_id"))
    )
    n1, n2 = new_b.alias("a"), new_b.alias("b")
    within = (
        n1.join(
            n2,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"b.{id_col}").alias("new_id"))
    )
    dup_ids = (
        vs_corpus.unionByName(within)
        .distinct()
        .withColumnRenamed("new_id", id_col)
    )
    return new_df.join(dup_ids, on=id_col, how="left_anti")


def duplicate_clusters(
    pairs: DataFrame,
    max_iterations: int = 25,
    algorithm: str = "min_label",
    driver_pair_threshold: int = 200_000,
) -> DataFrame:
    """Connected components over duplicate pairs → one canonical
    cluster id per document: ``(id, cluster_id)`` with ``cluster_id``
    = the smallest id in the component. This is the step a dedup
    pipeline needs AFTER pair generation (MinHash/SimHash/embedding
    LSH): transitive duplicates (A~B, B~C) must collapse into one
    cluster so exactly one survivor per cluster is kept.

    ``algorithm="min_label"`` (default): iterative min-label
    propagation, all DataFrame ops. Each round is TWO shuffles — one
    join of labels across edges, one ``groupBy(id).min(label)`` over
    (neighbor candidates ∪ current labels) — and rounds = component
    diameter (near-dup clusters are shallow: LSH banding connects them
    densely, so 3-5 rounds is typical). Convergence is exact and free:
    labels only ever decrease, so ``sum(label)`` is strictly monotone
    until the fixpoint — an unchanged sum (one tiny agg over the
    checkpointed round output, no extra join and no separate changed
    scan) IS convergence.

    ``algorithm="two_phase"``: alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond" —
    public algorithm), converging in O(log n) rounds independent of
    component diameter — the right choice for pathological long-chain
    graphs where min-label would need diameter rounds. Rounds contract
    the edge set geometrically, so once a round's output fits
    ``driver_pair_threshold`` the remainder finishes with exact driver
    union-find (the paper's finish-locally step) instead of paying the
    tail rounds' fixed costs; pass ``driver_pair_threshold=0`` for the
    pure-distributed loop.

    ``algorithm="auto"``: scale-adaptive. LSH candidate pairs are
    orders of magnitude smaller than the corpus, and at moderate sizes
    the iterative variants are pure fixed cost (each round ≈ join +
    shuffle + checkpoint + convergence agg on near-empty data). One
    ``count()`` decides: at or under ``driver_pair_threshold`` pairs,
    collect and run exact union-find driver-side (milliseconds,
    identical output), else distributed ``two_phase``.

    ``localCheckpoint`` truncates the iterative lineage each round so
    the plan does not grow with iterations; both variants RAISE if the
    iteration cap is hit before the fixpoint (an unconverged labeling
    silently keeps transitive duplicates — fail loudly instead).
    """
    with _constraint_propagation_disabled(pairs.sparkSession):
        return _duplicate_clusters_impl(
            pairs, max_iterations, algorithm, driver_pair_threshold
        )


def _duplicate_clusters_impl(
    pairs: DataFrame,
    max_iterations: int,
    algorithm: str,
    driver_pair_threshold: int,
) -> DataFrame:
    if algorithm == "auto":
        # the pairs frame is usually an LSH band group-by + distinct —
        # expensive to recompute. Materialize it ONCE so the strategy
        # count(), the union-find collect() (small path) and the edges
        # build (distributed path) all read cached partitions instead of
        # re-running the pipeline. localCheckpoint frees itself on RDD GC.
        pairs = pairs.localCheckpoint(eager=True)
        n_pairs = pairs.count()
        if n_pairs <= driver_pair_threshold:
            return _cc_driver_union_find(pairs)
        algorithm = "two_phase"
    elif algorithm == "two_phase":
        # two_phase reads the pairs twice (node set + oriented edges) —
        # same materialize-once rule as the auto path. min_label keeps
        # its single consumer (the symmetrize->distinct->checkpoint).
        pairs = pairs.localCheckpoint(eager=True)
    a, b = pairs.columns[0], pairs.columns[1]
    if algorithm == "two_phase":
        # two_phase only needs the big->small ORIENTED edge set plus the
        # node set — derive both straight from the pairs (one distinct
        # over n_pairs rows), never materializing the 2x symmetrized
        # set that the min-label variant needs (at bench x10 scale that
        # symmetrize+distinct was a full extra shuffle of 3.9M rows
        # thrown away by the very next orientation filter)
        return _cc_two_phase(pairs, max_iterations, driver_pair_threshold)
    if algorithm != "min_label":
        raise ValueError(f"Unknown clustering algorithm {algorithm!r}")
    # symmetrize in ONE pass: each pair row explodes into its two
    # orientations. The union-of-reversed-selves formulation would (a)
    # compute the pairs plan TWICE (each union child is a full lineage)
    # and (b) trip a Catalyst constraint-rewrite bug
    # (UnionBase.rewriteConstraints: "key not found: src#N") when the
    # pairs plan carries higher-order-function constraints from the LSH
    # bucket pair expansion.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a).alias("src"), F.col(b).alias("dst")),
                F.struct(F.col(b).alias("src"), F.col(a).alias("dst")),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst")
    edges = edges.distinct().localCheckpoint(eager=True)
    # label init = the FIRST propagation hop for free: min(id, min N(id))
    # via one groupBy over the symmetrized edges — the same single
    # shuffle a plain `select(src).distinct()` init would cost, but one
    # hop further along (star-shaped clusters converge at init)
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("label"))
        .select(F.col("src").alias("id"), "label")
        .localCheckpoint(eager=True)
    )
    # Sum after the init hop: lets a single confirming round detect that
    # init already reached the fixpoint (a star with max_iterations=1).
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).first()["s"]
    converged = False
    hops_left = max(0, max_iterations - 1)  # init consumed one hop
    while True:
        # The confirming round is budgeted SEPARATELY from the
        # propagation hops: a graph whose labels settle exactly on the
        # final allowed hop still needs one unchanged-sum round to
        # prove the fixpoint, and that proof round must not count
        # against max_iterations (else it spuriously raises).
        confirming = hops_left <= 0
        # two propagation hops per materialized round: each round's
        # fixed cost (job scheduling + checkpoint + convergence agg)
        # dominates at moderate graph sizes, so folding two hops into
        # one checkpointed plan halves the round count for the same
        # shuffle volume. Convergence stays exact: hops are monotone
        # (labels only decrease), so an unchanged sum after a 2-hop
        # round implies the 1-hop fixpoint too.
        l = labels
        for _ in range(min(2, hops_left) if not confirming else 1):
            hops_left -= 1
            nbr = edges.join(l, edges["dst"] == l["id"]).select(
                edges["src"].alias("id"), l["label"]
            )
            l = (
                nbr.unionByName(l.select("id", "label"))
                .groupBy("id")
                .agg(F.min("label").alias("label"))
            )
        labels = l.localCheckpoint(eager=True)
        # decimal(38,0): exact (no long overflow) for any realistic id
        # space; the agg runs over the just-checkpointed partitions
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
        if confirming:
            # the one extra proof round still changed labels —
            # genuinely unconverged within max_iterations
            break
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters did not converge within {max_iterations} "
            "iterations (component diameter exceeds the cap); returning "
            "partial labels would silently keep transitive duplicates — "
            "raise max_iterations or use algorithm='two_phase'"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _cc_driver_union_find(pairs: DataFrame) -> DataFrame:
    """Exact connected components driver-side (path-halving union-find)
    for candidate-pair sets small enough to collect — the `auto` fast
    path. Output schema matches the distributed variants.

    Transfer rides Arrow both ways (``toPandas`` in, a pandas frame
    out): at the 200k-edge crossover bound, ``collect()``'s per-Row
    object construction plus the plain-tuple ``createDataFrame``
    pickling were ~3x the cost of the union-find itself (measured on
    BENCH b10 x10: 2.4 s -> the Arrow path's sub-second); the Python
    loop over plain ints is unchanged."""
    id_type = pairs.schema[0].dataType
    parent: Dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    try:
        pdf = pairs.toPandas()
        edges = zip(pdf.iloc[:, 0].tolist(), pdf.iloc[:, 1].tolist())
    except Exception:
        edges = ((r[0], r[1]) for r in pairs.collect())
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    spark = pairs.sparkSession
    schema = T.StructType(
        [
            T.StructField("doc_id", id_type, False),
            T.StructField("cluster_id", id_type, False),
        ]
    )
    try:
        import pandas as pd

        out = pd.DataFrame(
            {"doc_id": list(parent),
             "cluster_id": [find(x) for x in parent]}
        )
        return spark.createDataFrame(out, schema)
    except Exception:
        rows = [(x, find(x)) for x in parent]
        return spark.createDataFrame(rows, schema)


#: broadcast the per-node contraction label table when it has at most
#: this many rows (~80 MB of (long, long) — safely under executor
#: memory at any realistic cluster size); bigger graphs fall back to
#: shuffle joins of the same volume a star round would pay
_CC_BCAST_NODES = 5_000_000


def _cc_two_phase(
    pairs: DataFrame, max_iterations: int, finish_threshold: int = 0
) -> DataFrame:
    """Large-star/small-star connected components (public algorithm:
    Kiveris et al. 2014). Takes the raw duplicate-pair frame (two id
    columns, any orientation); each round is one large-star then one
    small-star, each = one groupBy + one join; the edge set converges
    to stars centered at each component's minimum id in O(log n)
    rounds regardless of diameter. Convergence is checked EXACTLY: the
    round output is a distinct oriented (big→small) edge set, so equal
    counts plus an empty ``exceptAll`` against the previous round's
    set ⟺ set equality ⟺ fixpoint. Both the intra-round ``large``
    frame and the round output are eagerly localCheckpointed: lineage
    must not grow with rounds, and the checkpoint gives the next
    sub-plan exact (tiny) size stats, so its join planning beats the
    persist() alternative (measured: persist made the star rounds ~30%
    slower — the cached plan hides the collapsed cardinality).

    ``finish_threshold``: the stars contract the edge set geometrically
    (LSH graphs: >20x in round one), so once a round's output fits the
    same driver crossover bound the ``auto`` strategy uses, the
    remainder is finished with exact driver union-find instead of
    paying 2-3 more checkpointed rounds — Kiveris et al.'s own
    finish-small-remainders-locally step. Components are preserved by
    every star round, so union-find over the contracted edges labels
    identically to running the rounds to their fixpoint; 0 disables.

    Round 0 is a MIN-LABEL CONTRACTION prepass instead of a full
    large+small star pair: one groupBy computes ``m(u) = min(N(u) ∪
    {u})`` (every node merges into an adjacent node — a valid quotient
    that preserves components exactly), then the pair list rewrites to
    ``(m(a), m(b))`` edges, same-label edges dying in the filter. Two
    wins over a star round at this stage: the per-NODE label table is
    orders of magnitude smaller than the pair list on LSH graphs
    (dense near-dup clusters), so when it fits the broadcast bound the
    rewrite joins are map-side — round 0 then costs ONE aggregation
    shuffle plus a distinct over the surviving cross-cluster edges,
    instead of three full-width shuffles; and the final labeling
    becomes a broadcast join through the label table rather than a
    shuffle join over the full node set. Past the broadcast bound the
    joins fall back to shuffles of exactly the volume a star round
    would have paid — never worse, no driver bound.
    """
    a, b = pairs.columns[0], pairs.columns[1]
    # -- round 0: min-label contraction (see docstring) --------------
    sym0 = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a).alias("src"), F.col(b).alias("dst")),
                F.struct(F.col(b).alias("src"), F.col(a).alias("dst")),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst")
    labels0 = (
        sym0.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("m"))
        .localCheckpoint(eager=True)
    )
    # one row per node-with-an-edge: the checkpoint makes its (tiny)
    # size exact, so the broadcast decision is measured, not guessed
    bcast = labels0.count() <= _CC_BCAST_NODES
    la = labels0.select(F.col("src").alias(a), F.col("m").alias("__ma"))
    lb = labels0.select(F.col("src").alias(b), F.col("m").alias("__mb"))
    if bcast:
        la, lb = F.broadcast(la), F.broadcast(lb)
    e = (
        pairs.join(la, a).join(lb, b)
        .where(F.col("__ma") != F.col("__mb"))
        .select(
            F.greatest("__ma", "__mb").alias("src"),
            F.least("__ma", "__mb").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _label_nodes(m_labels: DataFrame) -> DataFrame:
        """Compose node → m(node) → component label. ``m_labels`` maps
        contracted nodes (m-values) to their final label; contracted
        nodes absent from it are their own component's root."""
        if bcast:
            m_labels = F.broadcast(m_labels)
        return labels0.join(
            m_labels, labels0["m"] == m_labels["__mnode"], "left"
        ).select(
            F.col("src").alias("doc_id"),
            F.coalesce(F.col("__mlabel"), F.col("m")).alias("cluster_id"),
        )

    n0 = e.count()
    if n0 <= finish_threshold:
        uf = _cc_driver_union_find(e).select(
            F.col("doc_id").alias("__mnode"),
            F.col("cluster_id").alias("__mlabel"),
        )
        return _label_nodes(uf)
    prev_fp = n0
    converged = False
    for _ in range(max_iterations):
        # -- large-star: for each u, m = min(N(u) ∪ {u}); link every
        # strictly-larger neighbor v > u to m
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        large = (
            sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # -- small-star: on (u > v) edges, m = min(v); link u and each
        # smaller neighbor v to m
        mins2 = large.groupBy("src").agg(F.min("dst").alias("m"))
        with_m = large.join(mins2, "src")
        small = (
            with_m.select(F.col("src"), F.col("m").alias("dst"))
            .unionByName(
                with_m.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        prev_e, e = e, small
        n = e.count()
        if n <= finish_threshold:
            # contracted remainder fits the driver crossover bound:
            # exact union-find over it, composed through round 0's
            # node → m(node) contraction map
            uf = _cc_driver_union_find(e).select(
                F.col("doc_id").alias("__mnode"),
                F.col("cluster_id").alias("__mlabel"),
            )
            return _label_nodes(uf)
        if (
            prev_fp is not None
            and n == prev_fp
            and e.exceptAll(prev_e).limit(1).count() == 0
        ):
            converged = True
            break
        prev_fp = n
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters(two_phase) did not converge within "
            f"{max_iterations} rounds — raise max_iterations"
        )
    # fixpoint edges are stars (node → component min); m-nodes absent
    # from e (whole cluster contracted in round 0) are their own root
    stars = e.groupBy("src").agg(F.min("dst").alias("label")).select(
        F.col("src").alias("__mnode"), F.col("label").alias("__mlabel")
    )
    return _label_nodes(stars)


def exact_window_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact repeated-token-window dedup (the doc-level variant of Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — public): a document is a duplicate when ANY of its
    ``window``-token windows also occurs in a smaller-id document.
    Catches verbatim plagiarism/boilerplate that MinHash's
    whole-document similarity dilutes away (a 50-token copied passage
    inside an otherwise-unique 5000-token doc).

    Output: ``(id_col, n_windows, is_dup)`` — deterministic.

    Scale posture: one explode (docs × windows rows, bounded by total
    token count), one ``groupBy(window_key).min(id)`` with map-side
    partial agg, one equi-join back — never a doc×doc product. With
    ``hash_fn="xxhash64"`` (default) the shuffle key is an 8-byte hash
    instead of the window text (~10-60 bytes saved per row at 100 TB);
    ``hash_fn="none"`` keeps the raw string key so other engines can
    re-derive results exactly."""
    # compute-bound like minhash: parallelism must not depend on the
    # input file layout (a single small parquet file = one partition)
    df = repartition_up(df, id_col)
    # tokenize into a MATERIALIZED column first: referencing the
    # filter(split(...)) expression inside the window lambda would
    # inline it, re-tokenizing the whole document once per window —
    # O(len x windows) per doc instead of O(len)
    tokenized = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+"),
            lambda w: F.length(w) > 0,
        ).alias("__words"),
    )
    words = F.col("__words")
    n = F.lit(window)

    def _win(i):
        # size-n slice: sequence would DESCEND if start > stop, so the
        # short-doc case is handled by the when() guard below
        return F.concat_ws(" ", F.slice(words, i + 1, n))

    if hash_fn == "none":
        win_of = _win
        empty_t = "array<string>"
    else:
        # hash INSIDE the window array: the checkpointed/exploded rows
        # then carry 8-byte longs instead of ~(10-60)-byte window
        # strings — at 100 TB that is most of the materialization and
        # shuffle volume. n_windows = distinct hashes == distinct
        # strings modulo the same collision odds the shuffle key
        # already accepts.
        win_of = lambda i: F.xxhash64(_win(i))  # noqa: E731
        empty_t = "array<bigint>"
    wins = F.when(
        F.size(words) >= window,
        F.array_distinct(
            F.transform(F.sequence(F.lit(0), F.size(words) - n), win_of)
        ),
    ).otherwise(F.array().cast(empty_t))
    # materialize the window table ONCE: it feeds the explode, the
    # min-per-window join AND the final n_windows output — and without
    # a hard barrier, InferFiltersFromGenerate clones the whole window-
    # generation expression into a Filter BELOW the repartition (single
    # input partition → the heavy expression runs twice, once
    # single-threaded; measured 10x slower at sf0.1). localCheckpoint
    # frees on RDD GC, no CacheManager entry.
    docs = tokenized.select(
        F.col(id_col), wins.alias("__wins")
    ).localCheckpoint(eager=True)
    exploded = docs.select(
        id_col, F.explode("__wins").alias("__k")
    )
    min_per = exploded.groupBy("__k").agg(F.min(id_col).alias("__min_id"))
    dup_ids = (
        exploded.join(min_per, on="__k")
        .where(F.col(id_col) > F.col("__min_id"))
        .select(id_col)
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        docs.select(id_col, F.size("__wins").alias("n_windows"))
        .join(dup_ids, on=id_col, how="left")
        .select(
            id_col,
            "n_windows",
            F.coalesce("__dup", F.lit(False)).alias("is_dup"),
        )
    )


def select_survivors(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    order_by: Optional[Sequence] = (),
    descending: bool = True,
) -> DataFrame:
    """Pick ONE survivor per duplicate cluster (the step after
    :func:`duplicate_clusters`): documents in no cluster survive
    unconditionally; within a cluster, the survivor is

    * the canonical member (``id == cluster_id``) when ``order_by`` is
      empty — free: a filter, no extra shuffle; or
    * the best row by ``order_by`` (e.g. a quality score, text length —
      ``descending=True`` keeps the HIGHEST) with ``id_col`` as the
      deterministic tie-break — real curation keeps the best duplicate,
      not the smallest id. One ``max_by`` aggregation per cluster
      (partial agg before the shuffle, skew-immune) + a semi-join of
      survivor ids back onto the docs.

    ``clusters`` is ``(doc_id, cluster_id)`` as produced by
    :func:`duplicate_clusters`.
    """
    cl = clusters.select(
        F.col(clusters.columns[0]).alias(id_col),
        F.col(clusters.columns[1]).alias("__cluster_id"),
    )
    joined = df.join(cl, on=id_col, how="left")
    if not order_by:
        return joined.where(
            F.col("__cluster_id").isNull()
            | (F.col(id_col) == F.col("__cluster_id"))
        ).drop("__cluster_id")
    order_cols = [
        F.col(c) if isinstance(c, str) else c for c in list(order_by)
    ]
    if not descending:
        # max_by keeps the maximum of the struct; negate via sort keys
        # is not generally possible for non-numeric columns, so flip by
        # using min_by instead
        pick = F.min_by(
            F.col(id_col), F.struct(*order_cols, F.col(id_col))
        )
    else:
        pick = F.max_by(
            F.col(id_col), F.struct(*order_cols, F.col(id_col))
        )
    winners = (
        joined.where(F.col("__cluster_id").isNotNull())
        .groupBy("__cluster_id")
        .agg(pick.alias("__winner"))
        .select(F.col("__winner").alias(id_col))
    )
    survivors = joined.where(F.col("__cluster_id").isNull()).drop(
        "__cluster_id"
    )
    kept = df.join(winners, on=id_col, how="left_semi")
    return survivors.unionByName(kept)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_size: int = 5,
    threshold: float = 0.8,
    candidates: Optional[DataFrame] = None,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    If ``candidates`` (id_a, id_b) is given (e.g. from LSH), verify only
    those — the scalable path (an equi-join, never a cartesian product).
    The all-pairs fallback is O(n²) — a scale trap on anything but test
    data — so it must be opted into explicitly with
    ``allow_all_pairs=True``; calling without either raises instead of
    silently planning a cartesian join. Jaccard via
    ``array_intersect``/``array_union`` sizes, JVM-side.
    """
    if candidates is None and not allow_all_pairs:
        raise ValueError(
            "ngram_jaccard_pairs without `candidates` is an O(n^2) "
            "cartesian product. Pass candidates from an LSH pre-filter "
            "(minhash_lsh_duplicate_pairs / simhash_duplicate_pairs), or "
            "opt into the all-pairs path explicitly with "
            "allow_all_pairs=True (test scale only)."
        )
    sh_a = df.select(
        F.col(id_col).alias("id_a"),
        _shingles(F.col(text_col), shingle_size).alias("sh_a"),
    )
    sh_b = df.select(
        F.col(id_col).alias("id_b"),
        _shingles(F.col(text_col), shingle_size).alias("sh_b"),
    )
    if candidates is None:
        pairs = sh_a.crossJoin(sh_b).where(F.col("id_a") < F.col("id_b"))
    else:
        pairs = candidates.join(sh_a, "id_a").join(sh_b, "id_b")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return pairs.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def simhash(
    df: DataFrame, text_col: str, id_col: str, shingle_size: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Bit b of the fingerprint is 1 iff the majority of shingle hashes
    have bit b set. Default path: higher-order functions, per-bit vote =
    sum over shingles of ±1 — all JVM-side.

    ``hash_fn='md5_64'``: engine-portable 60-bit variant (bits 60-63
    always 0) computed as explode → ONE groupBy with 60 sum aggregates —
    partial aggregation reduces each task's stream to 60 longs per doc
    before the shuffle, so this formulation is also the scale path.
    """
    if hash_fn == "md5_64":
        sh = _shingles(F.col(text_col), shingle_size)
        exploded = df.select(F.col(id_col), F.explode(sh).alias("__s")).select(
            F.col(id_col), _md5_64(F.col("__s")).alias("__h")
        )
        votes = [
            F.sum(
                F.when(
                    F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"__v{b}")
            for b in range(60)
        ]
        agg = exploded.groupBy(id_col).agg(*votes)
        fp = None
        for b in range(60):
            term = F.when(F.col(f"__v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            fp = term if fp is None else fp + term
        return agg.select(F.col(id_col), fp.cast("long").alias("simhash"))
    sh = _shingles(F.col(text_col), shingle_size)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    bits = []
    for b in range(64):
        vote = F.aggregate(
            hashed,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b if b < 63 else -(1 << 63))) != 0, 1).otherwise(-1),
        )
        bits.append(F.when(vote > 0, F.lit(1 << b if b < 63 else -(1 << 63))).otherwise(0))
    fp = bits[0]
    for x in bits[1:]:
        fp = fp.bitwiseOR(x)
    return df.select(F.col(id_col), fp.cast("long").alias("simhash"))


def minhash_estimated_jaccard(sig_a, sig_b):
    """Estimated Jaccard similarity from two minhash signature arrays:
    the fraction of positions where the signatures agree (the textbook
    MinHash estimator, E[agree] = J). A pure Column expression — at
    100 TB you verify LSH candidates against the STORED signature table
    instead of re-shingling the documents."""
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches / F.size(sig_a)


def verify_pairs_by_signature(
    pairs: DataFrame,
    sigs: DataFrame,
    id_col: str,
    threshold: float = 0.5,
    sim_col: str = "est_jaccard",
) -> DataFrame:
    """Filter candidate pairs by estimated Jaccard computed from the
    signature table (``minhash_signatures`` output: ``(id, minhash)``).
    Two equi-joins against the (small, 8B x num_hashes per doc)
    signature table + one fold per pair — candidate verification
    without touching document text. Returns ``(id_a, id_b, sim_col)``
    with ``sim_col >= threshold``."""
    a = sigs.select(
        F.col(id_col).alias("id_a"), F.col("minhash").alias("__sa")
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"), F.col("minhash").alias("__sb")
    )
    return (
        pairs.join(a, on="id_a").join(b, on="id_b")
        .withColumn(
            sim_col, minhash_estimated_jaccard(F.col("__sa"), F.col("__sb"))
        )
        .where(F.col(sim_col) >= threshold)
        .select("id_a", "id_b", sim_col)
    )
