"""Deduplication operators.

``latest_per_key`` is the reference's online-store / precombine
semantics (``/root/reference/python/hsfs/core/hudi_engine.py:126-149``,
SURVEY §2.5). The rest is the driver-mandated LLM-data-pipeline dedup
suite: exact, MinHash-LSH, SimHash, n-gram Jaccard — all pure
DataFrame ops sized for 100 TB (hash-partitioned shuffles, no
driver-side loops, no Python row UDFs in the hot path).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Newest row per key: ``ROW_NUMBER() OVER (PARTITION BY keys ORDER
    BY order_by DESC, tie_breakers DESC) = 1``.

    This is one shuffle on ``keys``; with AQE skew handling a hot key is
    split at runtime. The precombine tie-breaker mirrors Hudi's
    ``PAYLOAD_ORDERING_FIELD`` (``core/hudi_engine.py:141-149``).
    """
    order = [F.col(c).desc_nulls_last() for c in list(order_by) + list(tie_breakers)]
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

# two large primes for the universal-hash family h_i(x) = (a_i*x + b_i) mod P
_MERSENNE_P = (1 << 61) - 1


def _shingles(col, n: int):
    """Character n-gram shingles of a lowercased, whitespace-collapsed
    string column — JVM-side via sequence/transform, no Python UDF."""
    norm = F.regexp_replace(F.lower(col), r"\s+", " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(norm) - n, F.lit(0))),
            lambda i: F.substring(norm, 1, 0x7FFFFFFF).substr(i + 1, n),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 5,
    seed: int = 13,
) -> DataFrame:
    """Per-document MinHash signature as ``array<bigint>``.

    Each permutation i is a universal hash ``(a_i * h + b_i) mod P`` of
    the shingle's xxhash64; the signature element is the min over
    shingles. All computed with ``transform``/``aggregate`` higher-order
    functions — stays in codegen, scales linearly, one narrow pass.
    """
    import random

    rnd = random.Random(seed)
    coeffs = [(rnd.randrange(1, _MERSENNE_P), rnd.randrange(0, _MERSENNE_P)) for _ in range(num_hashes)]

    sh = _shingles(F.col(text_col), shingle_size)
    hashed = F.transform(sh, lambda s: F.abs(F.xxhash64(s)))
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    hashed,
                    lambda h: (h % F.lit(_MERSENNE_P) * F.lit(a % 100000) + F.lit(b))
                    % F.lit(_MERSENNE_P),
                )
            ).alias(f"mh_{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    return df.select(F.col(id_col), sig.alias("minhash"))


def minhash_lsh_duplicate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 13,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    signature → split into ``bands`` bands of ``num_hashes//bands`` rows
    → hash each band → self-join on (band_index, band_hash). The
    self-join is an equi-join on the band bucket, so Spark shuffles on
    the bucket key — no O(n²) comparison. Output: ``(id_a, id_b)``
    with id_a < id_b, distinct.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size, seed)
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_size: int = 5,
    threshold: float = 0.8,
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    If ``candidates`` (id_a, id_b) is given (e.g. from LSH), verify only
    those — the scalable path. Otherwise all pairs (test scale only).
    Jaccard via ``array_intersect``/``array_union`` sizes, JVM-side.
    """
    sh = df.select(
        F.col(id_col), _shingles(F.col(text_col), shingle_size).alias("sh")
    )
    if candidates is None:
        a, b = sh.alias("a"), sh.alias("b")
        pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    else:
        pairs = (
            candidates.join(
                sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
            ).join(
                sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b"
            )
        ).selectExpr("id_a", "id_b", "sh_a as `a.sh`", "sh_b as `b.sh`")
        pairs = pairs.select(
            "id_a", "id_b", F.col("`a.sh`").alias("sh_a"), F.col("`b.sh`").alias("sh_b")
        )
    if candidates is None:
        pairs = pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return pairs.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str, id_col: str, shingle_size: int = 4) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Bit b of the fingerprint is 1 iff the majority of shingle hashes
    have bit b set. Computed with higher-order functions: per-bit vote =
    sum over shingles of ±1 — all JVM-side.
    """
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
