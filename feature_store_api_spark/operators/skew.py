"""Skew-mitigation joins: salting for hot keys.

AQE's skew-join splitting (on by default in our session) handles most
skew at runtime by splitting oversized shuffle partitions — prefer it.
Salting is for the case AQE cannot fix: a SINGLE join key so hot that
even a split partition is dominated by one key's rows (AQE splits
partitions, not keys). The classic fix: explode the small side K ways,
scatter the big side's hot rows across K salts, join on (key, salt) —
the hot key's rows now land on K reducers instead of one.

Pure DataFrame ops; the replication factor applies to the SMALL side
only, so the cost is |small| × K extra rows against a K-way spread of
the hot key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salts: int = 16,
    hot_keys: Optional[DataFrame] = None,
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``keys`` with hot-key salting.

    ``large`` rows get a random salt in [0, salts); ``small`` is
    replicated once per salt value (explode of a literal sequence —
    map-side, no shuffle), and the join key becomes (keys..., salt).
    Result equals the plain join (each large row matches exactly the
    one replica carrying its salt).

    With ``hot_keys`` (a 1-column-per-key DataFrame of known-hot
    values, e.g. from a cheap ``groupBy(keys).count()`` probe), only
    rows whose key is hot are salted and only those replicas of
    ``small`` are materialized — the cold path joins unsalted, so the
    replication cost scales with |hot ∩ small|, not |small|.
    """
    keys = list(keys)
    if how not in ("inner", "left"):
        # right/full would emit one row per UNMATCHED replica of the
        # small side (K duplicates) — salting only preserves semantics
        # when unmatched small rows cannot surface
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if hot_keys is None:
        l = large.withColumn(
            _SALT, (F.rand(seed=7) * salts).cast("int")
        )
        s = small.withColumn(
            _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
        )
        return l.join(s, on=keys + [_SALT], how=how).drop(_SALT)

    hot = hot_keys.select(*keys).distinct()
    # split once per side via a broadcast semi/anti probe (hot sets are
    # small by definition)
    l_hot = large.join(F.broadcast(hot), on=keys, how="left_semi")
    l_cold = large.join(F.broadcast(hot), on=keys, how="left_anti")
    s_hot = small.join(F.broadcast(hot), on=keys, how="left_semi")
    s_cold = small.join(F.broadcast(hot), on=keys, how="left_anti")
    salted = (
        l_hot.withColumn(_SALT, (F.rand(seed=7) * salts).cast("int"))
        .join(
            s_hot.withColumn(
                _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
            ),
            on=keys + [_SALT],
            how=how,
        )
        .drop(_SALT)
    )
    plain = l_cold.join(s_cold, on=keys, how=how)
    return salted.unionByName(plain)
