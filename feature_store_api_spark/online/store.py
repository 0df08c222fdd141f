"""Online store: latest-value-per-primary-key materialization + lookups.

Parity targets: the online feature store the reference fills via Kafka
and serves from MySQL/RonDB — upsert keeps only the newest row per pk
(``/root/reference/python/hsfs/core/hudi_engine.py:141-149`` precombine
semantics), lookups are per-FG point/batch selects stitched on serving
keys (``core/online_store_sql_engine.py:279-437``, prepared-statement
shape ``SELECT ... WHERE pk = ?`` / ``WHERE pk IN (?)``).

Implementation: a hash-bucketed parquet table per feature group holding
exactly one row per primary key, partitioned by ``_online_bucket =
crc32(pk) % num_buckets``. An upsert rewrites ONLY the buckets the
batch touches (dynamic partition overwrite) — a 1-row micro-batch
rewrites one bucket, not the table, so write cost scales with batch
size instead of key count. Point lookups compute the bucket in Python
(the bucket hash is engine-portable) and prune to one partition
directory at the scan. At cluster scale you'd back this with a real KV
store; the API is the contract.
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import latest_per_key

_SEQ = "_online_seq"
_BUCKET = "_online_bucket"


def _portable_str(v) -> Optional[str]:
    """Python-side string form matching Spark's ``CAST(x AS STRING)``
    for the pk types we bucket on (int, str). Returns None for types
    whose cast text may diverge (float/bool/...) — callers then skip
    bucket pruning (correct, just unpruned)."""
    if isinstance(v, bool):  # bool is an int subclass — exclude first
        return None
    if isinstance(v, (int, str)):
        return str(v)
    return None


class OnlineStore:
    def __init__(
        self,
        location: str,
        primary_key: Sequence[str],
        event_time: Optional[str] = None,
        precombine_key: Optional[str] = None,
        num_buckets: int = 32,
    ) -> None:
        self.location = location
        self.primary_key = list(primary_key)
        self.event_time = event_time
        self.precombine_key = precombine_key
        os.makedirs(location, exist_ok=True)
        # bucket count must stay stable for the life of the table: a
        # sidecar records it at creation and wins over the ctor arg
        meta_path = os.path.join(location, "_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                self.num_buckets = int(json.load(fh)["num_buckets"])
        else:
            self.num_buckets = int(num_buckets)
            with open(meta_path, "w") as fh:
                json.dump({"num_buckets": self.num_buckets}, fh)

    @classmethod
    def for_feature_group(cls, fg) -> "OnlineStore":
        if fg.location is None:
            raise ValueError(f"Feature group {fg.name!r} has no managed location")
        return cls(
            os.path.join(fg.location, "online"),
            primary_key=fg.primary_key,
            event_time=fg.event_time,
            precombine_key=getattr(fg, "precombine_key", None),
        )

    @property
    def _path(self) -> str:
        return os.path.join(self.location, "latest")

    def _exists(self) -> bool:
        if not os.path.exists(self._path):
            return False
        for root, _dirs, files in os.walk(self._path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    # -- bucketing ---------------------------------------------------------
    def _bucket_expr(self):
        """crc32(pk1 <US> pk2 ...) % num_buckets — chosen over Spark's
        ``hash()`` because the same value is computable driver-side
        (zlib.crc32), letting point lookups prune partitions."""
        parts = [F.col(c).cast("string") for c in self.primary_key]
        return F.pmod(
            F.crc32(F.concat_ws("\x1f", *parts)), F.lit(self.num_buckets)
        ).cast("int")

    def _bucket_of(self, key: Dict) -> Optional[int]:
        parts = []
        for k in self.primary_key:
            s = _portable_str(key.get(k))
            if s is None:
                return None
            parts.append(s)
        return zlib.crc32("\x1f".join(parts).encode("utf-8")) % self.num_buckets

    def read(self, spark: SparkSession) -> DataFrame:
        if not self._exists():
            raise FileNotFoundError(f"Online store empty at {self._path}")
        return spark.read.parquet(self._path).drop(_SEQ, _BUCKET)

    # -- write path --------------------------------------------------------
    def upsert(self, df: DataFrame) -> None:
        """Keep the newest row per pk, rewriting only touched buckets.

        Merge = union(batch, current rows OF THE BATCH'S BUCKETS) →
        latest-per-key window → dynamic partition overwrite of exactly
        those bucket directories. Ordering: event_time, then precombine,
        then arrival sequence (so replays of the same key at equal
        timestamps resolve to the latest write — Hudi precombine
        parity). If the batch widens the schema, every bucket is
        rewritten once so all files keep one schema.
        """
        spark = df.sparkSession
        order = [c for c in (self.event_time,) if c]
        ties = [c for c in (self.precombine_key,) if c] + [_SEQ]
        # monotonic batch sequence from a sidecar counter — no Spark job
        seq_path = os.path.join(self.location, "_seq")
        seq = 0
        if os.path.exists(seq_path):
            with open(seq_path) as fh:
                seq = int(fh.read().strip() or 0) + 1
        with open(seq_path, "w") as fh:
            fh.write(str(seq))
        batch = df.withColumn(_SEQ, F.lit(seq)).withColumn(
            _BUCKET, self._bucket_expr()
        )
        if self._exists():
            current = spark.read.parquet(self._path)
            widens = any(
                c not in current.columns for c in batch.columns
            )
            if not widens:
                # bounded collect: ≤ num_buckets ints
                touched = [
                    r[0] for r in batch.select(_BUCKET).distinct().collect()
                ]
                current = current.where(F.col(_BUCKET).isin(touched))
            merged = current.unionByName(batch, allowMissingColumns=True)
        else:
            merged = batch
        latest = latest_per_key(
            merged, self.primary_key,
            order_by=order or [_SEQ], tie_breakers=ties,
        )
        # one shuffle partition per bucket → one file per bucket dir;
        # dynamic overwrite replaces only the partitions present in
        # the output (the touched buckets)
        (
            latest.repartition(F.col(_BUCKET))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BUCKET)
            .parquet(self._path)
        )

    # -- read path (serving) ----------------------------------------------
    def _pruned(self, spark: SparkSession, keys: List[Dict]) -> DataFrame:
        """Table scan restricted to the buckets the keys hash to —
        partition pruning keeps point lookups at O(1) directories."""
        df = spark.read.parquet(self._path)
        buckets = set()
        for k in keys:
            b = self._bucket_of(k)
            if b is None:
                return df.drop(_SEQ, _BUCKET)  # unprunable key type
            buckets.add(b)
        return df.where(F.col(_BUCKET).isin(sorted(buckets))).drop(_SEQ, _BUCKET)

    def get_feature_vector(
        self, spark: SparkSession, key: Dict, return_type: str = "dict"
    ) -> Optional[Dict]:
        """Single lookup: ``WHERE pk1 = v1 AND pk2 = v2`` (prepared-
        statement parity, serving_prepared_statement_fixtures.json:40)."""
        if not self._exists():
            raise FileNotFoundError(f"Online store empty at {self._path}")
        df = self._pruned(spark, [key])
        cond = None
        for k in self.primary_key:
            c = F.col(k) == F.lit(key[k])
            cond = c if cond is None else (cond & c)
        rows = df.where(cond).limit(2).collect()
        if not rows:
            return None
        return rows[0].asDict() if return_type == "dict" else rows[0]

    def get_feature_vectors(
        self, spark: SparkSession, keys: List[Dict]
    ) -> List[Optional[Dict]]:
        """Batch lookup: single-pk → ``IN`` list; composite pk → semi
        join on a literal frame. Results stitched back in request order
        (parity ``core/online_store_sql_engine.py:337-437``)."""
        if not self._exists():
            raise FileNotFoundError(f"Online store empty at {self._path}")
        return self.lookup(self._pruned(spark, keys), keys)

    def lookup(self, df: DataFrame, keys: List[Dict]) -> List[Optional[Dict]]:
        """The IN / semi-join lookup against a given snapshot frame —
        lets a serving layer hand in a persisted (cached) snapshot so
        repeated calls skip the parquet scan entirely."""
        if len(self.primary_key) == 1:
            pk = self.primary_key[0]
            vals = [k[pk] for k in keys]
            hits = df.where(F.col(pk).isin(vals)).collect()
        else:
            spark_keys = df.sparkSession.createDataFrame(
                [tuple(k[p] for p in self.primary_key) for k in keys],
                self.primary_key,
            )
            hits = df.join(
                F.broadcast(spark_keys), on=self.primary_key, how="left_semi"
            ).collect()
        by_key = {tuple(r[p] for p in self.primary_key): r.asDict() for r in hits}
        return [by_key.get(tuple(k[p] for p in self.primary_key)) for k in keys]
