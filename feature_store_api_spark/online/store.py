"""Online store: latest-value-per-primary-key materialization + lookups.

Parity targets: the online feature store the reference fills via Kafka
and serves from MySQL/RonDB — upsert keeps only the newest row per pk
(``/root/reference/python/hsfs/core/hudi_engine.py:141-149`` precombine
semantics), lookups are per-FG point/batch selects stitched on serving
keys (``core/online_store_sql_engine.py:279-437``, prepared-statement
shape ``SELECT ... WHERE pk = ?`` / ``WHERE pk IN (?)``).

Implementation: a compact parquet table per feature group holding
exactly one row per primary key. Upserts merge-and-overwrite (the
table is "latest state", so it stays small — O(#keys)); lookups are
filters on the pk columns, which Spark pushes into the parquet scan.
At cluster scale you'd back this with a real KV store; the API is the
contract.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import latest_per_key

_SEQ = "_online_seq"


class OnlineStore:
    def __init__(
        self,
        location: str,
        primary_key: Sequence[str],
        event_time: Optional[str] = None,
        precombine_key: Optional[str] = None,
    ) -> None:
        self.location = location
        self.primary_key = list(primary_key)
        self.event_time = event_time
        self.precombine_key = precombine_key
        os.makedirs(location, exist_ok=True)

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
        return os.path.exists(self._path) and any(
            f.endswith(".parquet") for f in os.listdir(self._path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        if not self._exists():
            raise FileNotFoundError(f"Online store empty at {self._path}")
        return spark.read.parquet(self._path).drop(_SEQ)

    # -- write path --------------------------------------------------------
    def upsert(self, df: DataFrame) -> None:
        """Keep the newest row per pk: collapse the batch, merge with the
        current table, overwrite. Ordering: event_time, then precombine,
        then arrival sequence (so replays of the same key at equal
        timestamps resolve to the latest write — Hudi precombine
        parity)."""
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
        batch = df.withColumn(_SEQ, F.lit(seq))
        if self._exists():
            # align schemas (new columns become NULL on old rows)
            current = spark.read.parquet(self._path)
            merged = current.unionByName(batch, allowMissingColumns=True)
        else:
            merged = batch
        latest = latest_per_key(
            merged, self.primary_key,
            order_by=order or [_SEQ], tie_breakers=ties,
        )
        # write-then-swap: parquet overwrite into a temp dir, atomic rename.
        # the latest-state table is O(#keys); keep file count low
        tmp = self._path + ".tmp"
        latest.coalesce(8).write.mode("overwrite").parquet(tmp)
        import shutil

        if os.path.exists(self._path):
            shutil.rmtree(self._path)
        os.replace(tmp, self._path)

    # -- read path (serving) ----------------------------------------------
    def get_feature_vector(
        self, spark: SparkSession, key: Dict, return_type: str = "dict"
    ) -> Optional[Dict]:
        """Single lookup: ``WHERE pk1 = v1 AND pk2 = v2`` (prepared-
        statement parity, serving_prepared_statement_fixtures.json:40)."""
        df = self.read(spark)
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
        df = self.read(spark)
        if len(self.primary_key) == 1:
            pk = self.primary_key[0]
            vals = [k[pk] for k in keys]
            hits = df.where(F.col(pk).isin(vals)).collect()
        else:
            spark_keys = spark.createDataFrame(
                [tuple(k[p] for p in self.primary_key) for k in keys],
                self.primary_key,
            )
            hits = df.join(
                F.broadcast(spark_keys), on=self.primary_key, how="left_semi"
            ).collect()
        by_key = {tuple(r[p] for p in self.primary_key): r.asDict() for r in hits}
        return [by_key.get(tuple(k[p] for p in self.primary_key)) for k in keys]
