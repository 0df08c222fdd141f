"""Commit-store physical backend writing a REAL Hudi COPY_ON_WRITE table.

Fourth physical backend behind the :class:`~.backend.TimeTravelBackend`
seam — and the one that closes the reference's headline format:
``time_travel_format="HUDI"`` (the reference's default,
``feature_group.py`` + ``core/hudi_engine.py``) now lands as a
published-layout Hudi table WITHOUT the hudi-spark jars:

* ``.hoodie/hoodie.properties`` (COPY_ON_WRITE) + a completed
  ``<instant>.commit`` per store commit on the active timeline;
* each commit's parquet files land as NEW file groups named
  ``<fileId>_<writeToken>_<instant>.parquet`` (bulk-insert semantics:
  groups are never rewritten — the store resolves record versions
  itself, exactly its merge-on-read contract with the Delta/Iceberg
  twins), under ``dt=0`` (single partition path);
* instants use Hudi's ``yyyyMMddHHmmssSSS`` format, derived
  DETERMINISTICALLY from the store's epoch-ms commit time, so
  ``drop_commit`` (vacuum) recomputes the doomed instant and unlinks
  its file group files;
* readable by :mod:`.hudi_reader` (snapshot / as-of-instant) and by
  any real Hudi client — the layout and timeline are the published
  spec (hudi.apache.org/tech-specs/).

The store's own commit metadata stays in the ``_commits.json``
sidecar; external readers see the RAW commit rows incl.
``_commit_time``/``_op`` — the same documented log-view contract as
the other backends.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import datetime, timezone
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .backend import CommitLogBackend

_PARTITION = "dt=0"


def _instant_of(commit_time_ms: int) -> str:
    """Epoch millis -> Hudi instant (``yyyyMMddHHmmssSSS``, UTC).
    Deterministic both ways within the backend: vacuum recomputes it."""
    dt = datetime.fromtimestamp(commit_time_ms / 1000.0, tz=timezone.utc)
    return dt.strftime("%Y%m%d%H%M%S") + f"{commit_time_ms % 1000:03d}"


class HudiBackend(CommitLogBackend):
    """Commit-store physical I/O through a real Hudi COW table."""

    self_merging = False

    def __init__(self, location: str) -> None:
        super().__init__(location)
        self._meta_dir = os.path.join(location, ".hoodie")

    def _ensure_table(self) -> None:
        props = os.path.join(self._meta_dir, "hoodie.properties")
        if os.path.exists(props):
            return
        os.makedirs(self._meta_dir, exist_ok=True)
        name = os.path.basename(self.location.rstrip(os.sep)) or "table"
        with open(props, "w") as fh:
            fh.write(
                "hoodie.table.name=%s\n"
                "hoodie.table.type=COPY_ON_WRITE\n"
                "hoodie.table.version=6\n"
                "hoodie.timeline.layout.version=1\n" % name
            )

    # -- data ------------------------------------------------------------------
    def append_commit(self, df: DataFrame, partition_cols: Sequence[str]) -> None:
        import pyarrow.parquet as pq

        from .commit_store import COMMIT_COL

        self._ensure_table()
        stage = os.path.join(self.location, f"_staging_{uuid.uuid4().hex[:8]}")
        part_dir = os.path.join(self.location, _PARTITION)
        try:
            df.write.mode("overwrite").parquet(stage)
            os.makedirs(part_dir, exist_ok=True)
            commit_time = None
            moved = []
            for name in sorted(os.listdir(stage)):
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(stage, name)
                if commit_time is None:
                    md = pq.ParquetFile(src).metadata
                    sch = md.schema.to_arrow_schema()
                    if COMMIT_COL in sch.names and md.num_row_groups:
                        idx = sch.names.index(COMMIT_COL)
                        st = md.row_group(0).column(idx).statistics
                        if st is not None and st.has_min_max:
                            commit_time = int(st.min)
                moved.append(src)
            if not moved:
                return
            instant = _instant_of(commit_time or 0)
            for i, src in enumerate(moved):
                # new file group per staged file: bulk-insert semantics
                fid = f"fg-{uuid.uuid4().hex[:12]}"
                dst = os.path.join(
                    part_dir, f"{fid}_{i}-0-{i}_{instant}.parquet"
                )
                os.replace(src, dst)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        # completed-commit timeline entry LAST: readers never see the
        # files until the instant is committed (Hudi's visibility rule)
        with open(
            os.path.join(self._meta_dir, f"{instant}.commit"), "w"
        ) as fh:
            json.dump({"fsas.commit-time": commit_time or 0}, fh)

    def scan(self, spark: SparkSession) -> "DataFrame | None":
        if not os.path.isdir(self._meta_dir):
            return None
        if not any(
            n.endswith(".commit") for n in os.listdir(self._meta_dir)
        ):
            return None
        from .hudi_reader import read_hudi

        return read_hudi(spark, self.location)

    def drop_commit(self, commit_time: int) -> bool:
        instant = _instant_of(commit_time)
        marker = os.path.join(self._meta_dir, f"{instant}.commit")
        if not os.path.exists(marker):
            return False
        suffix = f"_{instant}.parquet"
        dropped = False
        part_dir = os.path.join(self.location, _PARTITION)
        if os.path.isdir(part_dir):
            for name in list(os.listdir(part_dir)):
                if name.endswith(suffix):
                    os.remove(os.path.join(part_dir, name))
                    dropped = True
        # the instant leaves the timeline too — a base-file-less
        # completed instant is legal, but real Hudi cleaners retire
        # fully-cleaned commits, and time travel to it is gone anyway
        os.remove(marker)
        return dropped
