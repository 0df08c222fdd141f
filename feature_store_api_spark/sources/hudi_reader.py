"""Jarless Hudi COPY-ON-WRITE table reader: snapshot + time travel.

Parity: the reference's Hudi engine reads
(``/root/reference/python/hsfs/core/hudi_engine.py:193-224``: snapshot
query, ``as.of.instant`` time travel, incremental pull between
instants). Without hudi-spark jars we implement the READ side of the
published COW layout (hudi.apache.org "Table & Query Types" /
"Timeline" docs):

* ``.hoodie/`` holds the timeline: one ``<instant>.commit`` (JSON,
  completed) per write, plus ``.inflight``/``.requested`` markers this
  reader ignores — only COMPLETED instants are visible (Hudi's
  snapshot isolation);
* data files are base parquet named
  ``<fileId>_<writeToken>_<instantTime>.parquet`` under partition
  directories; copy-on-write rewrites a whole FILE GROUP (same
  ``fileId``) per commit, so a snapshot keeps, per file group, the
  newest base file whose instant is completed and ≤ the as-of instant;
* ``.hoodie/hoodie.properties`` carries table metadata (name, type).

Timeline subtleties handled (both are silent-wrong-rows hazards):

* **archived instants** — Hudi moves old instants out of the active
  timeline (``.hoodie/archived``, ``timeline/history`` in 1.x); base
  files below the earliest active instant are committed by the
  file-system-view rule, not "uncommitted";
* **replacecommits** — clustering / insert_overwrite writes NEW
  fileIds and lists the superseded ones in the metadata's
  ``partitionToReplaceFileIds``; those (partition, fileId) groups are
  dropped from any snapshot at-or-after the replace instant.

Scale shape: timeline listing and file-group resolution are driver-side
metadata work (bounded by commits × file groups, exactly what a real
Hudi client's file-system view does); the data read is one pruned
parquet scan over the selected base files. MERGE_ON_READ tables (avro
log files) are gated with a clear error — resolving log blocks without
the Hudi jars would be silently wrong.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Set, Tuple

from pyspark.sql import DataFrame, SparkSession

_META_DIR = ".hoodie"


def _completed_instants(meta_dir: str) -> List[str]:
    """Sorted completed ACTIVE-timeline commit instants (the
    '<ts>.commit' / '<ts>.replacecommit' files)."""
    out = []
    for name in os.listdir(meta_dir):
        if name.endswith(".commit"):
            out.append(name[: -len(".commit")])
        elif name.endswith(".replacecommit"):
            out.append(name[: -len(".replacecommit")])
    return sorted(out)


def _has_archive(meta_dir: str) -> bool:
    """True when the table has archived timeline instants.

    Hudi archives instants out of ``.hoodie`` (into ``archived/``, or
    ``timeline/history`` in 1.x) once the active timeline exceeds
    ~30 commits; base files written by archived instants are still
    live data. The file-system-view rule applied here: any instant
    STRICTLY BELOW the earliest active instant is committed
    (failed/inflight writes are rolled back before archival, so no
    uncommitted file can carry an instant below the boundary). Without
    this, snapshot reads of mature external COW tables silently drop
    whole file groups."""
    for sub in ("archived", os.path.join("timeline", "history")):
        d = os.path.join(meta_dir, sub)
        if os.path.isdir(d) and os.listdir(d):
            return True
    return False


def _replaced_groups(
    meta_dir: str, visible_replacecommits: List[str]
) -> Set[Tuple[str, str]]:
    """(partition, fileId) groups superseded by visible replacecommits.

    Clustering / insert_overwrite writes NEW fileIds and records the
    replaced ones in the replacecommit metadata's
    ``partitionToReplaceFileIds``; without excluding them a snapshot
    returns BOTH generations (duplicate rows). Unparseable metadata is
    gated loudly — skipping would be silently wrong."""
    out: Set[Tuple[str, str]] = set()
    for inst in visible_replacecommits:
        p = os.path.join(meta_dir, f"{inst}.replacecommit")
        try:
            with open(p) as fh:
                raw = fh.read().strip()
            meta = json.loads(raw) if raw else {}
        except (OSError, json.JSONDecodeError) as exc:
            raise NotImplementedError(
                f"Hudi replacecommit {inst} metadata is unreadable "
                f"({exc}); cannot resolve replaced file groups without "
                "the Hudi runtime"
            )
        for part, fids in (meta.get("partitionToReplaceFileIds") or {}).items():
            rel = part if part else "."
            for fid in fids or []:
                out.add((rel, fid))
    return out


def _table_type(meta_dir: str) -> str:
    props = os.path.join(meta_dir, "hoodie.properties")
    if os.path.exists(props):
        with open(props) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("hoodie.table.type="):
                    return line.split("=", 1)[1].strip()
    return "COPY_ON_WRITE"


def _parse_base_file(name: str) -> Optional[Tuple[str, str]]:
    """(fileId, instantTime) from '<fileId>_<writeToken>_<instant>.parquet'."""
    if not name.endswith(".parquet") or name.startswith("."):
        return None
    stem = name[: -len(".parquet")]
    parts = stem.split("_")
    if len(parts) < 3:
        return None
    return "_".join(parts[:-2]), parts[-1]


def _visible_groups(
    path: str,
    meta_dir: str,
    as_of_instant: Optional[str],
) -> Dict[Tuple[str, str], Tuple[str, str]]:
    """Newest visible base file per (partition, fileId): the Hudi
    file-system view at ``as_of_instant`` (None = HEAD). Visible =
    instant is committed (active timeline, or below the archive
    boundary) AND ≤ as-of; file groups superseded by a visible
    replacecommit are excluded."""
    active = _completed_instants(meta_dir)
    boundary = min(active) if (active and _has_archive(meta_dir)) else None
    completed = set(active)

    def committed(instant: str) -> bool:
        return instant in completed or (
            boundary is not None and instant < boundary
        )

    def visible(instant: str) -> bool:
        return committed(instant) and (
            as_of_instant is None or instant <= str(as_of_instant)
        )

    chosen: Dict[Tuple[str, str], Tuple[str, str]] = {}
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != _META_DIR]
        rel = os.path.relpath(root, path)
        for name in files:
            parsed = _parse_base_file(name)
            if parsed is None:
                continue
            fid, instant = parsed
            if not visible(instant):
                continue  # uncommitted (inflight/failed) or after as-of
            key = (rel, fid)
            if key not in chosen or instant > chosen[key][0]:
                chosen[key] = (instant, os.path.join(root, name))

    replaced = _replaced_groups(
        meta_dir,
        [
            i for i in active
            if os.path.exists(os.path.join(meta_dir, f"{i}.replacecommit"))
            and (as_of_instant is None or i <= str(as_of_instant))
        ],
    )
    for key in replaced:
        chosen.pop(key, None)
    return chosen


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of_instant: Optional[str] = None,
) -> DataFrame:
    """Read a Hudi COW table directory — snapshot at the latest
    completed instant, or time travel to ``as_of_instant`` (the
    ``as.of.instant`` timestamp string, inclusive)."""
    meta_dir = os.path.join(path, _META_DIR)
    if not os.path.isdir(meta_dir):
        raise FileNotFoundError(f"No Hudi timeline at {meta_dir}")
    ttype = _table_type(meta_dir)
    if ttype != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"Hudi table type {ttype}: merge-on-read log files need the "
            "Hudi runtime; this jarless reader supports COPY_ON_WRITE"
        )
    active = _completed_instants(meta_dir)
    archived = _has_archive(meta_dir)
    if not active and not archived:
        raise ValueError(f"Hudi table at {path} has no completed commits")
    visible_active = {
        i for i in active
        if as_of_instant is None or i <= str(as_of_instant)
    }
    if not visible_active and not archived:
        raise ValueError(
            f"No Hudi commit at or before instant {as_of_instant!r}"
        )

    chosen = _visible_groups(path, meta_dir, as_of_instant)
    if not chosen:
        raise ValueError(f"Hudi table at {path} has no visible base files")
    files = sorted(f for _, f in chosen.values())
    return spark.read.option("mergeSchema", "true").parquet(*files)


def hudi_incremental(
    spark: SparkSession,
    path: str,
    begin_instant: str,
    end_instant: Optional[str] = None,
) -> DataFrame:
    """Incremental query: rows from file groups REWRITTEN by commits in
    ``(begin_instant, end_instant]`` — the reference's
    ``hoodie.datasource.query.type=incremental`` window
    (``core/hudi_engine.py:207-224``). COW granularity is the file
    group: a rewritten group's rows are all returned (the caller
    dedupes by record key downstream, as the commit store does)."""
    meta_dir = os.path.join(path, _META_DIR)
    active = _completed_instants(meta_dir)
    head = read_hudi(spark, path, as_of_instant=end_instant)
    if _has_archive(meta_dir) and active and str(begin_instant) < min(active):
        # the pull window reaches below the archive boundary — archived
        # commit metadata is gone from the active timeline, so the
        # window cannot be resolved commit-by-commit (Hudi itself
        # errors and tells the caller to fall back to a snapshot)
        raise ValueError(
            f"Hudi incremental pull from {begin_instant!r} starts before"
            f" the earliest active instant {min(active)!r} (older commits"
            " are archived); use a snapshot read instead"
        )
    wanted = {
        i for i in active
        if i > str(begin_instant)
        and (end_instant is None or i <= str(end_instant))
    }
    if not wanted:
        return head.limit(0)
    chosen = _visible_groups(path, meta_dir, end_instant)
    files = sorted(
        f for (instant, f) in chosen.values() if instant in wanted
    )
    if not files:
        return head.limit(0)
    return spark.read.option("mergeSchema", "true").parquet(*files)
