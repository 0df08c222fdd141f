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

Scale shape: timeline listing and file-group resolution are driver-side
metadata work (bounded by commits × file groups, exactly what a real
Hudi client's file-system view does); the data read is one pruned
parquet scan over the selected base files. MERGE_ON_READ tables (avro
log files) are gated with a clear error — resolving log blocks without
the Hudi jars would be silently wrong.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

_META_DIR = ".hoodie"


def _completed_instants(meta_dir: str) -> List[str]:
    """Sorted completed commit instants (the '<ts>.commit' files)."""
    out = []
    for name in os.listdir(meta_dir):
        if name.endswith(".commit"):
            out.append(name[: -len(".commit")])
        elif name.endswith(".replacecommit"):
            out.append(name[: -len(".replacecommit")])
    return sorted(out)


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
    completed = set(_completed_instants(meta_dir))
    if not completed:
        raise ValueError(f"Hudi table at {path} has no completed commits")
    visible = {
        i for i in completed
        if as_of_instant is None or i <= str(as_of_instant)
    }
    if not visible:
        raise ValueError(
            f"No Hudi commit at or before instant {as_of_instant!r}"
        )

    # newest visible base file per (partition, fileId)
    chosen: Dict[Tuple[str, str], Tuple[str, str]] = {}
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != _META_DIR]
        rel = os.path.relpath(root, path)
        for name in files:
            parsed = _parse_base_file(name)
            if parsed is None:
                continue
            fid, instant = parsed
            if instant not in visible:
                continue  # uncommitted (inflight/failed) or after as-of
            key = (rel, fid)
            if key not in chosen or instant > chosen[key][0]:
                chosen[key] = (instant, os.path.join(root, name))
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
    completed = set(_completed_instants(meta_dir))
    head = read_hudi(spark, path, as_of_instant=end_instant)
    wanted = {
        i for i in completed
        if i > str(begin_instant)
        and (end_instant is None or i <= str(end_instant))
    }
    if not wanted:
        return head.limit(0)
    chosen: Dict[Tuple[str, str], Tuple[str, str]] = {}
    visible = {
        i for i in completed
        if end_instant is None or i <= str(end_instant)
    }
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != _META_DIR]
        rel = os.path.relpath(root, path)
        for name in files:
            parsed = _parse_base_file(name)
            if parsed is None or parsed[1] not in visible:
                continue
            fid, instant = parsed
            key = (rel, fid)
            if key not in chosen or instant > chosen[key][0]:
                chosen[key] = (instant, os.path.join(root, name))
    files = sorted(
        f for (instant, f) in chosen.values() if instant in wanted
    )
    if not files:
        return head.limit(0)
    return spark.read.option("mergeSchema", "true").parquet(*files)
