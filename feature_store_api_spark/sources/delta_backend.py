"""Delta-Lake-format physical backend for the commit store.

Closes the lakehouse-interop gap WITHOUT jars: commits land as a
protocol-conformant ``_delta_log`` (delta.io PROTOCOL.md — the same
public spec :mod:`.delta_reader` reads), so a feature group written
with ``time_travel_format="DELTA"`` is a real Delta table any Delta
client (delta-spark, DuckDB ``delta_scan``, delta-rs) can read:

* each CommitStore commit = one Delta commit of ``add`` actions; the
  commit-time column is a declared Delta PARTITION column, so external
  readers see (and can prune by) the same layout the store prunes by;
* Change Data Feed is ON (``delta.enableChangeDataFeed`` +
  ``minWriterVersion`` 4): upsert/insert commits are append-shaped, so
  CDF readers derive their inserts straight from the adds (delta-spark
  writes no ``_change_data`` for blind appends either); DELETE commits
  additionally emit ``cdc`` actions whose ``_change_data`` files carry
  ``_change_type='delete'`` — an external ``readChangeFeed`` sees real
  delete semantics instead of tombstone-row "inserts";
* vacuum = one Delta commit of ``remove`` actions + physical deletes
  (``dataChange: false`` — retention cleanup is not a logical change;
  its cdc history files stay behind for CDF readers, delta-spark's
  VACUUM-retention behavior);
* schema evolution appends an updated ``metaData`` (adding a column is
  metadata-only, exactly Delta's semantics — old files null-fill);
* the store's OWN commit metadata (counts, extra, retention) stays in
  its ``_commits.json`` sidecar, which Delta clients ignore.

The store remains merge-on-read (``self_merging = False``): an
external Delta reader sees the RAW commit rows including
``_commit_time``/``_op`` — the documented log-view contract (like
Hudi's MOR read-optimized vs log view) — while the store's snapshot
logic resolves newest-per-record-key on top.

Delta version allocation is PUT-IF-ABSENT (``os.link`` of the staged
commit onto the next free ``<v>.json``, re-list + retry on
``FileExistsError`` — the protocol's optimistic-concurrency rule), so
two concurrent writers can never clobber each other's actions; a
checkpoint parquet + ``_last_checkpoint`` is written every
``_CHECKPOINT_INTERVAL`` commits so log replay stays bounded. Full
cross-ENGINE conflict *detection* (e.g. concurrent delete/update
reconciliation) is out of scope offline."""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Dict, List, Optional, Sequence
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession

from .backend import CommitLogBackend

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

#: Delta truncates string min/max in stats to a bounded prefix
_STATS_STRING_PREFIX = 32


def _file_stats(path: str) -> Optional[str]:
    """Per-file ``add.stats`` JSON (PROTOCOL.md "Per-file Statistics":
    numRecords / minValues / maxValues / nullCount) from the written
    parquet's FOOTER — no extra data pass. External Delta clients use
    these for file skipping over our tables; ``None`` (omit the field,
    it's optional) when any row group lacks trustworthy stats.

    String maxima are prefix-truncated like Delta writers do: the last
    kept char is bumped so the truncated value stays an UPPER bound."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        mins: Dict[str, object] = {}
        maxs: Dict[str, object] = {}
        nulls: Dict[str, int] = {}
        skip: set = set()
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if "." in name:  # nested leaves: skip, keep it simple
                    continue
                st = col.statistics
                if st is None or st.null_count is None:
                    return None
                nulls[name] = nulls.get(name, 0) + st.null_count
                if not st.has_min_max:
                    skip.add(name)
                    continue
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    skip.add(name)
                    continue
                if isinstance(lo, str):
                    if len(hi) > _STATS_STRING_PREFIX:
                        cut = hi[:_STATS_STRING_PREFIX]
                        hi = cut[:-1] + chr(ord(cut[-1]) + 1)
                    lo = lo[:_STATS_STRING_PREFIX]
                elif hasattr(lo, "isoformat"):
                    lo, hi = lo.isoformat(), hi.isoformat()
                elif not isinstance(lo, (int, float, bool)):
                    skip.add(name)
                    continue
                if name not in mins or lo < mins[name]:
                    mins[name] = lo
                if name not in maxs or hi > maxs[name]:
                    maxs[name] = hi
        for name in skip:
            mins.pop(name, None)
            maxs.pop(name, None)
        return json.dumps({
            "numRecords": md.num_rows,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        })
    except Exception:
        return None

#: write a checkpoint every N Delta commits (the protocol's documented
#: default cadence); keeps external readers' log replay O(N)
_CHECKPOINT_INTERVAL = 10


class DeltaLogBackend(CommitLogBackend):
    """Commit-store physical I/O through a real Delta transaction log.

    Inherits the JSON sidecar + lockfile for the STORE's logical log;
    data/scan/vacuum speak the Delta protocol."""

    self_merging = False

    def __init__(self, location: str) -> None:
        super().__init__(location)
        self._delta_dir = os.path.join(location, "_delta_log")

    # -- delta log helpers ---------------------------------------------------
    def _versions(self) -> List[int]:
        if not os.path.isdir(self._delta_dir):
            return []
        out = []
        for n in os.listdir(self._delta_dir):
            if n.endswith(".json") and len(n) == 25 and n[:-5].isdigit():
                out.append(int(n[:-5]))
        return sorted(out)

    def _current_schema_json(self) -> Optional[str]:
        for v in reversed(self._versions()):
            with open(os.path.join(self._delta_dir, f"{v:020d}.json")) as fh:
                md = None
                for line in fh:
                    if line.strip():
                        a = json.loads(line)
                        if "metaData" in a:
                            md = a["metaData"]["schemaString"]
                if md:
                    return md
        return None

    def _write_delta_commit(self, actions: List[Dict]) -> int:
        """Append one Delta commit with PUT-IF-ABSENT version
        allocation (the protocol's concurrency rule): the content is
        staged to a tmp file, then ``os.link``-ed to the next free
        ``<v>.json`` — the hard link fails with ``FileExistsError``
        when a concurrent writer took that version, so we re-list and
        retry instead of clobbering its actions (a plain
        list-then-rename silently replaced the loser's commit)."""
        os.makedirs(self._delta_dir, exist_ok=True)
        import time as _time

        tmp = os.path.join(
            self._delta_dir, f".tmp-{uuid.uuid4().hex[:12]}.json"
        )
        with open(tmp, "w") as fh:
            fh.write(json.dumps(
                {"commitInfo": {"timestamp": int(_time.time() * 1000),
                                "engineInfo": "feature-store-api-spark"}}
            ) + "\n")
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        try:
            while True:
                versions = self._versions()
                v = (versions[-1] + 1) if versions else 0
                path = os.path.join(self._delta_dir, f"{v:020d}.json")
                try:
                    os.link(tmp, path)
                    break
                except FileExistsError:
                    continue  # lost the race for v: next version
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass
        self._maybe_checkpoint(v)
        return v

    def _checkpoint_safe(self, v: int) -> bool:
        """The classic checkpoint schema below models exactly the
        fields THIS backend writes: protocol {minReader,minWriter},
        metaData, add {path, partitionValues, size, modificationTime,
        dataChange, stats}. A table a DIFFERENT engine also wrote may
        carry protocol reader/writerFeatures, add deletionVectors or
        tags, or unexpired remove tombstones — serializing state
        through this schema would silently DROP them (a v3 checkpoint
        without readerFeatures fails later replay; lost tombstones
        break external VACUUM). Checkpointing is an optimization, so
        on any such field: skip it — replay stays correct from the
        JSON commits, just unbounded until a capable engine
        checkpoints."""
        for cv in range(0, v + 1):
            p = os.path.join(self._delta_dir, f"{cv:020d}.json")
            if not os.path.exists(p):
                continue  # below an existing checkpoint boundary
            with open(p) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    proto = a.get("protocol")
                    if proto is not None and (
                        proto.get("minReaderVersion", 1) >= 3
                        or proto.get("readerFeatures")
                        or proto.get("writerFeatures")
                    ):
                        return False
                    add = a.get("add")
                    if add is not None and (
                        add.get("deletionVector") or add.get("tags")
                    ):
                        return False
                    rem = a.get("remove")
                    if rem is not None and rem.get(
                        "deletionTimestamp", -1
                    ) != 0:
                        # ours are written pre-expired (ts 0); anything
                        # else is a live tombstone we don't model
                        return False
        return True

    def _maybe_checkpoint(self, v: int) -> None:
        """Every ``_CHECKPOINT_INTERVAL`` commits, compact the log into
        ``<v>.checkpoint.parquet`` + ``_last_checkpoint`` (delta.io
        PROTOCOL.md "Checkpoints"): readers fast-forward to the
        checkpoint and replay only the tail, so a long-lived FG's scan
        cost stays O(interval), not O(total commits). Rows = one
        ``protocol``, one ``metaData``, one ``add`` per live file
        (our removes carry deletionTimestamp 0 = expired tombstones,
        so none are retained; ``cdc`` actions are never checkpointed,
        per spec). Skipped entirely when the replayed state carries
        fields the checkpoint schema doesn't model
        (:meth:`_checkpoint_safe`)."""
        if v <= 0 or v % _CHECKPOINT_INTERVAL != 0:
            return
        if not self._checkpoint_safe(v):
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .delta_reader import _snapshot_state

        state = _snapshot_state(self.location, v)
        if state.protocol is None or state.metadata is None:
            return
        pv_t = pa.map_(pa.string(), pa.string())
        proto_t = pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
        ])
        md = state.metadata

        def _items(x):
            # replay may hand back a dict (JSON commits) or a list of
            # pairs (pyarrow renders checkpoint MAP columns as tuples)
            return list(x.items()) if isinstance(x, dict) else list(x or [])

        md_row = {
            "id": md.get("id"),
            "name": md.get("name"),
            "description": md.get("description"),
            "format": {
                "provider": (md.get("format") or {}).get("provider", "parquet"),
                "options": _items((md.get("format") or {}).get("options")),
            },
            "schemaString": md.get("schemaString"),
            "partitionColumns": list(md.get("partitionColumns") or []),
            "configuration": _items(md.get("configuration")),
            "createdTime": md.get("createdTime") or 0,
        }
        md_t = pa.struct([
            ("id", pa.string()),
            ("name", pa.string()),
            ("description", pa.string()),
            ("format", pa.struct([
                ("provider", pa.string()), ("options", pv_t)])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pv_t),
            ("createdTime", pa.int64()),
        ])
        add_rows = [
            {
                "path": rel,
                "partitionValues": list(
                    (add.get("partitionValues") or {}).items()
                ),
                "size": int(add.get("size") or 0),
                "modificationTime": int(add.get("modificationTime") or 0),
                "dataChange": False,
                "stats": add.get("stats"),
            }
            for rel, add in sorted(state.files.items())
        ]
        add_t = pa.struct([
            ("path", pa.string()),
            ("partitionValues", pv_t),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ])
        n = 2 + len(add_rows)
        tbl = pa.table({
            "protocol": pa.array(
                [state.protocol, None] + [None] * len(add_rows), proto_t),
            "metaData": pa.array(
                [None, md_row] + [None] * len(add_rows), md_t),
            "add": pa.array([None, None] + add_rows, add_t),
        })
        cp = os.path.join(self._delta_dir, f"{v:020d}.checkpoint.parquet")
        tmp = cp + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, cp)
        lc = os.path.join(self._delta_dir, "_last_checkpoint")
        tmp = lc + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": v, "size": n}, fh)
        os.replace(tmp, lc)

    def _metadata_actions(self, df: DataFrame, partition_cols) -> List[Dict]:
        """protocol+metaData on the first commit; an updated metaData
        when the frame carries columns the table schema lacks."""
        current = self._current_schema_json()
        new_fields = [json.loads(df.schema.json())["fields"][i]
                      for i in range(len(df.schema.fields))]
        # CDF on from birth: minWriterVersion 4 is the protocol level
        # that introduces changeDataFeed (readers are unaffected)
        config = {"delta.enableChangeDataFeed": "true"}
        if current is None:
            schema = {"type": "struct", "fields": new_fields}
            return [
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
                {"metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": list(partition_cols),
                    "configuration": config,
                    "createdTime": 0,
                }},
            ]
        cur = json.loads(current)
        have = {f["name"] for f in cur["fields"]}
        added = [f for f in new_fields if f["name"] not in have]
        if not added:
            return []
        cur["fields"] = cur["fields"] + added
        return [{"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(cur),
            "partitionColumns": list(partition_cols),
            "configuration": config,
            "createdTime": 0,
        }}]

    # -- data ------------------------------------------------------------------
    def append_commit(self, df: DataFrame, partition_cols: Sequence[str]) -> None:
        partition_cols = list(partition_cols)
        meta = self._metadata_actions(df, partition_cols)
        stage = os.path.join(self.location, f"_staging_{uuid.uuid4().hex[:8]}")
        try:
            (
                df.write.partitionBy(partition_cols)
                .mode("overwrite")
                .parquet(stage)
            )
            adds = []
            moved = []  # (dst, pv) for the cdc pass
            for root, _dirs, files in os.walk(stage):
                for name in files:
                    if not name.endswith(".parquet"):
                        continue
                    rel_dir = os.path.relpath(root, stage)
                    pv: Dict[str, Optional[str]] = {}
                    if rel_dir != ".":
                        for comp in rel_dir.split(os.sep):
                            c, _, raw = comp.partition("=")
                            pv[c] = None if raw == _HIVE_NULL else unquote(raw)
                    src = os.path.join(root, name)
                    rel = (
                        name if rel_dir == "." else os.path.join(rel_dir, name)
                    )
                    dst = os.path.join(self.location, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.replace(src, dst)
                    add = {
                        "path": rel.replace(os.sep, "/"),
                        "partitionValues": pv,
                        "size": os.path.getsize(dst),
                        "modificationTime": int(os.path.getmtime(dst) * 1000),
                        "dataChange": True,
                    }
                    stats = _file_stats(dst)
                    if stats is not None:
                        add["stats"] = stats
                    adds.append({"add": add})
                    moved.append((dst, pv))
            cdc = self._cdc_actions(moved)
            self._write_delta_commit(meta + adds + cdc)
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    def _cdc_actions(self, moved) -> List[Dict]:
        """``cdc`` actions for a commit that carries DELETE rows.

        Upsert/insert commits are pure appends — CDF readers derive
        their inserts from the adds, so no ``_change_data`` is written
        (same as delta-spark on blind appends). A delete commit's rows
        are tombstones in the store's merge-on-read contract; the cdc
        file restates them with ``_change_type='delete'`` so an
        external ``readChangeFeed`` sees real deletes. Cost: one
        driver-side pyarrow copy of JUST the delete-commit's files
        (deletes are a tiny fraction of traffic; no Spark job)."""
        from .commit_store import OP_COL

        try:
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq
        except Exception:
            return []
        out: List[Dict] = []
        cdc_dir = os.path.join(self.location, "_change_data")
        for dst, pv in moved:
            try:
                pf = pq.ParquetFile(dst)
                if OP_COL not in pf.schema_arrow.names:
                    continue
                tbl = pf.read()
            except Exception:
                continue
            ops = tbl[OP_COL]
            mask = pc.equal(ops, "delete")
            if not pc.any(mask).as_py():
                continue
            ct = pc.if_else(
                mask, pa.scalar("delete"), pa.scalar("insert")
            )
            tbl = tbl.append_column("_change_type", ct)
            os.makedirs(cdc_dir, exist_ok=True)
            name = f"cdc-{uuid.uuid4().hex[:12]}.parquet"
            full = os.path.join(cdc_dir, name)
            pq.write_table(tbl, full)
            out.append({"cdc": {
                "path": f"_change_data/{name}",
                "partitionValues": pv,
                "size": os.path.getsize(full),
                "dataChange": False,
            }})
        return out

    def scan(self, spark: SparkSession) -> Optional[DataFrame]:
        if not self._versions():
            return None
        from .delta_reader import read_delta

        return read_delta(spark, self.location)

    def drop_commit(self, commit_time: int) -> bool:
        from .commit_store import COMMIT_COL
        from .delta_reader import _snapshot_state

        versions = self._versions()
        if not versions:
            return False
        state = _snapshot_state(self.location, versions[-1])
        doomed = [
            rel for rel, add in state.files.items()
            if (add.get("partitionValues") or {}).get(COMMIT_COL)
            == str(commit_time)
        ]
        if not doomed:
            return False
        self._write_delta_commit([
            {"remove": {"path": rel, "dataChange": False,
                        "deletionTimestamp": 0}}
            for rel in doomed
        ])
        for rel in doomed:
            full = os.path.join(self.location, rel)
            try:
                os.remove(full)
                parent = os.path.dirname(full)
                while parent != self.location and not os.listdir(parent):
                    os.rmdir(parent)
                    parent = os.path.dirname(parent)
            except OSError:
                pass
        return True
