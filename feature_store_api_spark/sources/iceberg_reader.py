"""Jarless Apache Iceberg TABLE READER: snapshot + time travel.

Extension beyond the reference's Hudi/Delta interop (the reference's
time-travel formats are HUDI and DELTA only): training-data pipelines
routinely ingest warehouse tables that live in Iceberg, so the engine
reads them directly — the READ side of the public Iceberg table spec
(iceberg.apache.org/spec/, format versions 1 and 2), no runtime jars:

* ``metadata/v<N>.metadata.json`` (+ ``version-hint.text``) — table
  metadata: schemas, snapshots (``snapshot-id``, ``timestamp-ms``,
  ``manifest-list``), ``current-snapshot-id``;
* the snapshot's MANIFEST LIST — an Avro container of
  ``manifest_file`` entries (``manifest_path``, ``content``: 0 data /
  1 deletes, ``sequence_number``);
* each MANIFEST — an Avro container of ``manifest_entry`` rows
  (``status`` 0 existing / 1 added / 2 deleted, ``data_file`` with
  ``content`` 0 data / 1 position deletes / 2 equality deletes,
  ``file_path``, ``file_format``); both decode with the repo's own
  jarless Avro codec (null/deflate codecs — Iceberg's defaults);
* v2 row-level deletes: POSITION delete files (parquet rows of
  ``file_path, pos``) strip rows via a ``_metadata.file_path`` +
  ``_metadata.row_index`` anti-join — the same executor-side pattern
  as the Delta deletion-vector strip — and EQUALITY delete files
  anti-join on their ``equality_ids`` columns, sequence-number aware
  (a delete applies only to rows whose data file has a strictly
  smaller data sequence number, so later re-inserts of the same key
  survive, per the spec's "Scan Planning" rules).

Scale shape: metadata/manifest replay is driver-side (exactly how real
Iceberg clients plan scans — manifests are metadata, bounded by
snapshot expiry), and the data read is ONE flat parquet relation over
the live files; position deletes anti-join as ONE relation and
equality deletes as ONE anti-join per distinct ``equality_ids``
signature, each broadcast below a row-count crossover and shuffled
above it. Identity-partition source columns are stored IN Iceberg
data files, so no partition-value reattachment is needed. Renamed
columns resolve through the files' ``PARQUET:field_id`` footer
annotations (one flat relation per distinct rename map).

Out of scope (loud gates, not wrong rows): renamed tables whose files
lack field-id annotations (parquet footers / avro field-id / ORC
iceberg.id attributes), non-parquet DELETE files, and snapshots whose
schema uses types Spark's parquet reader cannot widen. Avro data files
decode executor-side through the repo's streaming OCF codec; ORC data
files read through Spark's native ORC reader, falling back to an
executor-side stripe-wise pyarrow.orc scan when position deletes or
renames apply (synthesized row ordinals + iceberg.id mapping).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs_path(uri: str, table_path: str) -> str:
    """Manifest/data-file location -> local filesystem path. The spec
    stores absolute URIs (``file:///...``); relative paths (some
    hand-rolled writers) resolve against the table root."""
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        p = unquote(parsed.path) if parsed.scheme == "file" else uri
        if not os.path.isabs(p):
            p = os.path.join(table_path, p)
        return p
    raise NotImplementedError(
        f"Iceberg file location scheme {parsed.scheme!r} not readable "
        "offline (local file paths only)"
    )


def _read_table_metadata(path: str) -> Dict:
    meta_dir = os.path.join(path, "metadata")
    if not os.path.isdir(meta_dir):
        raise FileNotFoundError(f"No Iceberg metadata dir at {meta_dir}")
    hint = os.path.join(meta_dir, "version-hint.text")
    candidate: Optional[str] = None
    if os.path.exists(hint):
        with open(hint) as fh:
            v = fh.read().strip()
        for name in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            if os.path.exists(os.path.join(meta_dir, name)):
                candidate = name
                break
    if candidate is None:
        # newest metadata file wins: v<N>.metadata.json (HadoopCatalog)
        # or <uuid>/<seq>-uuid.metadata.json (object-store layouts) —
        # sort numerically where the prefix is numeric, else by mtime
        cands = [n for n in os.listdir(meta_dir)
                 if n.endswith(".metadata.json")]
        if not cands:
            raise FileNotFoundError(
                f"No *.metadata.json under {meta_dir}"
            )

        def order(n: str):
            stem = n.split(".", 1)[0].lstrip("v").split("-", 1)[0]
            num = int(stem) if stem.isdigit() else -1
            return (num, os.path.getmtime(os.path.join(meta_dir, n)))

        candidate = max(cands, key=order)
    with open(os.path.join(meta_dir, candidate)) as fh:
        meta = json.load(fh)
    fv = meta.get("format-version", 1)
    if fv not in (1, 2):
        raise NotImplementedError(
            f"Iceberg format-version {fv} (supported: 1, 2)"
        )
    return meta


def resolve_iceberg_snapshot(
    meta: Dict,
    snapshot_id: Optional[int] = None,
    timestamp_ms: Optional[int] = None,
    ref: Optional[str] = None,
) -> Dict:
    """Pick the snapshot: explicit id, a named ``ref`` (branch or tag
    from the metadata's ``refs`` map, per the spec's snapshot
    references section), else latest at-or-before the timestamp (epoch
    millis), else the current snapshot."""
    snaps = list(meta.get("snapshots") or [])
    if not snaps:
        raise ValueError("Iceberg table has no snapshots")
    if ref is not None:
        refs = meta.get("refs") or {}
        if ref not in refs:
            raise ValueError(
                f"Iceberg ref {ref!r} not found (known: {sorted(refs)})"
            )
        snapshot_id = int(refs[ref]["snapshot-id"])
    if snapshot_id is not None:
        for s in snaps:
            if int(s["snapshot-id"]) == int(snapshot_id):
                return s
        raise ValueError(f"Iceberg snapshot {snapshot_id} not found")
    if timestamp_ms is not None:
        eligible = [
            s for s in snaps if int(s["timestamp-ms"]) <= int(timestamp_ms)
        ]
        if not eligible:
            raise ValueError(
                f"No Iceberg snapshot at or before {timestamp_ms}"
            )
        return max(eligible, key=lambda s: int(s["timestamp-ms"]))
    cur = meta.get("current-snapshot-id")
    if cur is None or int(cur) == -1:
        return max(snaps, key=lambda s: int(s["timestamp-ms"]))
    for s in snaps:
        if int(s["snapshot-id"]) == int(cur):
            return s
    raise ValueError(f"current-snapshot-id {cur} not in snapshots")


def _manifest_entries(path: str, table_path: str) -> List[dict]:
    from .avro_container import read_ocf_bytes

    with open(path, "rb") as fh:
        _schema, rows = read_ocf_bytes(fh.read())
    return rows


def _snapshot_files(
    meta: Dict, snap: Dict, table_path: str,
    pruner=None, stats: Optional[Dict] = None,
) -> Tuple[List[dict], List[dict], List[dict]]:
    """Plan the snapshot's file set: ``(data, pos_deletes, eq_deletes)``
    — each a list of dicts ``{path, seq, ...}``. Sequence-number
    inheritance per spec: a null entry sequence number inherits the
    manifest-list entry's ``sequence_number`` (v1 tables: 0).

    ``pruner`` (a :class:`~.iceberg_prune.ScanPruner`) drops DATA
    manifests via the manifest list's partition field summaries and
    DATA files via each entry's partition tuple + column bounds —
    the spec's scan-planning pruning, applied before any Spark relation
    exists. DELETE manifests/files prune on PARTITION operands only
    (a delete applies within its partition, so one whose partition
    can't intersect the kept data files is dead weight; their column
    bounds describe the deleted rows and never prune — see
    ``ScanPruner.keep_entry(partition_only=)``)."""
    mf_list_loc = snap.get("manifest-list")
    if mf_list_loc:
        manifests = _manifest_entries(
            _fs_path(mf_list_loc, table_path), table_path
        )
    else:
        # ancient v1 snapshots embed the manifest paths directly
        manifests = [
            {"manifest_path": p, "content": 0, "sequence_number": 0}
            for p in (snap.get("manifests") or [])
        ]
    if stats is not None:
        stats.setdefault("manifests_total", len(manifests))
        stats.setdefault("manifests_skipped", 0)
        stats.setdefault("data_files_pruned", 0)
        stats.setdefault("delete_files_pruned", 0)
    data: List[dict] = []
    pos_del: List[dict] = []
    eq_del: List[dict] = []
    kept: List[dict] = []
    for mf in manifests:
        if (
            pruner is not None
            and not pruner.keep_manifest(mf, mf.get("partition_spec_id"))
        ):
            # whole manifest out of range: never even opened
            if stats is not None:
                stats["manifests_skipped"] += 1
            continue
        kept.append(mf)
    # many-manifest tables: open/decode manifests concurrently — the
    # file read and the deflate decompress both release the GIL, so
    # threads overlap the I/O that dominates planning on 10k-manifest
    # tables (iceberg-java plans with a worker pool the same way).
    # ordered map keeps the plan deterministic.
    def _load(mf: dict) -> List[dict]:
        return _manifest_entries(
            _fs_path(mf["manifest_path"], table_path), table_path
        )

    if len(kept) > 8:
        from concurrent.futures import ThreadPoolExecutor
        from contextlib import ExitStack

        stack = ExitStack()
        ex = stack.enter_context(
            ThreadPoolExecutor(max_workers=min(16, len(kept)))
        )
        # LAZY map: each manifest's entry list is droppable as soon as
        # the consuming loop moves on — materializing all of them at
        # once would hold every decoded entry (pruned and deleted ones
        # included) live on the driver for the whole walk
        entry_lists = ex.map(_load, kept)
    else:
        stack = None
        entry_lists = (_load(mf) for mf in kept)
    try:
        mf_iter = zip(kept, entry_lists)
        for mf, entries in mf_iter:
            mf_seq = int(mf.get("sequence_number") or 0)
            mf_spec = mf.get("partition_spec_id")
            for e in entries:
                if int(e.get("status") or 0) == 2:
                    continue  # DELETED entries are history, not state
                df_ = e.get("data_file") or {}
                if pruner is not None and not pruner.keep_entry(
                    df_, mf_spec,
                    partition_only=int(df_.get("content") or 0) != 0,
                ):
                    if stats is not None:
                        key = (
                            "data_files_pruned"
                            if int(df_.get("content") or 0) == 0
                            else "delete_files_pruned"
                        )
                        stats[key] = stats.get(key, 0) + 1
                    continue
                seq = e.get("sequence_number")
                seq = mf_seq if seq is None else int(seq)
                fmt = (df_.get("file_format") or "PARQUET").upper()
                content = int(df_.get("content") or 0)
                if fmt not in ("PARQUET", "AVRO", "ORC") or (
                    fmt != "PARQUET" and content != 0
                ):
                    raise NotImplementedError(
                        f"Iceberg {fmt} files are not supported by this "
                        "jarless reader (parquet everywhere; avro/orc for "
                        "DATA files)"
                    )
                rec = {
                    "path": _fs_path(df_["file_path"], table_path),
                    "uri": df_["file_path"],
                    "seq": seq,
                    "fmt": fmt,
                    "rows": int(df_.get("record_count") or 0),
                    "equality_ids": list(df_.get("equality_ids") or []),
                }
                if content == 0:
                    data.append(rec)
                elif content == 1:
                    pos_del.append(rec)
                elif content == 2:
                    eq_del.append(rec)
                else:
                    raise NotImplementedError(
                        f"Iceberg data_file content {content}"
                    )
    finally:
        if stack is not None:
            stack.close()
    return data, pos_del, eq_del


def _current_field_names(meta: Dict) -> Dict[int, str]:
    """field id -> name for the CURRENT schema (equality_ids resolve
    through ids, per spec)."""
    schemas = meta.get("schemas")
    schema = None
    if schemas:
        cur = meta.get("current-schema-id")
        for s in schemas:
            if s.get("schema-id") == cur:
                schema = s
                break
        if schema is None:
            schema = schemas[-1]
    else:
        schema = meta.get("schema") or {}
    return {
        int(f["id"]): f["name"] for f in (schema.get("fields") or [])
    }


_PRIM_TYPES = {
    "boolean": "boolean", "int": "int", "long": "bigint",
    "float": "float", "double": "double", "date": "date",
    "time": "bigint", "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp", "string": "string", "uuid": "string",
    "binary": "binary",
}


def _spark_type_of(t):
    """Iceberg JSON type -> Spark type, recursively (list/map/struct
    per iceberg.apache.org/spec/#schemas)."""
    from pyspark.sql import types as T

    if isinstance(t, str):
        if t.startswith("decimal"):
            return T._parse_datatype_string(t)
        if t.startswith("fixed"):
            return T.BinaryType()
        return T._parse_datatype_string(_PRIM_TYPES.get(t, "string"))
    kind = t.get("type")
    if kind == "list":
        return T.ArrayType(
            _spark_type_of(t["element"]),
            not t.get("element-required", False),
        )
    if kind == "map":
        return T.MapType(
            _spark_type_of(t["key"]),
            _spark_type_of(t["value"]),
            not t.get("value-required", False),
        )
    if kind == "struct":
        return T.StructType([
            T.StructField(
                f["name"], _spark_type_of(f["type"]),
                not f.get("required", False),
            )
            for f in t.get("fields") or []
        ])
    return T.StringType()


def _spark_schema_of(meta: Dict):
    """CURRENT Iceberg schema -> Spark schema (nested types included;
    used for the empty-snapshot result and as the explicit read schema
    on hive-partition-discovery scans)."""
    from pyspark.sql import types as T

    schemas = meta.get("schemas") or [meta.get("schema") or {}]
    cur = meta.get("current-schema-id")
    schema = next(
        (s for s in schemas if s.get("schema-id") == cur), schemas[-1]
    )
    return T.StructType([
        T.StructField(
            f["name"], _spark_type_of(f["type"]),
            not f.get("required", False),
        )
        for f in schema.get("fields") or []
    ])


def _scan_path_col():
    """Decoded filesystem path of the scanned file (Spark URI-encodes
    ``_metadata.file_path``; protect literal '+' from FORM decoding —
    same rule as the Delta DV strip)."""
    return F.url_decode(
        F.regexp_replace(
            F.regexp_replace(
                F.col("_metadata.file_path"), r"^file:(//)?", ""
            ),
            r"\+", "%2B",
        )
    )


def _delete_path_col(col, table_path: str):
    """Position-delete files store the data file's location URI — the
    SAME decode as the scan side (prefix strip + url_decode with '+'
    protection) must apply, and relative locations resolve against the
    table root, or percent-encodable characters (spaces) and relative
    entries silently miss the anti-join and deleted rows reappear."""
    p = F.url_decode(
        F.regexp_replace(
            F.regexp_replace(col, r"^file:(//)?", ""), r"\+", "%2B"
        )
    )
    return F.when(p.startswith("/"), p).otherwise(
        F.concat(F.lit(table_path.rstrip("/") + "/"), p)
    )


#: up to this many total delete rows (summed manifest record_count)
#: the delete side broadcasts — the common case: row-level deletes
#: exist to avoid file rewrites for point deletes; past it the delete
#: relation joins by shuffle so a massive delete pile can never blow
#: the broadcast limit (mirrors the Delta DV decode's crossover)
_DELETE_BROADCAST_ROWS = 2_000_000


def _maybe_broadcast(rel: DataFrame, total_rows: int) -> DataFrame:
    return F.broadcast(rel) if total_rows <= _DELETE_BROADCAST_ROWS else rel


def _parquet_field_ids(path: str) -> Optional[Dict[int, str]]:
    """``field id -> physical column name`` from the parquet footer
    (the ``PARQUET:field_id`` annotation real Iceberg writers stamp on
    every column), or None when any column lacks one."""
    import pyarrow.parquet as pq

    out: Dict[int, str] = {}
    for f in pq.ParquetFile(path).schema_arrow:
        fid = (f.metadata or {}).get(b"PARQUET:field_id")
        if fid is None:
            return None
        out[int(fid)] = f.name
    return out


def _spec_frame(spark: SparkSession, paths: List[str], col: str):
    """Single-column spec frame of file paths, sliced for executor-side
    decode fan-out — the shared shape of every mapInPandas scan here."""
    n_slices = min(
        len(paths), max(8, spark.sparkContext.defaultParallelism * 2)
    )
    return spark.createDataFrame(
        [(p,) for p in paths], f"{col} string"
    ).repartition(n_slices)


def _field_ids_distributed(
    spark: SparkSession, paths: List[str]
) -> "List[Optional[Dict[int, str]]]":
    """Per-file ``field id -> physical name`` maps, footers read
    EXECUTOR-side: one spec frame of paths -> ``mapInPandas`` returns
    (path, json map) rows. Scan PLANNING for a renamed table is
    therefore a distributed metadata job, not O(files) driver I/O — a
    100k-file table planned on a 1000-executor cluster reads 100k
    footers in parallel. The collected result is metadata-sized (one
    short json string per file; the distinct-map count — what the plan
    branches on — is ~#schema versions, usually 2)."""
    import pandas as pd

    def resolve(batches):
        for pdf in batches:
            maps = []
            for p in pdf["__f_path"]:
                m = _parquet_field_ids(p)
                maps.append(
                    None if m is None
                    else json.dumps(m, sort_keys=True)
                )
            yield pd.DataFrame(
                {"__f_path": pdf["__f_path"], "__f_ids": maps}
            )

    spec = _spec_frame(spark, paths, "__f_path")
    got = {
        r["__f_path"]: r["__f_ids"]
        for r in spec.mapInPandas(
            resolve, schema="__f_path string, __f_ids string"
        ).collect()
    }
    return [
        None if got.get(p) is None
        else {int(k): v for k, v in json.loads(got[p]).items()}
        for p in paths
    ]


def _scan_renamed(
    spark: SparkSession,
    meta: Dict,
    data: List[dict],
    need_meta: bool,
    missing: List[str],
) -> DataFrame:
    """Field-id mapping scan for tables with RENAMED columns: files
    written before a rename keep the old parquet column names, but
    their footers carry the spec's ``PARQUET:field_id`` annotations —
    resolve each physical column to the CURRENT schema name by id,
    group files by identical rename maps (one flat relation per map,
    usually 2: pre- and post-rename), alias, and union by name. A
    column whose id left the current schema (dropped) is pruned. Files
    without field ids keep the loud gate — there is nothing to map by."""
    id_names = _current_field_names(meta)
    paths = sorted(d["path"] for d in data)
    fid_maps = _field_ids_distributed(spark, paths)
    groups: Dict[Tuple[Tuple[str, str], ...], List[str]] = {}
    for p, m in zip(paths, fid_maps):
        if m is None:
            raise NotImplementedError(
                f"Iceberg current schema columns {missing} not present "
                f"in the data files by name and {p} carries no parquet "
                "field ids — a renamed table is only readable when its "
                "files were written with field-id annotations"
            )
        renames = tuple(sorted(
            (phys, id_names[fid]) for fid, phys in m.items()
            if fid in id_names
        ))
        groups.setdefault(renames, []).append(p)
    parts: List[DataFrame] = []
    for renames, files in sorted(groups.items()):
        rel = spark.read.option("mergeSchema", "true").parquet(*files)
        if need_meta:
            rel = rel.withColumn("__i_path", _scan_path_col()).withColumn(
                "__i_pos", F.col("_metadata.row_index")
            )
        mapping = dict(renames)
        rel = rel.select(*(
            [F.col(c).alias(mapping[c]) for c in rel.columns
             if c in mapping]
            + [F.col(c) for c in ("__i_path", "__i_pos")
               if c in rel.columns]
        ))
        parts.append(rel)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def iceberg_incremental(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: Optional[int] = None,
    filters=None,
) -> DataFrame:
    """Incremental APPEND scan: rows added by snapshots in
    ``(from_snapshot_id, to_snapshot_id]`` — iceberg-spark's
    ``start-snapshot-id``/``end-snapshot-id`` read. The window is
    resolved by walking ``parent-snapshot-id`` lineage from the end
    snapshot; per snapshot, the files it ADDED are the status-1 entries
    of the manifests it added (``added_snapshot_id`` /
    ``snapshot_id`` inheritance, per spec). Snapshots whose summary
    operation is not ``append`` gate loudly — replacing/overwriting
    commits have no row-level "added" answer without diffing, exactly
    why iceberg-spark refuses them too.

    ``filters`` prunes exactly like :func:`read_iceberg`: manifest
    partition summaries, entry partition tuples + column bounds, then
    the exact residual row predicate on the result."""
    from .iceberg_prune import (
        ScanPruner,
        filters_to_column,
        normalize_filters,
        remap_tree,
    )

    meta = _read_table_metadata(path)
    tree = remap_tree(
        normalize_filters(filters), _current_field_names(meta).values()
    )
    pruner = ScanPruner(meta, tree) if tree is not None else None
    snaps = {int(s["snapshot-id"]): s for s in meta.get("snapshots") or []}
    end = resolve_iceberg_snapshot(meta, to_snapshot_id, None)
    if int(from_snapshot_id) not in snaps:
        raise ValueError(
            f"Iceberg from-snapshot {from_snapshot_id} not found"
        )
    window: List[Dict] = []
    cur: Optional[Dict] = end
    while cur is not None and int(cur["snapshot-id"]) != int(
        from_snapshot_id
    ):
        window.append(cur)
        pid = cur.get("parent-snapshot-id")
        cur = snaps.get(int(pid)) if pid is not None else None
    if cur is None:
        raise ValueError(
            f"Iceberg snapshot {from_snapshot_id} is not an ancestor "
            f"of {end['snapshot-id']}: cannot resolve the window"
        )
    paths: List[str] = []
    for s in window:
        sid = int(s["snapshot-id"])
        op = (s.get("summary") or {}).get("operation", "append")
        if op != "append":
            raise NotImplementedError(
                f"Iceberg incremental read across a {op!r} snapshot "
                f"({sid}) is not supported (appends only — same rule "
                "as iceberg-spark's incremental scan)"
            )
        manifests = _manifest_entries(
            _fs_path(s["manifest-list"], path), path
        )
        for mf in manifests:
            if int(mf.get("content") or 0) != 0:
                continue
            added_by = mf.get("added_snapshot_id")
            if added_by is not None and int(added_by) != sid:
                continue  # carried over from an earlier snapshot
            if pruner is not None and not pruner.keep_manifest(
                mf, mf.get("partition_spec_id")
            ):
                continue
            for e in _manifest_entries(
                _fs_path(mf["manifest_path"], path), path
            ):
                if int(e.get("status") or 0) != 1:
                    continue
                esid = e.get("snapshot_id")
                if esid is not None and int(esid) != sid:
                    continue
                df_ = e.get("data_file") or {}
                if int(df_.get("content") or 0) != 0:
                    continue
                if pruner is not None and not pruner.keep_entry(
                    df_, mf.get("partition_spec_id")
                ):
                    continue
                fmt = (df_.get("file_format") or "PARQUET").upper()
                if fmt != "PARQUET":
                    raise NotImplementedError(
                        f"Iceberg incremental scan over {fmt} data "
                        "files is not supported (parquet only)"
                    )
                paths.append(_fs_path(df_["file_path"], path))
    if not paths:
        return spark.createDataFrame([], _spark_schema_of(meta))
    inc = spark.read.option("mergeSchema", "true").parquet(
        *sorted(set(paths))
    )
    if tree is not None:
        from .iceberg_prune import bind_residual

        residual = bind_residual(
            tree, inc.columns, f"iceberg table {path}"
        )
        if residual is not None:
            inc = inc.where(filters_to_column(residual))
    return inc


def _scan_avro_data(
    spark: SparkSession,
    meta: Dict,
    paths: List[str],
    need_meta: bool,
) -> DataFrame:
    """Avro DATA files (``write.format.default=avro`` tables) decode
    EXECUTOR-side through the repo's own OCF codec — the same
    distributed pattern as the Hudi log decode: one spec frame of file
    paths, ``mapInPandas`` opens each file in a task. When deletes
    apply, every row carries ``__i_path`` + ``__i_pos`` (its ordinal in
    the file — Iceberg position deletes address rows of ANY format by
    ordinal). Columns resolve by the writer schema's ``field-id``
    annotations when present (iceberg.apache.org/spec — Avro schemas
    carry per-field ids, so files written BEFORE a column rename still
    project correctly), by name otherwise."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = _spark_schema_of(meta)
    names = [f.name for f in schema.fields]
    id_names = _current_field_names(meta)
    out_schema = schema
    if need_meta:
        out_schema = T.StructType(list(schema.fields) + [
            T.StructField("__i_path", T.StringType(), False),
            T.StructField("__i_pos", T.LongType(), False),
        ])

    def decode(batches):
        from .avro_container import iter_ocf

        flush_rows = 65_536  # Arrow batch target; memory stays bounded
        for pdf in batches:
            for p in pdf["__a_path"]:
                with open(p, "rb") as fh:
                    # STREAMING block read: task memory is one avro
                    # block + the pending batch, never the whole file
                    sch, blocks = iter_ocf(fh)
                    # physical name per CURRENT column, resolved
                    # PER-FIELD: a writer field carrying a field-id
                    # binds by id (AUTHORITATIVE — a current column
                    # whose id is absent among the annotated fields is
                    # a schema-evolution add, read as null; never fall
                    # back by name, or a reused old name would mis-bind
                    # another column's data). Only an UNANNOTATED
                    # writer field may bind by name, so a partially
                    # annotated file resolves each column the safest
                    # way its metadata allows instead of silently
                    # dropping to all-by-name.
                    sch_fields = (
                        sch.get("fields") or []
                        if isinstance(sch, dict) else []
                    )
                    by_id = {
                        int(f["field-id"]): f["name"]
                        for f in sch_fields
                        if f.get("field-id") is not None
                    }
                    unannotated = {
                        f["name"] for f in sch_fields
                        if f.get("field-id") is None
                    }
                    name_to_id = {nm: i for i, nm in id_names.items()}

                    def read_name(n):
                        fid = name_to_id.get(n)
                        if fid is not None and fid in by_id:
                            return by_id[fid]
                        # no annotated field carries this column's id:
                        # by-name only against an unannotated field (an
                        # annotated field under the same name belongs
                        # to a DIFFERENT column that reused it)
                        return n if n in unannotated else None

                    def frame(rows, base):
                        out = pd.DataFrame(
                            [{n: (r.get(pn) if (pn := read_name(n))
                                  is not None else None)
                              for n in names}
                             for r in rows],
                            columns=names,
                        )
                        if need_meta:
                            out["__i_path"] = p
                            out["__i_pos"] = range(
                                base, base + len(out)
                            )
                        return out

                    pending: List[dict] = []
                    base = 0
                    for recs in blocks:
                        pending.extend(recs)
                        if len(pending) >= flush_rows:
                            yield frame(pending, base)
                            base += len(pending)
                            pending = []
                    if pending or base == 0:
                        yield frame(pending, base)

    spec = _spec_frame(spark, paths, "__a_path")
    return spec.mapInPandas(decode, schema=out_schema)


def _scan_orc_data(
    spark: SparkSession,
    meta: Dict,
    paths: List[str],
    need_meta: bool,
    strict_ids: bool,
) -> DataFrame:
    """ORC DATA files decoded EXECUTOR-side via ``pyarrow.orc`` — the
    same spec-frame ``mapInPandas`` pattern as the AVRO data path. Used
    when Spark's native ORC relation cannot express the semantics:

    * position deletes address rows by in-file ordinal and Spark's ORC
      reader exposes no ``_metadata.row_index`` — this path synthesizes
      ``__i_pos`` as each row's ordinal within its file;
    * renamed columns resolve through the ``iceberg.id`` type
      attributes ORC writers stamp (iceberg.apache.org/spec — ORC type
      annotations), which pyarrow surfaces as field metadata.

    ``strict_ids`` is set when the CURRENT schema has columns missing
    from the files by name (rename suspected): a file without id
    annotations then gates loudly, exactly like the parquet twin. When
    unset (position-deletes-only dispatch), files without ids resolve
    by name and absent columns are schema-evolution adds (null)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = _spark_schema_of(meta)
    names = [f.name for f in schema.fields]
    id_names = _current_field_names(meta)
    out_schema = schema
    if need_meta:
        out_schema = T.StructType(list(schema.fields) + [
            T.StructField("__i_path", T.StringType(), False),
            T.StructField("__i_pos", T.LongType(), False),
        ])

    def decode(batches):
        import pyarrow as pa
        import pyarrow.orc as orc

        for pdf in batches:
            for p in pdf["__o_path"]:
                f_orc = orc.ORCFile(p)
                file_schema = f_orc.schema
                ids: Dict[int, str] = {}
                has_ids = True
                for f in file_schema:
                    fid = (f.metadata or {}).get(b"iceberg.id")
                    if fid is None:
                        has_ids = False
                        break
                    ids[int(fid)] = f.name
                if strict_ids and not has_ids:
                    raise NotImplementedError(
                        f"Iceberg current schema columns are not "
                        f"present in {p} by name and the file carries "
                        "no iceberg.id ORC attributes — a renamed "
                        "table is only readable when its files were "
                        "written with field-id annotations"
                    )
                phys_of = (
                    {id_names[i]: phys for i, phys in ids.items()
                     if i in id_names}
                    if has_ids
                    else {n: n for n in file_schema.names}
                )
                # column pruning into the ORC read: dropped physical
                # columns are never decoded
                wanted = [
                    phys_of[n] for n in names
                    if phys_of.get(n) in file_schema.names
                ]
                # stripe-wise: memory per task is one stripe (~64 MB
                # by ORC convention), not the whole file; __i_pos is
                # the running in-file ordinal across stripes
                base = 0
                for si in range(f_orc.nstripes):
                    batch = f_orc.read_stripe(si, columns=wanted)
                    tbl = pa.Table.from_batches([batch])
                    data = {}
                    for n in names:
                        phys = phys_of.get(n)
                        data[n] = (
                            tbl.column(phys).to_pandas()
                            if phys in tbl.schema.names
                            else pd.Series([None] * tbl.num_rows)
                        )
                    out = pd.DataFrame(data, columns=names)
                    if need_meta:
                        out["__i_path"] = p
                        out["__i_pos"] = range(base, base + len(out))
                    base += tbl.num_rows
                    yield out

    spec = _spec_frame(spark, paths, "__o_path")
    return spec.mapInPandas(decode, schema=out_schema)


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: Optional[int] = None,
    timestamp_ms: Optional[int] = None,
    hive_partition_base: Optional[str] = None,
    ref: Optional[str] = None,
    filters=None,
    plan_out: Optional[Dict] = None,
) -> DataFrame:
    """Read an Iceberg table directory as a DataFrame — current
    snapshot, an explicit ``snapshot_id``, a named branch/tag ``ref``
    (the spec's snapshot references), or time travel to the latest
    snapshot at-or-before ``timestamp_ms``.

    ``filters`` (the engine's ``Filter``/``Logic`` IR, one
    ``(column, op, value)`` tuple, or a list of tuples joined by AND)
    prunes at MANIFEST level per the spec's scan planning: manifest-list
    partition summaries skip whole manifests, and each entry's
    partition tuple + column lower/upper bounds drop data files before
    the Spark scan is built — so a filtered read of a non-hive-layout
    or transform-partitioned table does not touch out-of-range files
    (iceberg.apache.org/spec "Scan Planning"; the reference gets this
    from iceberg-spark's planFiles, storage_connector.py read path).
    The same predicate is re-applied row-level on the result, so
    pruning is purely an I/O optimization. ``plan_out`` (a dict, filled
    in place) exposes the planned file set and prune counters for
    tests/EXPLAIN-style inspection.

    ``hive_partition_base`` opts into Spark hive-style partition
    discovery over that base (for tables whose identity-partition data
    files sit under ``<col>=<val>`` paths, e.g. the
    :class:`~.iceberg_backend.IcebergBackend` layout): partition-key
    filters then prune DIRECTORIES (``PartitionFilters``) at the Spark
    layer on top of the manifest-level pruning."""
    from .iceberg_prune import (
        ScanPruner,
        bind_residual,
        filters_to_column,
        normalize_filters,
        remap_tree,
    )

    path = os.path.abspath(path)
    meta = _read_table_metadata(path)
    snap = resolve_iceberg_snapshot(meta, snapshot_id, timestamp_ms, ref)
    # time travel reads with the SNAPSHOT's schema (spec:
    # snapshots[].schema-id; what iceberg-spark's VERSION AS OF does) —
    # a column renamed AFTER the snapshot shows its name as of the
    # snapshot. Absent schema-id (v1 writers, our own backend) keeps
    # the current schema.
    sid = snap.get("schema-id")
    if sid is not None and any(
        s.get("schema-id") == sid for s in (meta.get("schemas") or [])
    ):
        meta = {**meta, "current-schema-id": sid}
    tree = normalize_filters(filters)
    # bind engine-sanitized names to this table's schema names (and
    # weaken AND/OR conservatively where a name has no twin) so a
    # compiler hint over a raw-named external table prunes correctly
    # instead of not at all
    tree = remap_tree(tree, _current_field_names(meta).values())
    pruner = ScanPruner(meta, tree) if tree is not None else None
    stats: Dict = {} if plan_out is None else plan_out
    data, pos_del, eq_del = _snapshot_files(
        meta, snap, path, pruner=pruner, stats=stats
    )
    if plan_out is not None:
        plan_out["data_files"] = sorted(d["path"] for d in data)
    if not data:
        # empty snapshot: derive the schema from the current metadata
        return spark.createDataFrame([], _spark_schema_of(meta))
    need_meta = bool(pos_del or eq_del)
    pq_data = [d for d in data if d["fmt"] == "PARQUET"]
    av_data = [d for d in data if d["fmt"] == "AVRO"]
    parts: List[DataFrame] = []
    if pq_data:
        reader = spark.read.option("mergeSchema", "true")
        current = set(_current_field_names(meta).values())
        if hive_partition_base:
            # rename detection must see the PHYSICAL columns, so probe
            # the files WITHOUT partition discovery first (no duplicate
            # -column warning; identity-partition source columns are in
            # the data files per the spec, so declared-vs-physical is
            # meaningful)
            probe = reader.parquet(*sorted(d["path"] for d in pq_data))
            if any(n not in probe.columns for n in current) or any(
                n not in current for n in probe.columns
            ):
                # physical names diverge from the current schema
                # (missing = renames/adds-pending; extra = pre-rename
                # or dropped physical columns): field-id re-plan below
                # — correctness over the explicit-schema fast path
                df = probe
            else:
                # declared schema, not inference: partition-directory
                # type inference has no boolean type and reads
                # numeric-looking string keys as long, so a discovered
                # partition column would silently diverge from the
                # table schema. An explicit schema pins the declared
                # types, keeps values-win-from-path semantics for
                # duplicated columns, and drops the
                # COLUMN_ALREADY_EXISTS warning the inference path logs
                # on every partitioned read. Directory pruning
                # (PartitionFilters) is unaffected. Order is restored
                # below (Spark appends partition columns last).
                declared = _spark_schema_of(meta)
                reader = reader.schema(declared).option(
                    "basePath", os.path.abspath(hive_partition_base)
                )
                df = reader.parquet(*sorted(d["path"] for d in pq_data))
                df = df.select(*[f.name for f in declared.fields])
        else:
            df = reader.parquet(*sorted(d["path"] for d in pq_data))
        missing = [n for n in current if n not in df.columns]
        extra = [n for n in df.columns if n not in current]
        renamed = False
        if missing or extra:
            # physical names diverge from the current schema — renames
            # and/or drops. Re-plan the scan through the files' parquet
            # field-id annotations. A table whose files carry no field
            # ids gates loudly when a schema column is UNRESOLVABLE
            # (missing); when only extra physical columns surface
            # (drops without ids) the plain frame is still correct,
            # just wider — keep it.
            try:
                df = _scan_renamed(spark, meta, pq_data, need_meta, missing)
                renamed = True
            except NotImplementedError:
                if missing:
                    raise
        if need_meta and not renamed:
            df = df.withColumn("__i_path", _scan_path_col()).withColumn(
                "__i_pos", F.col("_metadata.row_index")
            )
        parts.append(df)
    if av_data:
        parts.append(_scan_avro_data(
            spark, meta, sorted(d["path"] for d in av_data), need_meta
        ))
    orc_data = [d for d in data if d["fmt"] == "ORC"]
    if orc_data:
        # Spark reads ORC natively (plan-integrated, codegen) — the
        # fast path whenever semantics allow. Two cases need the
        # executor-side pyarrow.orc scan instead: position deletes
        # (rows addressed by in-file ordinal; Spark's ORC relation
        # exposes no _metadata.row_index to reconstruct it) and
        # renamed columns (resolved via the files' iceberg.id ORC
        # attributes, which the native relation cannot see).
        opaths = sorted(d["path"] for d in orc_data)
        # rename detection runs regardless of deletes: strict_ids must
        # be set whenever current-schema columns are missing by name,
        # else a renamed no-ids table would silently return NULLs
        # through the arrow path instead of gating loudly. A probe that
        # cannot even merge (pre/post-rename schemas diverge) is itself
        # the rename signal.
        odf = None
        try:
            odf = spark.read.option("mergeSchema", "true").orc(*opaths)
            missing_o = [
                n for n in _current_field_names(meta).values()
                if n not in odf.columns
            ]
        except Exception as exc:  # noqa: BLE001 — filtered below
            # only a schema-shaped failure is a rename signal; anything
            # else — corrupt file, I/O error — must surface as itself,
            # not as a misleading strict-ids gate from _scan_orc_data
            # later. Merging pre/post-rename ORC schemas throws
            # AnalysisException or (observed, Spark 4.1)
            # IllegalArgumentException("For input string: <path>") out
            # of the ORC schema-merge path.
            from pyspark.errors import (
                AnalysisException,
                IllegalArgumentException,
            )

            msg = str(exc).lower()
            if not (isinstance(
                        exc, (AnalysisException, IllegalArgumentException))
                    or "schema" in msg or "merg" in msg):
                raise
            missing_o = list(_current_field_names(meta).values())
        if pos_del or missing_o:
            parts.append(_scan_orc_data(
                spark, meta, opaths, need_meta,
                strict_ids=bool(missing_o),
            ))
        else:
            if need_meta:
                odf = odf.withColumn(
                    "__i_path", _scan_path_col()
                ).withColumn("__i_pos", F.lit(None).cast("long"))
            parts.append(odf)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    if eq_del:
        seq_map = spark.createDataFrame(
            [(d["path"], d["seq"]) for d in data],
            "__i_path string, __i_seq long",
        )
        df = df.join(F.broadcast(seq_map), "__i_path", "left")
    # -- position deletes: (file_path, pos) anti-join, ONE relation --
    if pos_del:
        pd_df = spark.read.parquet(*sorted(p["path"] for p in pos_del))
        dels = pd_df.select(
            _delete_path_col(F.col("file_path"), path).alias("__i_path"),
            F.col("pos").alias("__i_pos"),
        )
        df = df.join(
            _maybe_broadcast(dels, sum(p["rows"] for p in pos_del)),
            ["__i_path", "__i_pos"], "left_anti",
        )
    # -- equality deletes: sequence-aware, ONE anti-join per distinct
    # equality_ids signature (a streaming-upsert table accretes MANY
    # small delete files of one signature; a per-file join chain would
    # compile N anti-joins) — same-signature files union into one
    # relation whose per-row __e_seq rides a broadcast path->seq map
    if eq_del:
        id_names = _current_field_names(meta)
        groups: Dict[Tuple[int, ...], List[dict]] = {}
        for d in eq_del:
            groups.setdefault(tuple(d["equality_ids"]), []).append(d)
        for ids, dels_g in sorted(groups.items()):
            cols = [id_names[i] for i in ids if i in id_names]
            if not cols or len(cols) != len(ids):
                raise NotImplementedError(
                    f"Iceberg equality delete {dels_g[0]['uri']} "
                    f"references field ids {list(ids)} not resolvable "
                    "in the current schema"
                )
            rel = spark.read.option("mergeSchema", "true").parquet(
                *sorted(d["path"] for d in dels_g)
            )
            eq_seq = spark.createDataFrame(
                [(d["path"], d["seq"]) for d in dels_g],
                "__e_path string, __e_seq long",
            )
            rows = (
                rel.withColumn("__e_path", _scan_path_col())
                .join(F.broadcast(eq_seq), "__e_path")
                .select(
                    *[F.col(c).alias(f"__e_{c}") for c in cols],
                    "__e_seq",
                )
            )
            cond = F.col("__e_seq") > F.col("__i_seq")
            for c in cols:
                cond = cond & F.col(c).eqNullSafe(F.col(f"__e_{c}"))
            df = df.join(
                _maybe_broadcast(
                    rows, sum(d["rows"] for d in dels_g)
                ),
                cond, "left_anti",
            )
    df = df.drop("__i_path", "__i_pos", "__i_seq")
    if tree is not None:
        # exact residual: manifest pruning is conservative (file
        # granularity), the row-level predicate settles the rest —
        # and Catalyst still pushes it into the parquet scan. Re-bind
        # against the OUTPUT columns (a snapshot-schema read can
        # surface different names than the current schema); anything
        # unresolvable drops conservatively — the engine compiler
        # re-applies the exact predicate at the plan root.
        residual = remap_tree(tree, df.columns)
        if residual is not None:
            df = df.where(filters_to_column(residual))
    return df
