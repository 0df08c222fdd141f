"""Explicit provenance: lineage links between feature groups and
feature views.

Parity surface: ``/root/reference/python/hsfs/core/explicit_provenance.py``
(``Artifact``/``Links`` result model) and the accessors
``feature_group.py:534-601`` (``get_parent_feature_groups``,
``get_generated_feature_views``) / ``feature_view.py:1145-1155``
(``get_parent_feature_groups``). The reference resolves links from its
metadata service; this engine derives them locally:

* **view → parent feature groups**: walked straight off the view's
  logical ``Query`` tree (``Query.featuregroups()``) — always exact.
* **feature group → generated feature views**: scan of the store's
  registered + persisted views, matching feature-group references in
  each view's serialized query tree — exact for store-backed views.
* **feature group → parent feature groups**: derived at ``insert()``
  time from the ingested DataFrame's PHYSICAL PLAN — the parquet scan
  locations in the plan are matched against the store's managed
  feature-group locations (a Spark-native take on "this FG was built
  from a query over those FGs"), persisted to a ``_provenance.json``
  sidecar. Best-effort by design: a plan whose lineage was truncated
  (localCheckpoint, cached exchange) contributes nothing; callers can
  pass ``parents=`` explicitly for those cases.

Links are classified like the reference's ``Links``: ``accessible``
(target still exists), ``deleted`` (referenced but gone).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class Artifact:
    """A provenance endpoint (parity ``explicit_provenance.py:26-127``)."""

    name: str
    version: int
    artifact_type: str  # "FEATURE_GROUP" | "FEATURE_VIEW"

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "version": self.version,
            "artifact_type": self.artifact_type,
        }

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Artifact({self.artifact_type} {self.name} v{self.version})"


@dataclass
class Links:
    """Link-resolution result (parity ``explicit_provenance.py:130-190``)."""

    accessible: List = field(default_factory=list)
    deleted: List[Artifact] = field(default_factory=list)
    inaccessible: List[Artifact] = field(default_factory=list)
    faulty: List[Artifact] = field(default_factory=list)

    def to_dict(self) -> dict:
        def _ser(x):
            if isinstance(x, Artifact):
                return x.to_dict()
            return {
                "name": x.name,
                "version": getattr(x, "version", 1),
                "artifact_type": type(x).__name__,
            }

        return {
            "accessible": [_ser(a) for a in self.accessible],
            "deleted": [_ser(a) for a in self.deleted],
            "inaccessible": [_ser(a) for a in self.inaccessible],
            "faulty": [_ser(a) for a in self.faulty],
        }


_FILE_URI_RE = re.compile(r"^file:(//)?")


def df_scan_locations(df) -> List[str]:
    """File-source root paths read by a DataFrame's plan, collected by
    walking the ANALYZED logical plan's ``LogicalRelation`` leaves via
    py4j and reading each ``HadoopFsRelation``'s ``location.rootPaths``
    — exact, unlike parsing the plan string, whose Location field Spark
    truncates for long paths. Leaves without a file location (JDBC
    relations, in-memory/RDD sources, checkpoints) contribute nothing."""
    paths: List[str] = []
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        it = leaves.iterator()
        while it.hasNext():
            leaf = it.next()
            try:
                roots = leaf.relation().location().rootPaths().iterator()
                while roots.hasNext():
                    p = roots.next().toString()
                    paths.append(_FILE_URI_RE.sub("", p).rstrip("/"))
            except Exception:
                continue  # not a file-backed relation
    except Exception:
        return []
    return paths


def parents_from_plan(df, feature_store, exclude=None) -> List[Tuple[str, int]]:
    """Match a DataFrame's scan locations against the store's managed
    feature-group locations → (name, version) parent links. Skips the
    plan walk entirely (zero overhead on hot ingest paths) when no
    OTHER managed group exists to match against."""
    if feature_store is None:
        return []
    candidates = [
        ((name, version), fg.location.rstrip("/"))
        for (name, version), fg in list(feature_store._registry.items())
        if getattr(fg, "location", None) and fg is not exclude
    ]
    if not candidates:
        return []
    locs = df_scan_locations(df)
    if not locs:
        return []
    out = [
        key
        for key, root in candidates
        if any(p == root or p.startswith(root + "/") for p in locs)
    ]
    return sorted(set(out))


# -- sidecar persistence ------------------------------------------------------

def _sidecar_path(fg) -> Optional[str]:
    if getattr(fg, "location", None) is None:
        return None
    return os.path.join(fg.location, "_provenance.json")


def record_parents(fg, parents: List[Tuple[str, int]]) -> None:
    """Union the given (name, version) parent links into the feature
    group's provenance sidecar (self-links excluded)."""
    path = _sidecar_path(fg)
    if path is None or not parents:
        return
    current = load_parents(fg)
    merged = sorted(
        {
            (str(n), int(v))
            for n, v in list(current) + list(parents)
            if not (n == fg.name and int(v) == fg.version)
        }
    )
    with open(path, "w") as fh:
        json.dump({"parents": [list(p) for p in merged]}, fh, indent=1)


def load_parents(fg) -> List[Tuple[str, int]]:
    path = _sidecar_path(fg)
    if path is None or not os.path.exists(path):
        return []
    with open(path) as fh:
        return [tuple(p) for p in json.load(fh).get("parents", [])]


# -- link resolution ----------------------------------------------------------

def _resolve_fg_links(refs: List[Tuple[str, int]], feature_store) -> Links:
    links = Links()
    for name, version in refs:
        fg = None
        if feature_store is not None:
            try:
                fg = feature_store.get_feature_group(name, int(version))
            except Exception:
                fg = None
        if fg is not None:
            links.accessible.append(fg)
        else:
            links.deleted.append(
                Artifact(name, int(version), "FEATURE_GROUP")
            )
    return links


def view_parent_feature_groups(view) -> Links:
    """Parents of a feature view = the feature groups of its query tree
    (parity ``feature_view.py:1145``). Spine groups are part of the
    plan and are reported too, as the reference does for its left-side
    spine."""
    links = Links()
    for fg in view.query.featuregroups():
        exists = True
        loc = getattr(fg, "location", None)
        if loc is not None and not os.path.exists(loc):
            exists = False
        if exists:
            links.accessible.append(fg)
        else:
            links.deleted.append(
                Artifact(fg.name, getattr(fg, "version", 1), "FEATURE_GROUP")
            )
    return links


def _refs_in_query_dict(qd: dict) -> List[Tuple[str, int]]:
    refs = [tuple(qd["left_feature_group"])]
    for j in qd.get("joins", []):
        refs.extend(_refs_in_query_dict(j["query"]))
    return refs


def fg_generated_feature_views(fg, feature_store) -> Links:
    """Feature views built over this feature group (parity
    ``feature_group.py:588``): in-memory views plus persisted view
    JSONs under the store root are scanned for references to
    (fg.name, fg.version)."""
    links = Links()
    if feature_store is None:
        return links
    seen = set()
    # live registered views
    for (vname, vver), view in list(feature_store._views.items()):
        try:
            fgs = view.query.featuregroups()
        except Exception:
            continue
        if any(
            g.name == fg.name and getattr(g, "version", 1) == fg.version
            for g in fgs
        ):
            links.accessible.append(view)
            seen.add((vname, vver))
    # persisted-but-not-loaded views: match on the serialized query tree
    root = getattr(feature_store, "root", None)
    vdir = os.path.join(root, "_feature_views") if root else None
    if vdir and os.path.isdir(vdir):
        for f in sorted(os.listdir(vdir)):
            if not f.endswith(".json"):
                continue
            # The directory also holds monitoring/tag sidecars
            # ({name}_{ver}_monitoring.json, {name}_{ver}_tags.json) with
            # different shapes — only read {name}_{digits}.json view files.
            stem = f[: -len(".json")]
            if "_" not in stem or not stem.rsplit("_", 1)[1].isdigit():
                continue
            with open(os.path.join(vdir, f)) as fh:
                d = json.load(fh)
            if "name" not in d or "query" not in d:
                continue
            key = (d["name"], d.get("version", 1))
            if key in seen:
                continue
            refs = _refs_in_query_dict(d["query"])
            if (fg.name, fg.version) in {(n, int(v)) for n, v in refs}:
                view = feature_store.get_feature_view(*key)
                if view is not None:
                    links.accessible.append(view)
    return links


def fg_parent_feature_groups(fg, feature_store) -> Links:
    """Upstream feature groups this group was derived from (parity
    ``feature_group.py:534``), resolved from the provenance sidecar."""
    return _resolve_fg_links(load_parents(fg), feature_store)
