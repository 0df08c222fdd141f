"""Minimal local model registry: explicit model ↔ feature-view provenance.

Parity surface: the reference's ``feature_view.get_models`` /
``get_newest_model`` / ``get_models_provenance``
(``/root/reference/python/hsfs/feature_view.py:1157-1208``), which
resolve "models generated from this feature view" through the
platform's model registry + provenance service, returning a
``Links``-classified result (``core/explicit_provenance.py:130-190``).
This engine has no model-serving platform, so the registry is a local
JSON-sidecar store under ``<store_root>/_models/`` — enough to honor
the provenance contract end-to-end: a model records which feature view
and training-dataset version produced it, and the view resolves its
generated models (accessible vs faulty) without any service.

Nothing here touches Spark: registration and lookup are pure-metadata
driver-side operations (the reference's are REST calls), so they add
zero jobs to training or serving paths.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import List, Optional

from .provenance import Artifact, Links

_MODELS_DIR = "_models"


def _is_version_file_of(fn: str, name: str) -> bool:
    """True iff ``fn`` is exactly ``{name}_<digits>.json`` — the strict
    version-sidecar pattern. A bare prefix test would make model
    'churn' absorb 'churn_v2_1.json' (it starts with 'churn_')."""
    stem = fn[:-5]  # drop .json
    if not stem.startswith(f"{name}_"):
        return False
    suffix = stem[len(name) + 1:]
    return suffix.isdigit()


@dataclass
class Model:
    """A registered model version (parity: the model-registry entries
    ``feature_view.get_models`` returns; only the provenance-relevant
    fields — the reference's ``Model`` carries serving config this
    engine does not replicate)."""

    name: str
    version: int = 1
    created: int = 0  # epoch ms, caller-supplied for determinism
    feature_view_name: Optional[str] = None
    feature_view_version: Optional[int] = None
    training_dataset_version: Optional[int] = None
    metrics: dict = field(default_factory=dict)
    description: str = ""

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "version": self.version,
            "created": self.created,
            "feature_view_name": self.feature_view_name,
            "feature_view_version": self.feature_view_version,
            "training_dataset_version": self.training_dataset_version,
            "metrics": dict(self.metrics),
            "description": self.description,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Model":
        return cls(
            name=d["name"],
            version=int(d.get("version", 1)),
            created=int(d.get("created", 0)),
            feature_view_name=d.get("feature_view_name"),
            feature_view_version=d.get("feature_view_version"),
            training_dataset_version=d.get("training_dataset_version"),
            metrics=dict(d.get("metrics") or {}),
            description=d.get("description", ""),
        )


class ModelRegistry:
    """JSON-file model registry rooted at a feature-store root."""

    def __init__(self, root: str) -> None:
        if root is None:
            raise ValueError(
                "ModelRegistry needs a store root (FeatureStore(root=...))"
            )
        self.root = os.path.join(root, _MODELS_DIR)

    def _path(self, name: str, version: int) -> str:
        return os.path.join(self.root, f"{name}_{version}.json")

    def save(self, model: Model, version: Optional[int] = None) -> Model:
        """Register a model version; ``version=None`` auto-increments
        over existing versions of the same name."""
        os.makedirs(self.root, exist_ok=True)
        if version is None:
            version = model.version
            existing = [m.version for m in self._load(model.name)]
            if existing:
                version = max(existing) + 1
        model.version = version
        with open(self._path(model.name, version), "w") as fh:
            json.dump(model.to_dict(), fh, indent=1)
        return model

    def _load(self, name: Optional[str] = None) -> List[Model]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for fn in sorted(os.listdir(self.root)):
            if not fn.endswith(".json"):
                continue
            if name is not None and not _is_version_file_of(fn, name):
                continue
            try:
                with open(os.path.join(self.root, fn)) as fh:
                    m = Model.from_dict(json.load(fh))
            except (json.JSONDecodeError, KeyError, ValueError):
                continue  # surfaced as faulty by models_provenance
            # the filename is only a locator — the PARSED name decides
            # membership, so 'churn' never absorbs 'churn_v2' entries
            # (churn_v2_1.json startswith 'churn_' but m.name differs)
            if name is not None and m.name != name:
                continue
            out.append(m)
        # numeric ordering: version 10 comes AFTER version 2 (lexicographic
        # os.listdir order would interleave them once versions hit 2 digits)
        out.sort(key=lambda m: (m.name, m.version))
        return out

    def get_model(self, name: str, version: Optional[int] = None) -> Model:
        """Fetch one model; ``version=None`` = newest version number."""
        models = self._load(name)
        if not models:
            raise KeyError(f"No model named {name!r} registered")
        if version is None:
            return max(models, key=lambda m: m.version)
        for m in models:
            if m.version == version:
                return m
        raise KeyError(f"No model {name!r} version {version}")

    def list_models(self) -> List[Model]:
        return self._load()

    def delete_model(self, name: str, version: int) -> None:
        p = self._path(name, version)
        if os.path.exists(p):
            os.remove(p)

    # -- provenance resolution (feature_view.get_models_provenance) ------
    def models_for_view(
        self,
        view_name: str,
        view_version: int,
        training_dataset_version: Optional[int] = None,
    ) -> Links:
        """All models generated from a feature view, classified like the
        reference's ``Links``: parseable registry entries are
        ``accessible``; unparseable sidecars under the registry dir are
        ``faulty`` (explicit provenance never tracks deletions, so
        ``deleted`` stays empty — same contract as the reference)."""
        links = Links()
        broken: List[str] = []  # (stem) sidecars with undeterminable linkage
        # names of models linked to THIS VIEW regardless of any
        # td-version filter — a corrupt sidecar of a linked model must
        # stay faulty even when the filter empties `accessible`
        linked_names: set = set()
        if os.path.isdir(self.root):
            for fn in sorted(os.listdir(self.root)):
                if not fn.endswith(".json"):
                    continue
                try:
                    with open(os.path.join(self.root, fn)) as fh:
                        raw = json.load(fh)
                except (json.JSONDecodeError, ValueError):
                    # undecodable: linkage unknowable — hold it, and only
                    # report it faulty if its name-stem belongs to a model
                    # we CAN tie to this view (a broken version sidecar of
                    # a linked model), instead of polluting every view
                    broken.append(fn[:-5])
                    continue
                linked = raw.get("feature_view_name") == view_name and raw.get(
                    "feature_view_version"
                ) == view_version
                try:
                    m = Model.from_dict(raw)
                except (KeyError, ValueError):
                    if linked:  # parse failed but linkage IS this view
                        links.faulty.append(Artifact(fn[:-5], 0, "MODEL"))
                    continue
                if linked:
                    linked_names.add(m.name)
                    if (
                        training_dataset_version is None
                        or m.training_dataset_version == training_dataset_version
                    ):
                        links.accessible.append(m)
        for stem in broken:
            if any(_is_version_file_of(f"{stem}.json", n) for n in linked_names):
                links.faulty.append(Artifact(stem, 0, "MODEL"))
        links.accessible.sort(key=lambda m: (m.name, m.version))
        return links
