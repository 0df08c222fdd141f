"""Legacy store-level TrainingDataset API (deprecated thin parity).

Parity surface: ``/root/reference/python/hsfs/feature_store.py:337,376,
1207`` (``get_training_dataset(s)`` / ``create_training_dataset``) and
``training_dataset.py`` — the pre-FeatureView materialization API the
reference itself deprecates ("`TrainingDataset` is deprecated, use
`FeatureView` instead"). Kept here as THIN aliases so a reference user's
legacy code keeps running: ``create_training_dataset`` is lazy (metadata
only), ``save(query_or_df)`` materializes via the same
``prepare_training_data`` → ``write_training_dataset`` path feature
views use, ``read()`` loads a split back. New code should use
``FeatureView.create_training_dataset``.
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

# own namespace: FeatureView materializations live under
# _training_datasets/{view}_{version}; sharing that directory would let
# a same-named view's delete_all_training_datasets() rmtree a legacy
# TD's data (and commingle split dirs)
_TD_DIR = "_legacy_training_datasets"
_META = "_td_meta.json"


class TrainingDataset:
    """A named, versioned, file-materialized training dataset (legacy).

    Lazy like the reference: constructing (or ``create_training_dataset``)
    persists nothing; ``save(features)`` writes the data + metadata.
    """

    def __init__(
        self,
        feature_store,
        name: str,
        version: int = 1,
        data_format: str = "tfrecords",
        splits: Optional[Dict[str, float]] = None,
        seed: Optional[int] = None,
        label: Optional[Sequence[str]] = None,
        coalesce: bool = False,
        description: str = "",
        train_split: Optional[str] = None,
        statistics_config=None,
        transformation_functions: Sequence = (),
    ) -> None:
        self._feature_store = feature_store
        self.name = name
        self.version = version
        self.data_format = data_format
        self.splits = dict(splits or {})
        self.seed = seed
        self.label = list(label or [])
        self.coalesce = coalesce
        self.description = description
        self.train_split = train_split or "train"
        self.statistics_config = statistics_config
        self.transformation_functions = list(transformation_functions)
        self.split_dirs: Dict[str, str] = {}
        self.statistics: Optional[dict] = None

    # -- locations --------------------------------------------------------
    @property
    def location(self) -> str:
        root = self._feature_store.root
        if root is None:
            raise ValueError(
                "Legacy TrainingDataset needs FeatureStore(root=...)"
            )
        return os.path.join(root, _TD_DIR, f"{self.name}_{self.version}")

    # -- materialize ------------------------------------------------------
    def save(self, features, spark: Optional[SparkSession] = None) -> "TrainingDataset":
        """Materialize ``features`` (a DataFrame or a Query) to split
        files under the store root — one stats pass, transformations
        bound to the train split, per-split directories (the same
        engine path ``FeatureView.create_training_dataset`` uses)."""
        from .operators.training import prepare_training_data
        from .sources.writers import write_training_dataset

        df = features
        if not isinstance(features, DataFrame):
            df = features.read(spark)  # Query
        os.makedirs(self.location, exist_ok=True)
        with prepare_training_data(
            df,
            transformations=self.transformation_functions,
            random=self.splits or None,
            seed=self.seed,
            train_split=self.train_split if self.splits else "train",
        ) as td:
            self.split_dirs = write_training_dataset(
                td.splits, self.data_format, self.location,
                coalesce=self.coalesce,
            )
            self.statistics = td.statistics
        with open(os.path.join(self.location, _META), "w") as fh:
            json.dump(self._meta(), fh, indent=1, default=str)
        return self

    def _meta(self) -> dict:
        return {
            "name": self.name,
            "version": self.version,
            "data_format": self.data_format,
            "splits": self.splits,
            "seed": self.seed,
            "label": self.label,
            "coalesce": self.coalesce,
            "description": self.description,
            "train_split": self.train_split,
            "split_dirs": self.split_dirs,
            "statistics": self.statistics,
        }

    @classmethod
    def _from_meta(cls, feature_store, d: dict) -> "TrainingDataset":
        td = cls(
            feature_store,
            d["name"],
            version=int(d.get("version", 1)),
            data_format=d.get("data_format", "parquet"),
            splits=d.get("splits") or {},
            seed=d.get("seed"),
            label=d.get("label") or [],
            coalesce=bool(d.get("coalesce", False)),
            description=d.get("description", ""),
            train_split=d.get("train_split"),
        )
        td.split_dirs = d.get("split_dirs") or {}
        td.statistics = d.get("statistics")
        return td

    # -- read back --------------------------------------------------------
    def read(
        self,
        split: Optional[str] = None,
        spark: Optional[SparkSession] = None,
    ) -> DataFrame:
        """Read one split back (``split=None``: the lone split, or
        ``train`` when several exist — the reference's default read)."""
        from .sources.writers import read_training_dataset

        if not self.split_dirs:
            raise ValueError(
                f"TrainingDataset {self.name} v{self.version} has no "
                "materialized splits — call save(features) first"
            )
        if split is None:
            split = (
                next(iter(self.split_dirs))
                if len(self.split_dirs) == 1
                else self.train_split
            )
        if split not in self.split_dirs:
            raise KeyError(
                f"No split {split!r}; have {sorted(self.split_dirs)}"
            )
        if spark is None:
            spark = SparkSession.getActiveSession()
        return read_training_dataset(
            spark, self.data_format, self.split_dirs[split]
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"TrainingDataset({self.name!r}, v{self.version})"


def _warn_deprecated(what: str) -> None:
    warnings.warn(
        f"{what} is deprecated (the reference deprecates the store-level "
        "TrainingDataset API); use FeatureView.create_training_dataset",
        DeprecationWarning,
        stacklevel=3,
    )


def create_training_dataset(feature_store, name: str, version=None, **kw) -> TrainingDataset:
    _warn_deprecated("create_training_dataset")
    if version is None:
        version = max(
            (t.version for t in get_training_datasets(feature_store, name)),
            default=0,
        ) + 1
    return TrainingDataset(feature_store, name, version=version, **kw)


def get_training_dataset(
    feature_store, name: str, version: Optional[int] = None
) -> TrainingDataset:
    _warn_deprecated("get_training_dataset")
    tds = get_training_datasets(feature_store, name)
    if not tds:
        raise KeyError(f"No training dataset named {name!r}")
    if version is None:
        return max(tds, key=lambda t: t.version)
    for t in tds:
        if t.version == version:
            return t
    raise KeyError(f"No training dataset {name!r} version {version}")


def get_training_datasets(feature_store, name: str) -> List[TrainingDataset]:
    root = feature_store.root
    if root is None:
        return []
    base = os.path.join(root, _TD_DIR)
    if not os.path.isdir(base):
        return []
    out: List[TrainingDataset] = []
    for d in sorted(os.listdir(base)):
        meta = os.path.join(base, d, _META)
        if not os.path.isfile(meta):
            continue
        try:
            with open(meta) as fh:
                payload = json.load(fh)
        except (json.JSONDecodeError, ValueError):
            continue
        if payload.get("name") == name:
            out.append(TrainingDataset._from_meta(feature_store, payload))
    out.sort(key=lambda t: t.version)
    return out
