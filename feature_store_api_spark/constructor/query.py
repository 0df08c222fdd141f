"""The logical query plan: :class:`Query`.

Parity target: ``/root/reference/python/hsfs/constructor/query.py:38-836``
— left feature group + selected features + joins + filter tree +
time-travel bounds, composable and lazily executed. The reference ships
this object to a metadata server that generates SQL strings
(``core/query_constructor_api.py:23-31``); here the plan compiles
*locally* to DataFrame operations (:mod:`..plans.compiler`) and Catalyst
does the optimization.
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from .filter import Filter, Logic
from .join import Join


class Query:
    def __init__(
        self,
        left_feature_group,
        left_features: List["Feature"],
        filter: Optional[Logic] = None,
        joins: Optional[List[Join]] = None,
    ) -> None:
        self._left_feature_group = left_feature_group
        self._left_features = list(left_features)
        self._filter: Optional[Logic] = filter
        self._joins: List[Join] = list(joins or [])
        # time-travel bounds (epoch-millis or parseable), parity
        # constructor/query.py:299-410 (as_of / pull_changes)
        self._left_fg_start_time = None
        self._left_fg_end_time = None

    # -- plan introspection ----------------------------------------------
    @property
    def left_feature_group(self):
        return self._left_feature_group

    @property
    def left_features(self) -> List["Feature"]:
        return self._left_features

    @property
    def joins(self) -> List[Join]:
        return self._joins

    @property
    def features(self) -> List["Feature"]:
        """All selected features across the plan, depth-first (parity
        ``constructor/query.py:788-801``)."""
        out = list(self._left_features)
        for j in self._joins:
            out.extend(j.query.features)
        return out

    @property
    def left_feature_group_start_time(self):
        return self.start_time

    @property
    def left_feature_group_end_time(self):
        return self.end_time

    def is_time_travel(self) -> bool:
        """Parity ``constructor/query.py:649-655``."""
        return bool(
            self.start_time is not None
            or self.end_time is not None
            or any(j.query.is_time_travel() for j in self._joins)
        )

    def is_cache_feature_group_only(self) -> bool:
        """Parity ``constructor/query.py:657-659``: True when every
        feature group in the plan is a cached (managed) group."""
        from ..feature_group import FeatureGroup as _FG

        return all(isinstance(fg, _FG) for fg in self.featuregroups())

    @property
    def filters(self) -> Optional[Logic]:
        """Conjunction of this query's filter and all sub-query filters.

        Parity: ``constructor/query.py:775-785`` (filters survive joins).
        """
        logic = self._filter
        for j in self._joins:
            sub = j.query.filters
            if sub is not None:
                logic = sub if logic is None else (logic & sub)
        return logic

    @property
    def start_time(self):
        return self._left_fg_start_time

    @property
    def end_time(self):
        return self._left_fg_end_time

    # -- composition ------------------------------------------------------
    def join(
        self,
        sub_query: "Query",
        on: Optional[List[str]] = None,
        left_on: Optional[List[str]] = None,
        right_on: Optional[List[str]] = None,
        join_type: str = "left",
        prefix: Optional[str] = None,
    ) -> "Query":
        """Append a join edge (default join type LEFT, default keys =
        maximal matching subset of the two sides' primary keys — parity
        ``constructor/query.py:236-297``)."""
        self._joins.append(
            Join(sub_query, on=on, left_on=left_on, right_on=right_on,
                 join_type=join_type, prefix=prefix)
        )
        return self

    def filter(self, f: Union[Filter, Logic]) -> "Query":
        """AND-accumulate a predicate. Parity ``constructor/query.py:412-480``."""
        if isinstance(f, Filter):
            f = Logic.single(f)
        self._filter = f if self._filter is None else (self._filter & f)
        return self

    def as_of(self, wallclock_time=None, exclude_until=None) -> "Query":
        """Time-travel: read state at ``wallclock_time``; optionally
        exclude commits up to ``exclude_until`` (incremental pull).
        Propagates to joined sub-queries — parity
        ``constructor/query.py:299-392``."""
        from ..functions.event_time import to_epoch_millis

        end = to_epoch_millis(wallclock_time) if wallclock_time is not None else None
        start = to_epoch_millis(exclude_until) if exclude_until is not None else None
        for j in self._joins:
            j.query.as_of(wallclock_time, exclude_until)
        self._left_fg_end_time = end
        self._left_fg_start_time = start
        return self

    def pull_changes(self, wallclock_start_time, wallclock_end_time) -> "Query":
        from ..functions.event_time import to_epoch_millis

        self._left_fg_start_time = to_epoch_millis(wallclock_start_time)
        self._left_fg_end_time = to_epoch_millis(wallclock_end_time)
        return self

    def append_feature(self, feature: "Feature") -> "Query":
        """Parity ``constructor/query.py:636-647``."""
        self._left_features.append(feature)
        return self

    # -- feature resolution ----------------------------------------------
    def featuregroups(self):
        """All feature groups in the plan, depth-first (parity
        ``constructor/query.py:812-822``)."""
        fgs = [self._left_feature_group]
        for j in self._joins:
            fgs.extend(j.query.featuregroups())
        # dedupe preserving order
        seen, out = set(), []
        for fg in fgs:
            if id(fg) not in seen:
                seen.add(id(fg))
                out.append(fg)
        return out

    def get_feature(self, name: str) -> "Feature":
        """Look up a feature across the plan; ambiguous names raise.

        Parity: ``constructor/query.py:661-752,824-836``.
        """
        hits = [
            f for fg in self.featuregroups() for f in fg.features if f.name == name
        ]
        if not hits:
            raise KeyError(f"Feature {name!r} not found in query")
        if len(hits) > 1:
            owners = [h.feature_group.name for h in hits]
            raise ValueError(
                f"Feature {name!r} is ambiguous; present in feature groups {owners}. "
                "Use fg.get_feature(name) or a join prefix."
            )
        return hits[0]

    # -- execution --------------------------------------------------------
    def compile(self, spark: SparkSession) -> DataFrame:
        from ..plans.compiler import compile_query

        return compile_query(self, spark)

    def read(
        self,
        spark: Optional[SparkSession] = None,
        online: bool = False,
        dataframe_type: str = "spark",
    ) -> DataFrame:
        """Execute the plan (parity ``constructor/query.py:135-207``;
        ``online=True`` reads the latest-per-key materialization).
        ``dataframe_type`` converts the delivery like the reference's
        ``_return_dataframe_type`` (``engine/spark.py:245-262``):
        ``spark`` (default, lazy) | ``pandas`` | ``numpy`` | ``python``
        — the non-spark forms COLLECT to the driver; use only for
        bounded results."""
        from ..session import get_spark

        spark = spark or get_spark()
        if online:
            from ..plans.compiler import compile_query_online

            df = compile_query_online(self, spark)
        else:
            df = self.compile(spark)
        kind = dataframe_type.lower()
        if kind == "spark":
            return df
        if kind == "pandas":
            return df.toPandas()
        if kind == "numpy":
            return df.toPandas().values
        if kind in ("python", "default"):
            return [list(r) for r in df.collect()]
        raise ValueError(f"Unknown dataframe_type {dataframe_type!r}")

    def preview(
        self, n: int = 10, spark: Optional[SparkSession] = None,
        online: bool = False,
    ) -> DataFrame:
        """First ``n`` rows as a DataFrame. Online preview mirrors the
        reference's prepared-statement preview
        (``core/online_store_sql_engine.py:464-465``): the WHERE clause
        is STRIPPED and ``LIMIT n`` appended — filters are ignored, the
        latest-per-key state is sampled as-is."""
        from ..session import get_spark

        spark = spark or get_spark()
        if online:
            from ..plans.compiler import compile_query

            return compile_query(self, spark, online=True, skip_filters=True).limit(n)
        return self.read(spark).limit(n)

    def show(self, n: int = 10, spark: Optional[SparkSession] = None,
             online: bool = False):
        """Parity ``constructor/query.py:209-234``."""
        return self.preview(n, spark, online=online).show()

    def to_string(self) -> str:
        """ANSI-SQL form of this query against the ``fs.sql`` temp-view
        names (parity: the reference's server-generated SQL,
        ``constructor/fs_query.py:26-62``). Generated from the same IR
        the compiler consumes; the tests execute it via ``fs.sql`` and
        assert equality with the compiled DataFrame. Raises for plans
        SQL cannot express against plain views (time travel)."""
        from ..plans.sql_emitter import emit_sql

        return emit_sql(self)

    # -- serialization (parity constructor/query.py:485-496: the
    # reference PUTs Query.json() to its metadata server; here the dict
    # round-trips saved feature views through a local registry) ----------
    def to_dict(self) -> dict:
        def enc_time(t):
            return t.isoformat() if hasattr(t, "isoformat") else t

        fg = self._left_feature_group
        return {
            "left_feature_group": [fg.name, fg.version],
            "left_features": [f.name for f in self._left_features],
            "filter": self._filter.to_dict() if self._filter else None,
            "joins": [j.to_dict() for j in self._joins],
            "start_time": enc_time(self._left_fg_start_time),
            "end_time": enc_time(self._left_fg_end_time),
        }

    def json(self) -> str:
        import json

        return json.dumps(self.to_dict())

    @classmethod
    def from_dict(cls, d: dict, fs) -> "Query":
        """Rehydrate against a :class:`~..feature_store.FeatureStore`:
        feature groups resolve by (name, version) from its registry."""
        from .join import Join

        fg = fs.get_feature_group(*d["left_feature_group"])
        feats = [fg.get_feature(n) for n in d["left_features"]]

        def resolve(fname, fg_ref):
            src = fs.get_feature_group(*fg_ref) if fg_ref else fg
            return src.get_feature(fname)

        q = cls(
            fg,
            feats,
            filter=Logic.from_dict(d["filter"], resolve) if d.get("filter") else None,
            joins=[Join.from_dict(j, fs) for j in d.get("joins", [])],
        )
        q._left_fg_start_time = d.get("start_time")
        q._left_fg_end_time = d.get("end_time")
        return q

    def __repr__(self) -> str:
        return (
            f"Query(left={self._left_feature_group.name}, "
            f"features={[f.name for f in self._left_features]}, "
            f"joins={self._joins}, filter={self._filter!r})"
        )
