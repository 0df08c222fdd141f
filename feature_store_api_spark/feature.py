"""Column metadata record: :class:`Feature`.

Parity target: ``/root/reference/python/hsfs/feature.py:30-268`` (name,
offline type, primary/partition/event-time flags, default value, and the
comparison-operator overloads that build Filter predicates). Re-designed
for Spark: the canonical type is a :class:`pyspark.sql.types.DataType`,
with Hive-DDL strings accepted and round-tripped for API parity.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from pyspark.sql import types as T

from .constructor.filter import Filter

_NAME_RE = re.compile(r"[^a-z0-9_]")


def autofix_feature_name(name: str) -> str:
    """Sanitize: lowercase, spaces/illegal chars → underscores.

    Parity: ``/root/reference/python/hsfs/util.py:106``.
    """
    return _NAME_RE.sub("_", name.lower().replace(" ", "_"))


_SIMPLE_DDL = {
    "string": T.StringType(),
    "varchar": T.StringType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


def ddl_to_spark_type(ddl: str) -> T.DataType:
    """Parse a Hive-DDL type string into a Spark DataType.

    Covers the offline type surface enumerated at
    ``/root/reference/python/hsfs/feature.py:37`` (scalars plus
    MAP/ARRAY/STRUCT/DECIMAL complex types). Scalars and array/map
    parse without a SparkContext (so type declarations work at import
    time); anything else falls back to Spark's own DDL parser.
    """
    s = ddl.strip().lower()
    if s in _SIMPLE_DDL:
        return _SIMPLE_DDL[s]
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(ddl_to_spark_type(s[6:-1]))
    if s.startswith("map<") and s.endswith(">"):
        inner = s[4:-1]
        depth, split_at = 0, -1
        for i, ch in enumerate(inner):
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                split_at = i
                break
        if split_at > 0:
            return T.MapType(
                ddl_to_spark_type(inner[:split_at]),
                ddl_to_spark_type(inner[split_at + 1 :]),
            )
    if s.startswith("decimal"):
        if "(" in s:
            p, sc = s[s.index("(") + 1 : s.index(")")].split(",")
            return T.DecimalType(int(p), int(sc))
        return T.DecimalType(10, 0)
    return T._parse_datatype_string(ddl)


def spark_type_to_ddl(dtype: T.DataType) -> str:
    """Inverse of :func:`ddl_to_spark_type` (Spark's simpleString).

    Mirrors ``engine/spark.py:1398-1426`` including the tinyint/smallint
    promotion quirk: byte/short are declared as ``int`` offline.
    """
    if isinstance(dtype, (T.ByteType, T.ShortType)):
        return "int"
    return dtype.simpleString()


class Feature:
    """A named, typed column of a feature group.

    Comparison operators build :class:`Filter` IR nodes, e.g.
    ``fg.o_totalprice > 100`` — parity with
    ``/root/reference/python/hsfs/feature.py:230-259``.
    """

    def __init__(
        self,
        name: str,
        type: Any = None,  # DataType | DDL string | None
        primary: bool = False,
        partition: bool = False,
        event_time: bool = False,
        default_value: Any = None,
        description: Optional[str] = None,
        feature_group=None,
    ) -> None:
        self._name = autofix_feature_name(name)
        if isinstance(type, str):
            self._type: Optional[T.DataType] = ddl_to_spark_type(type)
        else:
            self._type = type
        self.primary = primary
        self.partition = partition
        self.event_time = event_time
        self.default_value = default_value
        self.description = description
        self._feature_group = feature_group

    @property
    def name(self) -> str:
        return self._name

    @property
    def type(self) -> Optional[T.DataType]:
        return self._type

    @property
    def ddl_type(self) -> Optional[str]:
        return spark_type_to_ddl(self._type) if self._type is not None else None

    def is_complex(self) -> bool:
        """True for MAP/ARRAY/STRUCT types (parity ``feature.py:113`` —
        complex features get Avro-encoded on the online path)."""
        return isinstance(
            self._type, (T.ArrayType, T.MapType, T.StructType)
        )

    @property
    def feature_group(self):
        return self._feature_group

    def with_feature_group(self, fg) -> "Feature":
        f = Feature(
            self._name,
            self._type,
            primary=self.primary,
            partition=self.partition,
            event_time=self.event_time,
            default_value=self.default_value,
            description=self.description,
            feature_group=fg,
        )
        return f

    def to_struct_field(self) -> T.StructField:
        return T.StructField(self._name, self._type or T.StringType(), True)

    # -- comparison overloads → Filter IR ---------------------------------
    def __lt__(self, other) -> Filter:
        return Filter(self, Filter.LT, other)

    def __le__(self, other) -> Filter:
        return Filter(self, Filter.LE, other)

    def __gt__(self, other) -> Filter:
        return Filter(self, Filter.GT, other)

    def __ge__(self, other) -> Filter:
        return Filter(self, Filter.GE, other)

    def __eq__(self, other) -> Filter:  # type: ignore[override]
        return Filter(self, Filter.EQ, other)

    def __ne__(self, other) -> Filter:  # type: ignore[override]
        return Filter(self, Filter.NE, other)

    def isin(self, values) -> Filter:
        return Filter(self, Filter.IN, list(values))

    def like(self, pattern: str) -> Filter:
        return Filter(self, Filter.LK, pattern)

    def contains(self, values) -> Filter:  # reference alias for isin
        return self.isin(values)

    def __hash__(self) -> int:
        return hash((self._name, id(self._feature_group)))

    def __repr__(self) -> str:
        fg = getattr(self._feature_group, "name", None)
        return f"Feature({(fg + '.') if fg else ''}{self._name})"
