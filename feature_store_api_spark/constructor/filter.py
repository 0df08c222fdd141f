"""Predicate IR: ``Filter`` leaves and ``Logic`` boolean trees.

Semantics follow the reference surface (parity targets:
``/root/reference/python/hsfs/constructor/filter.py:24-215`` — conditions
GE/GT/NE/EQ/LE/LT/IN/LIKE; Logic types AND/OR/SINGLE) but the
implementation is brand-new and compiles straight to
:class:`pyspark.sql.Column` boolean expressions instead of JSON shipped
to a remote SQL generator.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


class Filter:
    """A single comparison: ``<feature> <condition> <value>``."""

    GE = "GREATER_THAN_OR_EQUAL"
    GT = "GREATER_THAN"
    NE = "NOT_EQUALS"
    EQ = "EQUALS"
    LE = "LESS_THAN_OR_EQUAL"
    LT = "LESS_THAN"
    IN = "IN"
    LK = "LIKE"

    _CONDITIONS = {GE, GT, NE, EQ, LE, LT, IN, LK}

    def __init__(self, feature: "Feature", condition: str, value: Any) -> None:
        if condition not in self._CONDITIONS:
            raise ValueError(f"Unknown filter condition: {condition}")
        self._feature = feature
        self._condition = condition
        self._value = value

    @property
    def feature(self) -> "Feature":
        return self._feature

    @property
    def condition(self) -> str:
        return self._condition

    @property
    def value(self) -> Any:
        return self._value

    def __and__(self, other):
        return Logic.single(self) & other

    def __or__(self, other):
        return Logic.single(self) | other

    def __repr__(self) -> str:
        return f"Filter({self._feature.name!r} {self._condition} {self._value!r})"

    # -- serialization (parity: the reference ships the Filter tree as
    # JSON to its query-constructor service; here it round-trips a saved
    # feature view through the local registry) ---------------------------
    def to_dict(self) -> dict:
        fg = self._feature.feature_group
        value = self._value
        if hasattr(value, "isoformat"):  # datetime/date → JSON-safe
            value = value.isoformat()
        elif isinstance(value, (list, tuple, set)):
            value = [
                v.isoformat() if hasattr(v, "isoformat") else v for v in value
            ]
        return {
            "feature": self._feature.name,
            "feature_group": [fg.name, fg.version] if fg is not None else None,
            "condition": self._condition,
            "value": value,
        }

    @classmethod
    def from_dict(cls, d: dict, resolve) -> "Filter":
        """``resolve(feature_name, fg_ref)`` returns the Feature; values
        serialized from datetimes come back as ISO strings, which the
        filter compiler already coerces against timestamp features."""
        return cls(resolve(d["feature"], d.get("feature_group")), d["condition"], d["value"])

    def to_column(self, resolve: Callable[["Feature"], Column]) -> Column:
        """Compile to a Spark Column given a feature→Column resolver."""
        col = resolve(self._feature)
        v = self._value
        if self._condition == self.GE:
            return col >= v
        if self._condition == self.GT:
            return col > v
        if self._condition == self.NE:
            return col != v
        if self._condition == self.EQ:
            return col == v
        if self._condition == self.LE:
            return col <= v
        if self._condition == self.LT:
            return col < v
        if self._condition == self.IN:
            return col.isin(list(v))
        if self._condition == self.LK:
            return col.like(v)
        raise AssertionError(self._condition)

    def referenced_features(self):
        return [self._feature]


class Logic:
    """Boolean tree over :class:`Filter` leaves (AND / OR / SINGLE)."""

    AND = "AND"
    OR = "OR"
    SINGLE = "SINGLE"

    def __init__(self, type_: str, left=None, right=None) -> None:
        self._type = type_
        self._left = left  # Filter | Logic | None
        self._right = right  # Filter | Logic | None

    @classmethod
    def single(cls, f: Filter) -> "Logic":
        return cls(cls.SINGLE, left=f)

    @staticmethod
    def _coerce(x):
        if isinstance(x, Filter):
            return Logic.single(x)
        if isinstance(x, Logic):
            return x
        raise TypeError(f"Cannot combine filter with {type(x)}")

    def __and__(self, other):
        return Logic(self.AND, left=self, right=self._coerce(other))

    def __or__(self, other):
        return Logic(self.OR, left=self, right=self._coerce(other))

    @property
    def type(self) -> str:
        return self._type

    def to_column(self, resolve) -> Column:
        if self._type == self.SINGLE:
            return self._left.to_column(resolve)
        lc = self._left.to_column(resolve)
        rc = self._right.to_column(resolve)
        return (lc & rc) if self._type == self.AND else (lc | rc)

    def referenced_features(self):
        out = []
        for side in (self._left, self._right):
            if side is not None:
                out.extend(side.referenced_features())
        return out

    def __repr__(self) -> str:
        if self._type == self.SINGLE:
            return repr(self._left)
        return f"({self._left!r} {self._type} {self._right!r})"

    def to_dict(self) -> dict:
        def enc(side):
            if side is None:
                return None
            kind = "filter" if isinstance(side, Filter) else "logic"
            return {kind: side.to_dict()}

        return {"type": self._type, "left": enc(self._left), "right": enc(self._right)}

    @classmethod
    def from_dict(cls, d: dict, resolve) -> "Logic":
        def dec(side):
            if side is None:
                return None
            if "filter" in side:
                return Filter.from_dict(side["filter"], resolve)
            return cls.from_dict(side["logic"], resolve)

        return cls(d["type"], left=dec(d.get("left")), right=dec(d.get("right")))
