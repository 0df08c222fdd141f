"""Join IR node.

Parity target: ``/root/reference/python/hsfs/constructor/join.py:27-87``
(join types INNER/LEFT/RIGHT/FULL/CROSS/LEFT_SEMI/COMMA, explicit
``on`` or ``left_on``/``right_on`` key lists, right-side ``prefix``).
Compiled locally to ``DataFrame.join`` by
:mod:`feature_store_api_spark.plans.compiler`.
"""

from __future__ import annotations

from typing import List, Optional


class JoinType:
    INNER = "inner"
    LEFT = "left"
    RIGHT = "right"
    FULL = "full"
    CROSS = "cross"
    LEFT_SEMI = "left_semi"
    LEFT_ANTI = "left_anti"  # free in Spark; absent in reference surface
    COMMA = "cross"  # reference COMMA join == cross join

    _ALIASES = {
        "inner": INNER,
        "left": LEFT,
        "left_outer": LEFT,
        "right": RIGHT,
        "right_outer": RIGHT,
        "full": FULL,
        "full_outer": FULL,
        "outer": FULL,
        "cross": CROSS,
        "comma": CROSS,
        "left_semi": LEFT_SEMI,
        "leftsemi": LEFT_SEMI,
        "left_semi_join": LEFT_SEMI,
        "left_anti": LEFT_ANTI,
        "leftanti": LEFT_ANTI,
    }

    @classmethod
    def normalize(cls, how: str) -> str:
        key = how.strip().lower()
        if key not in cls._ALIASES:
            raise ValueError(f"Unsupported join type: {how!r}")
        return cls._ALIASES[key]


class Join:
    """One join edge: a right sub-query plus keys / type / prefix."""

    def __init__(
        self,
        query: "Query",
        on: Optional[List[str]] = None,
        left_on: Optional[List[str]] = None,
        right_on: Optional[List[str]] = None,
        join_type: str = "left",
        prefix: Optional[str] = None,
    ) -> None:
        on = [on] if isinstance(on, str) else list(on or [])
        left_on = [left_on] if isinstance(left_on, str) else list(left_on or [])
        right_on = [right_on] if isinstance(right_on, str) else list(right_on or [])
        if on and (left_on or right_on):
            raise ValueError("Pass either `on` or `left_on`/`right_on`, not both")
        if len(left_on) != len(right_on):
            raise ValueError("left_on and right_on must have the same length")
        self.query = query
        self.on = on
        self.left_on = left_on
        self.right_on = right_on
        self.join_type = JoinType.normalize(join_type)
        self.prefix = prefix

    def to_dict(self) -> dict:
        return {
            "query": self.query.to_dict(),
            "on": self.on,
            "left_on": self.left_on,
            "right_on": self.right_on,
            "type": self.join_type,
            "prefix": self.prefix,
        }

    @classmethod
    def from_dict(cls, d: dict, fs) -> "Join":
        from .query import Query

        return cls(
            Query.from_dict(d["query"], fs),
            on=d.get("on") or None,
            left_on=d.get("left_on") or None,
            right_on=d.get("right_on") or None,
            join_type=d.get("type", "left"),
            prefix=d.get("prefix"),
        )

    def __repr__(self) -> str:
        keys = self.on or list(zip(self.left_on, self.right_on))
        return (
            f"Join({self.query.left_feature_group.name}, keys={keys or 'pk-inferred'}, "
            f"how={self.join_type}, prefix={self.prefix!r})"
        )
