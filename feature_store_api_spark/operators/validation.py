"""Data validation: expectation suites as aggregate assertions.

Parity: the reference's Great Expectations / Deequ validation surface
(``/root/reference/python/hsfs/engine/spark.py:1055-1109`` runs a GE
suite against the DataFrame before ingest;
``expectation_suite.py`` holds the suite model with
``validation_ingestion_policy`` ∈ {ALWAYS, STRICT}).

Design: each expectation compiles to aggregate expressions; a suite is
ONE ``df.agg`` pass (Catalyst fuses all checks into a single scan with
map-side partial aggregation — no per-expectation job), then verdicts
are evaluated driver-side on the tiny result row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ExpectationResult:
    expectation_type: str
    column: Optional[str]
    success: bool
    observed: Any
    kwargs: Dict[str, Any] = field(default_factory=dict)


@dataclass
class ValidationReport:
    success: bool
    results: List[ExpectationResult]
    evaluated: int
    # fate of the validated data — the reference persists the UPPERCASE
    # vocabulary (validation_report.py:103 ``.upper()`` on the wire):
    # UNKNOWN/INGESTED/REJECTED/EXPERIMENT/FG_DATA. We match it so
    # history filters ported from reference code compare equal.
    ingestion_result: str = "UNKNOWN"

    def failures(self) -> List[ExpectationResult]:
        return [r for r in self.results if not r.success]


class Expectation:
    """One check. Subclasses provide agg expressions + a verdict."""

    expectation_type = "expectation"

    def __init__(self, column: Optional[str] = None, **kwargs: Any) -> None:
        self.column = column
        self.kwargs = kwargs

    def aggs(self, idx: int) -> List:  # pragma: no cover - abstract
        raise NotImplementedError

    def verdict(self, row: Dict[str, Any], idx: int) -> ExpectationResult:  # pragma: no cover
        raise NotImplementedError


class ExpectColumnValuesToNotBeNull(Expectation):
    expectation_type = "expect_column_values_to_not_be_null"

    def aggs(self, idx):
        return [
            F.sum(F.when(F.col(self.column).isNull(), 1).otherwise(0)).alias(f"e{idx}_nulls")
        ]

    def verdict(self, row, idx):
        nulls = row[f"e{idx}_nulls"] or 0
        return ExpectationResult(
            self.expectation_type, self.column, nulls == 0, {"null_count": nulls}
        )


class ExpectColumnValuesToBeBetween(Expectation):
    expectation_type = "expect_column_values_to_be_between"

    def aggs(self, idx):
        lo = self.kwargs.get("min_value")
        hi = self.kwargs.get("max_value")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(self.column) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(self.column) > F.lit(hi))
        return [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"e{idx}_oob"),
            F.min(F.col(self.column)).alias(f"e{idx}_min"),
            F.max(F.col(self.column)).alias(f"e{idx}_max"),
        ]

    def verdict(self, row, idx):
        oob = row[f"e{idx}_oob"] or 0
        return ExpectationResult(
            self.expectation_type,
            self.column,
            oob == 0,
            {
                "out_of_bounds": oob,
                "observed_min": row[f"e{idx}_min"],
                "observed_max": row[f"e{idx}_max"],
            },
            self.kwargs,
        )


class ExpectColumnValuesToBeUnique(Expectation):
    expectation_type = "expect_column_values_to_be_unique"

    def aggs(self, idx):
        return [
            F.count(F.col(self.column)).alias(f"e{idx}_n"),
            F.countDistinct(F.col(self.column)).alias(f"e{idx}_d"),
        ]

    def verdict(self, row, idx):
        n, d = row[f"e{idx}_n"] or 0, row[f"e{idx}_d"] or 0
        return ExpectationResult(
            self.expectation_type, self.column, n == d,
            {"count": n, "distinct": d, "duplicates": n - d},
        )


class ExpectColumnValuesToBeInSet(Expectation):
    expectation_type = "expect_column_values_to_be_in_set"

    def aggs(self, idx):
        vals = list(self.kwargs["value_set"])
        bad = (~F.col(self.column).isin(vals)) & F.col(self.column).isNotNull()
        return [F.sum(F.when(bad, 1).otherwise(0)).alias(f"e{idx}_bad")]

    def verdict(self, row, idx):
        bad = row[f"e{idx}_bad"] or 0
        return ExpectationResult(
            self.expectation_type, self.column, bad == 0,
            {"unexpected_count": bad}, self.kwargs,
        )


class ExpectColumnMeanToBeBetween(Expectation):
    expectation_type = "expect_column_mean_to_be_between"

    def aggs(self, idx):
        return [F.avg(F.col(self.column)).alias(f"e{idx}_mean")]

    def verdict(self, row, idx):
        mean = row[f"e{idx}_mean"]
        lo = self.kwargs.get("min_value", float("-inf"))
        hi = self.kwargs.get("max_value", float("inf"))
        ok = mean is not None and lo <= mean <= hi
        return ExpectationResult(
            self.expectation_type, self.column, ok, {"observed_mean": mean}, self.kwargs
        )


class ExpectTableRowCountToBeBetween(Expectation):
    expectation_type = "expect_table_row_count_to_be_between"

    def aggs(self, idx):
        return [F.count(F.lit(1)).alias(f"e{idx}_rows")]

    def verdict(self, row, idx):
        n = row[f"e{idx}_rows"] or 0
        lo = self.kwargs.get("min_value", 0)
        hi = self.kwargs.get("max_value", float("inf"))
        return ExpectationResult(
            self.expectation_type, None, lo <= n <= hi, {"row_count": n}, self.kwargs
        )


class ExpectationSuite:
    """Named set of expectations (parity ``expectation_suite.py``).

    ``validation_ingestion_policy``: STRICT aborts ingest on failure,
    ALWAYS ingests regardless but records the report — the two policies
    the reference exposes.
    """

    ALWAYS = "ALWAYS"
    STRICT = "STRICT"

    def __init__(
        self,
        expectations: Sequence[Expectation],
        name: str = "default",
        validation_ingestion_policy: str = "ALWAYS",
    ) -> None:
        self.name = name
        self.expectations = list(expectations)
        self.validation_ingestion_policy = validation_ingestion_policy

    # -- Great-Expectations-format interchange (parity: the reference
    # stores suites as GE ExpectationConfiguration lists — see
    # expectation_suite.py:46 (constructor accepts GE configs/dicts) and
    # ge_expectation.py:80-99 (expectationType + kwargs/meta, with the
    # wire variant JSON-encoding kwargs/meta as strings) ------------------

    @classmethod
    def from_ge_json(cls, d: Dict[str, Any]) -> "ExpectationSuite":
        """Build a suite from a GE-format dict: canonical GE shape
        (``expectation_suite_name`` + ``expectations`` with snake_case
        keys, ``column`` inside ``kwargs``) and the reference's wire
        variant (camelCase ``expectationType``; ``kwargs``/``meta`` as
        JSON-encoded strings) both parse. Unknown expectation types
        raise ``ValueError`` naming the supported set."""
        import json as _json

        registry = _ge_type_registry()
        expectations: List[Expectation] = []
        for e in d.get("expectations", []):
            etype = e.get("expectation_type") or e.get("expectationType")
            kwargs = e.get("kwargs", {})
            if isinstance(kwargs, str):
                kwargs = _json.loads(kwargs)
            meta = e.get("meta", {})
            if isinstance(meta, str):
                meta = _json.loads(meta)
            klass = registry.get(etype)
            if klass is None:
                raise ValueError(
                    f"Unsupported expectation type {etype!r}; supported: "
                    f"{sorted(registry)}"
                )
            kwargs = dict(kwargs)
            column = kwargs.pop("column", None)
            exp = klass(column=column, **kwargs)
            exp.meta = dict(meta)
            expectations.append(exp)
        policy = (
            d.get("validation_ingestion_policy")
            or d.get("validationIngestionPolicy")
            or (d.get("meta") or {}).get("validation_ingestion_policy")
            or cls.ALWAYS
        )
        return cls(
            expectations,
            name=d.get("expectation_suite_name")
            or d.get("expectationSuiteName")
            or "default",
            validation_ingestion_policy=str(policy).upper(),
        )

    def to_ge_json(self) -> Dict[str, Any]:
        """Canonical GE suite dict: snake_case keys, ``column`` folded
        into each expectation's ``kwargs`` — loadable by
        ``great_expectations`` and by :meth:`from_ge_json`."""
        return {
            "expectation_suite_name": self.name,
            "expectations": [
                {
                    "expectation_type": e.expectation_type,
                    "kwargs": (
                        {"column": e.column, **e.kwargs}
                        if e.column is not None
                        else dict(e.kwargs)
                    ),
                    "meta": dict(getattr(e, "meta", {}) or {}),
                }
                for e in self.expectations
            ],
            "meta": {
                "validation_ingestion_policy": self.validation_ingestion_policy
            },
        }

    def validate(self, df: DataFrame) -> ValidationReport:
        """All expectations in ONE aggregation pass."""
        aggs = []
        for i, e in enumerate(self.expectations):
            aggs.extend(e.aggs(i))
        if not aggs:
            return ValidationReport(True, [], 0)
        row = df.agg(*aggs).collect()[0].asDict()
        results = [e.verdict(row, i) for i, e in enumerate(self.expectations)]
        return ValidationReport(
            all(r.success for r in results), results, len(results)
        )


def _ge_type_registry() -> Dict[str, type]:
    """expectation_type string → Expectation subclass, discovered from
    the classes defined in this module."""
    reg: Dict[str, type] = {}
    stack = [Expectation]
    while stack:
        k = stack.pop()
        for sub in k.__subclasses__():
            reg[sub.expectation_type] = sub
            stack.append(sub)
    return reg


class DataValidationError(RuntimeError):
    def __init__(self, report: ValidationReport) -> None:
        fails = ", ".join(
            f"{r.expectation_type}({r.column}): {r.observed}" for r in report.failures()
        )
        super().__init__(f"Validation failed: {fails}")
        self.report = report


def validate_for_ingest(df: DataFrame, suite: Optional[ExpectationSuite]):
    """Ingest-time hook (parity ``engine/spark.py:1055-1109``): STRICT
    policy raises on failure; ALWAYS returns the report for recording."""
    if suite is None:
        return None
    report = suite.validate(df)
    if not report.success and suite.validation_ingestion_policy == ExpectationSuite.STRICT:
        report.ingestion_result = "REJECTED"
        raise DataValidationError(report)
    # non-strict (ALWAYS) ingests REGARDLESS of the verdict — the
    # recorded fate must say so even for a failing report
    report.ingestion_result = "INGESTED"
    return report
