"""Jarless DISTRIBUTED database source over PEP 249 (Python DBAPI).

The reference's JDBC-family connectors (``storage_connector.py:406``
Redshift, ``:949`` JDBC, ``:745`` Snowflake) execute through Spark's
JDBC data source, which needs driver JARs this runtime does not have.
This module implements the same execution model — range-partitioned
pushdown queries running INSIDE the executors — over any Python DBAPI
driver instead: each task opens its own connection (via a picklable
zero-arg ``connect`` callable), executes the base query with its
partition's WHERE predicate appended, and streams ``fetchmany``
batches out as Arrow-backed pandas frames. sqlite3 (stdlib) is the
offline-testable driver; any PEP 249 module (psycopg2, mysqlclient,
snowflake-connector-python, …) plugs in unchanged.

Scale shape: this is exactly Spark JDBC's partitioning contract —
``partition_column`` + bounds + ``num_partitions`` become stride
predicates (first stride also takes NULLs, matching Spark), so the
database sees N concurrent range scans and no single task materializes
the whole table. Without a partition column the read degrades to ONE
task (loudly documented, same as Spark JDBC).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession


def _sqlite_connect(path: str):
    import sqlite3

    return sqlite3.connect(path)


def sqlite_connector(path: str) -> Callable:
    """A picklable zero-arg connect callable for a sqlite file — the
    stdlib-only way to exercise the distributed DBAPI path offline."""
    return partial(_sqlite_connect, path)


def _subquery(query: Optional[str], table: Optional[str]) -> str:
    if (query is None) == (table is None):
        raise ValueError("pass exactly one of query= or table=")
    return f"({query}) AS __sub" if query else str(table)


def _partition_predicates(
    col: str, lower: float, upper: float, n: int
) -> List[str]:
    """Spark-JDBC-shaped stride predicates: n half-open ranges covering
    (-inf, +inf); the first also takes NULLs."""
    if n <= 1 or lower >= upper:
        return ["1=1"]
    stride = (upper - lower) / n
    bounds = [lower + stride * i for i in range(1, n)]
    # integer column bounds stay integers so the SQL is portable
    if float(lower).is_integer() and float(upper).is_integer():
        bounds = sorted({int(math.floor(b)) for b in bounds})
    preds = [f"{col} < {bounds[0]} OR {col} IS NULL"]
    for lo, hi in zip(bounds, bounds[1:]):
        preds.append(f"{col} >= {lo} AND {col} < {hi}")
    preds.append(f"{col} >= {bounds[-1]}")
    return preds


def read_dbapi(
    spark: SparkSession,
    connect: Callable,
    query: Optional[str] = None,
    table: Optional[str] = None,
    partition_column: Optional[str] = None,
    num_partitions: Optional[int] = None,
    lower_bound=None,
    upper_bound=None,
    schema=None,
    fetch_size: int = 10_000,
    filter: Optional[str] = None,
    columns=None,
) -> DataFrame:
    """Read a DBAPI-reachable table/query as a distributed DataFrame.

    ``connect`` must be PICKLABLE (a module-level function or a
    ``functools.partial`` over one) — every executor task calls it to
    open its own connection. ``schema`` (Spark StructType) overrides
    driver-side inference from a 100-row sample; required when the
    source can be empty.

    ``filter`` (a SQL predicate string) and ``columns`` (sequence or
    comma-separated string) push down into every partition's statement
    — the DATABASE prunes rows and columns instead of shipping full
    rows to Spark, the same pruning Spark's JDBC source gets from
    Catalyst pushdown. The filter also narrows the bounds probe, so
    stride partitions cover only the selected rows."""
    import pandas as pd

    if isinstance(columns, str):
        columns = [c.strip() for c in columns.split(",") if c.strip()]
    sel = ", ".join(columns) if columns else "*"
    where = f" WHERE ({filter})" if filter else ""
    sub = _subquery(query, table)
    conn = connect()
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT {sel} FROM {sub}{where} LIMIT 100")
        names = [d[0] for d in cur.description]
        sample = cur.fetchall()
        if partition_column is not None and (
            lower_bound is None or upper_bound is None
        ):
            cur.execute(
                f"SELECT MIN({partition_column}), MAX({partition_column})"
                f" FROM {sub}{where}"
            )
            lo, hi = cur.fetchone()
            lower_bound = lo if lower_bound is None else lower_bound
            upper_bound = hi if upper_bound is None else upper_bound
    finally:
        conn.close()
    if schema is None:
        if not sample:
            raise ValueError(
                "cannot infer a schema from an empty source — pass "
                "schema= (Spark StructType)"
            )
        sample_pdf = pd.DataFrame(sample, columns=names)
        schema = spark.createDataFrame(sample_pdf).schema
    names = [f.name for f in schema.fields]

    if partition_column is None or lower_bound is None or (
        upper_bound is None
    ):
        preds = ["1=1"]  # one task — the Spark JDBC no-partitioning mode
    else:
        n = int(
            num_partitions or spark.sparkContext.defaultParallelism
        )
        preds = _partition_predicates(
            partition_column, lower_bound, upper_bound, n
        )

    base = f"SELECT {sel} FROM {sub} WHERE " + (
        f"({filter}) AND " if filter else ""
    )

    def fetch(batches):
        for pdf in batches:
            for pred in pdf["__pred"]:
                c = connect()
                try:
                    cur = c.cursor()
                    cur.execute(base + f"({pred})")
                    cols = [d[0] for d in cur.description]
                    while True:
                        rows = cur.fetchmany(fetch_size)
                        if not rows:
                            break
                        out = pd.DataFrame(rows, columns=cols)
                        yield out.reindex(columns=names)
                finally:
                    c.close()

    spec = spark.createDataFrame(
        [(p,) for p in preds], "__pred string"
    ).repartition(len(preds))
    return spec.mapInPandas(fetch, schema=schema)


def _paramstyle_of(conn, override: "Optional[str]" = None) -> str:
    """Resolve the PEP 249 paramstyle for a live connection.

    PEP 249 pins ``paramstyle`` as a MODULE-level attribute, so probe
    the connection class's module (walking up the package chain —
    psycopg2 connections live in ``psycopg2.extensions`` while the
    attribute sits on ``psycopg2``). Explicit ``override`` wins;
    unknown/absent falls back to ``qmark``."""
    if override:
        return override
    import sys

    mod_name = type(conn).__module__ or ""
    parts = mod_name.split(".")
    while parts:
        mod = sys.modules.get(".".join(parts))
        style = getattr(mod, "paramstyle", None)
        if style:
            return str(style)
        parts.pop()
    return "qmark"


_PLACEHOLDERS = {
    # positional styles only: executemany feeds tuples
    "qmark": lambda cols: ["?"] * len(cols),
    "format": lambda cols: ["%s"] * len(cols),
    "numeric": lambda cols: [f":{i + 1}" for i in range(len(cols))],
}


def write_dbapi(
    df: DataFrame,
    connect: Callable,
    table: str,
    batch_size: int = 10_000,
    busy_retries: int = 50,
    paramstyle: "Optional[str]" = None,
) -> None:
    """Write a DataFrame into a DBAPI-reachable table — Spark JDBC's
    write model over PEP 249: each PARTITION opens its own executor-side
    connection and streams its rows as ``executemany`` batches, one
    transaction per partition (Spark JDBC's per-partition atomicity —
    a failed task rolls back its own partition and retries).

    ``connect`` must be picklable, like :func:`read_dbapi`'s. The
    target table must already exist (same contract as Spark JDBC's
    ``append`` SaveMode against an existing table — DDL is dialect
    territory the engine stays out of). Single-writer databases
    (sqlite) serialize concurrent partitions via bounded busy retries."""
    import time as _time

    cols = list(df.columns)

    def build_stmt(style: str):
        """(sql, row-builder) for a resolved paramstyle. Positional
        styles feed tuples; named styles feed dicts — both are the
        PEP 249 executemany contracts."""
        if style in _PLACEHOLDERS:
            ph = _PLACEHOLDERS[style](cols)
            make = lambda row: tuple(row[c] for c in cols)  # noqa: E731
        elif style == "named":
            ph = [f":{c}" for c in cols]
            make = lambda row: {c: row[c] for c in cols}  # noqa: E731
        elif style == "pyformat":
            ph = [f"%({c})s" for c in cols]
            make = lambda row: {c: row[c] for c in cols}  # noqa: E731
        else:
            raise ValueError(f"unsupported DBAPI paramstyle {style!r}")
        sql = (
            f"INSERT INTO {table} ({', '.join(cols)}) "
            f"VALUES ({', '.join(ph)})"
        )
        return sql, make

    def retry_busy(fn):
        for attempt in range(busy_retries):
            try:
                return fn()
            except Exception as exc:  # e.g. sqlite "database is locked"
                msg = str(exc).lower()
                if ("locked" in msg or "busy" in msg) and (
                    attempt + 1 < busy_retries
                ):
                    _time.sleep(0.05 * (attempt + 1))
                    continue
                raise

    def write_partition(rows_iter):
        conn = connect()
        try:
            stmt, make_row = build_stmt(_paramstyle_of(conn, paramstyle))
            cur = conn.cursor()
            batch = []

            def flush():
                if batch:
                    retry_busy(lambda: cur.executemany(stmt, batch))
                    batch.clear()

            for row in rows_iter:
                batch.append(make_row(row))
                if len(batch) >= batch_size:
                    flush()
            flush()
            retry_busy(conn.commit)
        finally:
            conn.close()

    df.foreachPartition(write_partition)
