"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf_dir, runs the
matching oracle_sql() in DuckDB (tables pre-registered as views), and
compares row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def plain_spark():
    """A vanilla SparkSession, mirroring the driver harness.

    Deliberately does NOT use the engine's own ``get_spark`` factory: the
    round-1 gate failed on confs the factory set that the driver's plain
    session lacked. The local sweep must exercise the same contract.
    """
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("check_correctness")
        .getOrCreate()
    )

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # unify int widths/nullability
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _kind(dtype) -> str:
    k = dtype.kind
    return "i" if k in ("i", "u") else k


def compare(name, sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"SCHEMA mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"ROWCOUNT mismatch: spark={len(sdf)} oracle={len(odf)}"
    # The driver's value-hash distinguishes int-kind from float-kind columns
    # (e.g. DuckDB HUGEINT -> pandas float64 vs Spark int). Surface that
    # class of mismatch here instead of letting rtol mask it.
    kinds = [
        (c, _kind(sdf[c].dtype), _kind(odf[c].dtype))
        for c in sdf.columns
        if _kind(sdf[c].dtype) != _kind(odf[c].dtype)
    ]
    if kinds:
        return f"DTYPE-KIND mismatch: {kinds}"
    a, b = normalize(sdf), normalize(odf)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-5, atol=1e-6)
    except AssertionError as e:
        return "VALUES mismatch: " + str(e).split("\n")[0] + " | " + "\n".join(str(e).split("\n")[1:3])
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = plain_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: ORACLE ERROR {str(e)[:300]}")
            continue
        verdict = compare(name, sdf, odf)
        status = "ok" if verdict == "OK" else "FAIL"
        if verdict != "OK":
            failures.append(name)
        print(f"[{status}] {name}: {len(sdf)} rows; {verdict}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL GREEN")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
