"""Local stand-in for the driver's oracle gate.

Runs every ``__spark_entry__.queries()`` entry on a scale-factor directory,
runs the matching ``oracle_sql()`` statement in DuckDB over the same parquet
tables, and compares row count, sorted column names, and values (rows sorted,
columns sorted by name, floats compared with tolerance).

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # numpy arrays appear when Arrow conversion is off (the
            # vanilla-session path); canonicalize them as lists so both
            # engines' array columns stringify identically
            s = s.map(lambda v: v.tolist() if isinstance(v, np.ndarray) else v)
            df[c] = s.map(
                lambda v: json.dumps(v, sort_keys=True, default=str)
                if isinstance(v, (list, dict, tuple)) else v
            )
        try:
            import decimal
            if s.map(lambda v: isinstance(v, decimal.Decimal)).any():
                df[c] = s.astype(float)
        except Exception:
            pass
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    except Exception:
        df = df.sort_values(
            sort_cols, kind="mergesort", key=lambda s: s.astype(str)
        ).reset_index(drop=True)
    return df


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            for x, y in zip(av.astype(float), bv.astype(float)):
                if (pd.isna(x)) != (pd.isna(y)):
                    return False
                if pd.isna(x):
                    continue
                if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                    return False
        else:
            ax = av.astype(str).where(~av.isna(), "<NA>")
            bx = bv.astype(str).where(~bv.isna(), "<NA>")
            if not ax.equals(bx):
                return False
    return True


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entry

    if vanilla:
        # exactly what the grading driver does: a PLAIN session, none
        # of our tuned conf — catches conf dependencies the default
        # (tuned) run would mask
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from grpc_map_reduce_spark.session import get_spark

        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # driver smoke: entry() must run and return rows on a live session
    n_entry = entry.entry(spark).count()
    print(f"{'entry()':35s} ok ({n_entry} rows)", flush=True)

    queries = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            results[name] = f"SPARK-ERROR {type(exc).__name__}: {exc}"
            print(f"{name:35s} {results[name]}", flush=True)
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows)"
            print(f"{name:35s} {results[name]}", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            results[name] = f"ORACLE-ERROR {type(exc).__name__}: {exc}"
            print(f"{name:35s} {results[name]}", flush=True)
            continue
        a, b = _canon(sdf), _canon(odf)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} oracle={len(b)}"
        elif not _values_match(a, b):
            results[name] = "VALUE-MISMATCH"
        else:
            results[name] = f"ok ({len(a)} rows)"
        print(f"{name:35s} {results[name]}", flush=True)

    bad = {k: v for k, v in results.items() if not v.startswith(("ok", "rows-only"))}
    print(f"\n{len(results) - len(bad)}/{len(results)} green")
    if bad:
        print("FAILING:", json.dumps(bad, indent=2))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
