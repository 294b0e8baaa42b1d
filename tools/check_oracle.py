"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, schema (column names), and order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = __import__("os").environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"schema: spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"rows: spark={len(got)} duck={len(exp)}")
        return problems
    cols = sorted(got.columns)
    g = got[cols].copy()
    e = exp[cols].copy()
    for c in cols:
        # normalize timestamps/dates to ns for comparison
        if pd.api.types.is_datetime64_any_dtype(g[c]) or pd.api.types.is_datetime64_any_dtype(e[c]):
            g[c] = pd.to_datetime(g[c])
            e[c] = pd.to_datetime(e[c])
    g = g.sort_values(cols).reset_index(drop=True)
    e = e.sort_values(cols).reset_index(drop=True)
    for c in cols:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
            # The driver hashes serialized values, so int64 150000 on one
            # side vs float64 150000.0 on the other (DuckDB hugeint ->
            # pandas float) is a driver FAIL even when numerically equal.
            if pd.api.types.is_float_dtype(gv) != pd.api.types.is_float_dtype(ev):
                problems.append(
                    f"values[{c}]: dtype mismatch spark={gv.dtype} "
                    f"duck={ev.dtype} — numerically comparable but "
                    "driver-hash-different (CAST the oracle column)"
                )
                continue
            ga = gv.astype(float).fillna(np.nan).to_numpy()
            ea = ev.astype(float).fillna(np.nan).to_numpy()
            ok = np.allclose(ga, ea, rtol=0, atol=0, equal_nan=True)
            # The driver hashes serialized values, so -0.0 vs +0.0 (which
            # allclose treats as equal) is a driver FAIL. Replicate that.
            if ok and not (np.signbit(ga) == np.signbit(ea)).all():
                ok = False
                problems.append(
                    f"values[{c}]: signed-zero mismatch (-0.0 vs +0.0) — "
                    "allclose-equal but driver-hash-different"
                )
        else:
            ok = gv.astype(str).equals(ev.astype(str))
        if not ok:
            diff_idx = None
            try:
                mism = (gv.astype(str) != ev.astype(str))
                diff_idx = mism.idxmax()
                problems.append(
                    f"values[{c}] first diff @{diff_idx}: "
                    f"spark={gv.iloc[diff_idx]!r} duck={ev.iloc[diff_idx]!r}"
                )
            except Exception:
                problems.append(f"values[{c}] differ")
    return problems


def main():
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [rows-only]")
            n_rowsonly += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(got)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} FAIL, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
