"""Local stand-in for the driver's correctness harness.

Runs every __spark_entry__.queries() entry at the given sf dir, runs
its oracle_sql() in DuckDB over the same parquet files, and compares
row count, sorted column names, and the order-insensitive value
multiset. Exits non-zero on any mismatch.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.astype(str)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_sig(s: pd.Series) -> str:
    """Pandas dtype → driver-comparable signature. The driver hashes
    toPandas frames on both sides, so its schema compare sees pandas
    dtypes: Spark timestamps land tz-NAIVE (both TIMESTAMP and NTZ),
    while DuckDB's TIMESTAMPTZ lands tz-AWARE — that asymmetry is the
    r2 stream_window_agg schema failure the old tz-normalizing compare
    hid locally. ns-vs-us resolution is a pandas artifact, ignored."""
    if pd.api.types.is_datetime64_any_dtype(s):
        tz = getattr(s.dt, "tz", None)
        return "datetime+tz" if tz is not None else "datetime"
    k = s.dtype.kind
    if k in "iu":
        return f"int{s.dtype.itemsize * 8}"
    if k == "f":
        return f"float{s.dtype.itemsize * 8}"
    return str(s.dtype)


def schema_sig(df: pd.DataFrame) -> dict[str, str]:
    return {c: dtype_sig(df[c]) for c in df.columns}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    qs, osql = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark query raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        if name not in osql:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        ssig, osig = schema_sig(sdf), schema_sig(odf)
        if dict(sorted(ssig.items())) != dict(sorted(osig.items())):
            diff = {c: (ssig.get(c), osig.get(c))
                    for c in set(ssig) | set(osig)
                    if ssig.get(c) != osig.get(c)}
            print(f"FAIL {name}: schema mismatch {diff}")
            failures.append(name)
            continue
        a, b = norm(sdf), norm(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} != {list(b.columns)}")
            failures.append(name)
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} != {len(b)}")
            failures.append(name)
            continue
        bad = None
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f":
                eq = np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
            else:
                both_na = pd.isna(av) & pd.isna(bv)
                eq = ((av == bv) | both_na).all()
            if not eq:
                bad = c
                break
        if bad is not None:
            m = (a[bad].to_numpy() != b[bad].to_numpy())
            i = int(np.flatnonzero(m)[0]) if m.any() else 0
            print(f"FAIL {name}: column {bad} differs, e.g. row {i}: "
                  f"{a[bad].iloc[i]!r} != {b[bad].iloc[i]!r}")
            failures.append(name)
            continue
        print(f"ok   {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")

    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
