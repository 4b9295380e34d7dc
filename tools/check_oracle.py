"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value hash — the same
contract TESTDATA.md describes for CORRECTNESS_r{N}.json.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string form per cell → order-insensitive, type-tolerant hash
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "null" if pd.isna(v) else f"{v:.9g}")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f").fillna("null")
        else:
            out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def compare(name: str, spark_df, oracle_df) -> tuple[bool, str]:
    sp = normalize(spark_df)
    oc = normalize(oracle_df)
    if len(sp) != len(oc):
        return False, f"rowcount spark={len(sp)} oracle={len(oc)}"
    if list(sp.columns) != list(oc.columns):
        return False, f"columns spark={list(sp.columns)} oracle={list(oc.columns)}"
    if not sp.equals(oc):
        diff = (sp != oc).any(axis=1)
        idx = diff[diff].index[:3]
        detail = "; ".join(
            f"row{i}: spark={sp.loc[i].to_dict()} oracle={oc.loc[i].to_dict()}" for i in idx
        )
        return False, f"values differ on {int(diff.sum())}/{len(sp)} rows: {detail[:600]}"
    return True, f"{len(sp)} rows"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from parseable_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures, passed, rows_only = [], 0, 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL {name}: SPARK ERROR: {str(ex)[:300]}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"FAIL {name}: ORACLE ERROR: {str(ex)[:300]}")
            continue
        ok, msg = compare(name, sdf, odf)
        status = "ok" if ok else "FAIL"
        print(f"{status} {name}: {msg} ({time.time()-t0:.1f}s)")
        if ok:
            passed += 1
        else:
            failures.append((name, msg))

    print(f"\n{passed} passed, {len(failures)} failed, {rows_only} rows-only")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg[:400]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
