"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at a given sf and compare against ``oracle_sql()`` via
DuckDB (row count + column names + order-insensitive value hash).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.9g")
    return hashlib.md5(payload.encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            results[name] = f"RAY-ERROR {type(e).__name__}: {e}"
            print(f"{name:22s} RAY-ERROR {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            results[name] = f"rows-only ({len(got)} rows, {dt:.1f}s)"
            print(f"{name:22s} rows-only  rows={len(got):7d}  {dt:5.1f}s")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = f"SQL-ERROR: {e}"
            print(f"{name:22s} SQL-ERROR {e}")
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = value_hash(got) == value_hash(exp) if ok_cols else False
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        results[name] = status
        print(f"{name:22s} {status:9s} rows={len(got):6d}/{len(exp):6d} "
              f"cols={'=' if ok_cols else '!'} hash={'=' if ok_hash else '!'} "
              f"{dt:5.1f}s")
        if status == "MISMATCH" and ok_cols:
            merged = got.merge(exp, how="outer", indicator=True,
                               on=list(sorted(got.columns)))
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())
    ray.shutdown()
    bad = [k for k, v in results.items() if v in ("MISMATCH",)
           or str(v).startswith(("RAY-ERROR", "SQL-ERROR"))]
    print("FAILURES:", bad if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
