"""Full value-level parity sweep mirroring the driver's CORRECTNESS gate.

For every queries() entry, run the Spark query and its DuckDB oracle at
the given sf dir, canonicalize both results the way the driver does
(columns sorted by name, rows sorted by every column, type-sensitive),
and compare row counts, schemas (column sets + dtypes), and values.

This is the local pre-flight for CORRECTNESS_r{N}.json: a query that
passes here should be green in the driver file.

Usage: python scripts/check_parity.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from otel2pv_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v))
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            ok = np.allclose(
                av.astype("float64"), bv.astype("float64"),
                rtol=1e-9, atol=1e-12, equal_nan=True,
            )
        else:
            an = pd.isna(a[c]); bn = pd.isna(b[c])
            ok = bool((an == bn).all()) and bool((a[c][~an] == b[c][~bn]).all())
        if not ok:
            i = int(np.argmax(~(av == bv))) if len(av) else 0
            return f"col {c} differs (first at row {i}: {av[i]!r} vs {bv[i]!r})"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="parity-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad = []
    n_ok = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        sql = oracles.get(name)
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"SPARK ERROR {type(exc).__name__}: {exc}"))
            continue
        if sql is None:
            print(f"rows-only {name} ({len(spdf)} rows)", flush=True)
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as exc:
            bad.append((name, f"ORACLE ERROR {type(exc).__name__}: {exc}"))
            continue
        if len(spdf) != len(ddf):
            bad.append((name, f"rows {len(spdf)} vs {len(ddf)}"))
            continue
        if set(spdf.columns) != set(ddf.columns):
            bad.append((name, f"cols {sorted(spdf.columns)} vs {sorted(ddf.columns)}"))
            continue
        sdt = {c: str(spdf[c].dtype) for c in spdf.columns}
        ddt = {c: str(ddf[c].dtype) for c in ddf.columns}
        diffs = {c: (sdt[c], ddt[c]) for c in sdt if sdt[c] != ddt[c]}
        if diffs and len(spdf) > 0:
            bad.append((name, f"dtype diffs: {diffs}"))
            continue
        try:
            a, b = _canon(spdf), _canon(ddf)
        except Exception as exc:
            bad.append((name, f"CANON ERROR {type(exc).__name__}: {exc}"))
            continue
        msg = _values_match(a, b)
        if msg:
            bad.append((name, f"VALUES: {msg}"))
        else:
            n_ok += 1
            print(f"ok    {name} ({len(spdf)} rows, {time.time()-t0:.1f}s)", flush=True)
    for name, msg in bad:
        print(f"BAD   {name}: {msg}", flush=True)
    print(f"\n{n_ok} ok, {len(bad)} bad", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
