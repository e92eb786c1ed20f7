"""Type-level oracle audit: for every queries() entry with an oracle,
compare the pandas dtype of each column between the Spark result and
the DuckDB oracle result at sf0.01.

The driver's correctness hash is type-sensitive (round 1: DuckDB's
untyped sum() returned HUGEINT where Spark emits BIGINT and the row
values matched but the hash didn't), while tests/test_oracle_parity.py
normalizes via repr and cannot see such mismatches. This script is the
pre-flight that catches them locally.

Usage: python scripts/check_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from otel2pv_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="type-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad = []
    no_oracle = []
    for name in sorted(qs):
        sql = oracles.get(name)
        if sql is None:
            no_oracle.append(name)
            continue
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            ddf = con.execute(sql).df()
        except Exception as exc:  # pragma: no cover - audit tool
            bad.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            continue
        sdt = {c: str(spdf[c].dtype) for c in spdf.columns}
        ddt = {c: str(ddf[c].dtype) for c in ddf.columns}
        if set(sdt) != set(ddt):
            bad.append((name, f"columns differ: {sorted(sdt)} vs {sorted(ddt)}"))
            continue
        diffs = {
            c: (sdt[c], ddt[c]) for c in sdt
            if sdt[c] != ddt[c]
        }
        # Empty frames degrade dtypes to object on both sides; and a
        # genuinely-empty result can't hash-mismatch anyway.
        if diffs and len(spdf) > 0:
            bad.append((name, f"dtype diffs: {diffs} (rows={len(spdf)})"))
        else:
            print(f"ok    {name} ({len(spdf)} rows)")
    for name in no_oracle:
        print(f"skip  {name} (no oracle — rows-only)")
    for name, msg in bad:
        print(f"BAD   {name}: {msg}")
    print(f"\n{len(qs) - len(no_oracle) - len(bad)} ok, "
          f"{len(no_oracle)} rows-only, {len(bad)} suspect")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
