"""Z-order (Morton) clustered data layout — table-maintenance for scan
pruning on TWO dimensions at once.

A 100 TB table is usually range-partitioned/sorted on one key; filters
on a second key then touch every file. Interleaving the bits of two
keys into one Morton value and range-writing on it gives files whose
min/max footers are tight on BOTH keys, so predicate pushdown (parquet
row-group stats / Iceberg file metrics) skips most files for a point
or range query on either dimension — the layout Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => zorder(a, b))``
maintenance action produces. Here it is a pure DataFrame rewrite:
compute z, ``repartitionByRange`` + ``sortWithinPartitions`` on it,
hand the result to ``Catalog.write`` (atomic swap). The z computation
is integer bit math only, reproducible in DuckDB for the oracle.

Reference parity: the reference has no storage-layout layer at all
(sinks are AMQP/HTTP byte streams, `Server/producers.go`); this is a
scale-path addition for the Iceberg target per the north rule.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["zvalue", "cluster_by_zvalue", "zvalue_oracle_terms"]

_MASKS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` to even bit positions (the
    standard magic-mask doubling: x -> (x|x<<8)&m8 ... &m1), pure
    column algebra on BIGINT — whole-stage codegen, no UDF."""
    for shift, mask in _MASKS:
        c = F.shiftleft(c, shift).bitwiseOR(c).bitwiseAND(F.lit(mask))
    return c


def zvalue(x_col, y_col, bits: int = 16) -> Column:
    """Morton-interleave two integer columns into one BIGINT z-value.

    Inputs are reduced to their low ``bits`` bits with pmod (so
    negative keys map deterministically instead of sign-extending);
    bit i of x lands at position 2i, bit i of y at 2i+1. For
    non-integer keys, quantize first (e.g.
    ``unix_micros(ts) / resolution``)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    dom = 1 << bits
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    x = F.pmod(x.cast("long"), F.lit(dom))
    y = F.pmod(y.cast("long"), F.lit(dom))
    return _spread(x).bitwiseOR(F.shiftleft(_spread(y), 1))


def zvalue_oracle_terms(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """DuckDB rendering of the SAME function by a DIFFERENT algorithm
    (per-bit sum instead of magic masks) so the oracle independently
    checks the interleave: z = sum_i ((x>>i)&1)<<2i | ((y>>i)&1)<<2i+1.
    Inputs are pmod-reduced like the Spark side."""
    dom = 1 << bits
    xm = f"((({x_sql}) % {dom} + {dom}) % {dom})"
    ym = f"((({y_sql}) % {dom} + {dom}) % {dom})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zvalue(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str | None = None,
) -> DataFrame:
    """Rewrite ``df`` into z-order: range-partition on the Morton value
    (one range shuffle — same cost as any global sort rewrite, which is
    what a clustering maintenance pass IS) and sort within partitions,
    so each output file covers a compact z-range => tight min/max on
    BOTH source columns. Pass the result to ``Catalog.write``.

    ``z_col`` keeps the z-value as a named column (e.g. for stats /
    manifests); by default it is dropped after ordering."""
    zc = "_zvalue"
    out = df.withColumn(zc, zvalue(x_col, y_col, bits))
    out = (
        out.repartitionByRange(num_partitions, zc)
        if num_partitions
        else out.repartitionByRange(zc)
    )
    out = out.sortWithinPartitions(zc)
    if z_col:
        return out.withColumnRenamed(zc, z_col)
    return out.drop(zc)
