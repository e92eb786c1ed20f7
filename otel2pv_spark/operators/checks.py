"""Declarative one-pass data-quality checks — the output gate a
production log pipeline runs before publishing a table (the
Deequ/Great-Expectations shape, Spark-first).

A suite of constraints over one DataFrame is evaluated in a SINGLE
aggregation pass: every scalar constraint folds to conditional sums in
one map-side-combined agg, uniqueness folds to count-distinct in the
same agg, and referential-integrity constraints pre-annotate the scan
with broadcast left joins (the dim side is config-sized) so the input
is still read exactly once. At 100 TB that is one column-pruned scan +
one scalar-row shuffle per suite — never a job per constraint.

The reference's pipeline gates rows one at a time (decode gate →
DLQ, Server/consumers.go:776-790); this is the complementary
TABLE-level gate: publish/refuse decisions from corpus-wide facts
(key uniqueness, domain membership, FK coverage) that no per-row
filter can see.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = (
    "not_null",
    "unique",
    "accepted_values",
    "min",
    "max",
    "matches",
    "ref_integrity",
    "row_count_min",
)


@dataclass(frozen=True)
class Check:
    """One declarative constraint.

    kind:
      not_null        — ``column`` has no NULLs
      unique          — ``columns`` form a key over rows where all key
                        parts are non-null (violations = excess rows)
      accepted_values — ``column`` ∈ ``values`` (NULL violates: domain
                        membership implies presence)
      min / max       — ``column`` >= / <= ``limit`` (NULLs pass;
                        pair with not_null to forbid them)
      matches         — ``column`` rlike ``pattern`` (NULL violates)
      ref_integrity   — ``column`` exists in ``ref`` (a named dim
                        registered via run_checks(refs=...)); NULL FK
                        passes, per SQL FK semantics
      row_count_min   — table has at least ``limit`` rows
    """

    name: str
    kind: str
    column: str | None = None
    columns: tuple[str, ...] = ()
    values: tuple = ()
    limit: float | int | None = None
    pattern: str | None = None
    ref: str | None = None

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(f"unknown check kind: {self.kind!r}")


def run_checks(
    df: DataFrame,
    checks: list[Check],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate ``checks`` against ``df`` in one aggregation pass.

    Returns one row per check: (check_name, kind, column, rows,
    violations, passed) with BIGINT counts — ``rows`` is the number of
    rows the constraint examined (table row count; for ``unique`` the
    non-null-key subset), ``violations`` the number failing it.
    """
    refs = refs or {}
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")

    # referential-integrity pre-annotation: one broadcast left join per
    # distinct (ref, column) adds a found-flag column; dims broadcast.
    flag_of: dict[tuple[str, str], str] = {}
    for c in checks:
        if c.kind != "ref_integrity":
            continue
        if c.ref not in refs:
            raise ValueError(f"check {c.name!r}: unknown ref {c.ref!r}")
        key = (c.ref, c.column)
        if key in flag_of:
            continue
        flag = f"_ck_ref_{len(flag_of)}"
        flag_of[key] = flag
        dim = (
            refs[c.ref]
            .select(F.col(c.column).alias("_ck_key"))
            .distinct()
            .withColumn(flag, F.lit(True))
        )
        df = df.join(
            F.broadcast(dim),
            df[c.column] == dim["_ck_key"],
            "left",
        ).drop("_ck_key")

    aggs: list[F.Column] = [F.count("*").alias("_n_rows")]
    for i, c in enumerate(checks):
        col = F.col(c.column) if c.column else None
        if c.kind == "not_null":
            v = F.sum(F.when(col.isNull(), one).otherwise(zero))
        elif c.kind == "unique":
            all_nn = None
            for k in c.columns:
                nn = F.col(k).isNotNull()
                all_nn = nn if all_nn is None else (all_nn & nn)
            aggs.append(
                F.sum(F.when(all_nn, one).otherwise(zero)).alias(f"_rows_{i}")
            )
            v = (
                F.sum(F.when(all_nn, one).otherwise(zero))
                - F.count_distinct(*[F.col(k) for k in c.columns])
            )
        elif c.kind == "accepted_values":
            v = F.sum(
                F.when(col.isNull() | ~col.isin(*c.values), one).otherwise(zero)
            )
        elif c.kind == "min":
            v = F.sum(F.when(col < F.lit(c.limit), one).otherwise(zero))
        elif c.kind == "max":
            v = F.sum(F.when(col > F.lit(c.limit), one).otherwise(zero))
        elif c.kind == "matches":
            v = F.sum(
                F.when(
                    col.isNull() | ~col.rlike(c.pattern), one
                ).otherwise(zero)
            )
        elif c.kind == "ref_integrity":
            flag = flag_of[(c.ref, c.column)]
            v = F.sum(
                F.when(
                    col.isNotNull() & F.col(flag).isNull(), one
                ).otherwise(zero)
            )
        elif c.kind == "row_count_min":
            # resolved after the agg from _n_rows
            v = F.max(zero)
        aggs.append(v.cast("bigint").alias(f"_v_{i}"))

    row = df.agg(*aggs)  # ONE pass; one scalar row

    structs = []
    for i, c in enumerate(checks):
        if c.kind == "row_count_min":
            viol = F.when(
                F.col("_n_rows") < F.lit(int(c.limit)), one
            ).otherwise(zero)
            rows_seen = F.col("_n_rows")
        elif c.kind == "unique":
            viol = F.coalesce(F.col(f"_v_{i}"), zero)
            rows_seen = F.coalesce(F.col(f"_rows_{i}"), zero)
        else:
            viol = F.coalesce(F.col(f"_v_{i}"), zero)
            rows_seen = F.col("_n_rows")
        structs.append(
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.lit(c.kind).alias("kind"),
                F.lit(
                    c.column if c.column else ",".join(c.columns)
                ).alias("column"),
                rows_seen.cast("bigint").alias("rows"),
                viol.cast("bigint").alias("violations"),
                (viol == 0).alias("passed"),
            )
        )
    return row.select(
        F.explode(F.array(*structs)).alias("_c")
    ).select("_c.*")
