"""One-pass table profiling, profile drift, and rollup anomaly flags.

The observability half of the publish gate (operators/checks.py is the
pass/fail half): ``profile_table`` summarizes every column of a table in
ONE aggregation pass; ``profile_drift`` diffs two profiles (this batch
vs a reference batch) on config-sized state with exact integer
cross-multiplied thresholds; ``anomaly_flags`` marks outlier windows in
a metric rollup with an exact-integer trailing z-test.

The reference's pipeline exposes per-stage counters and logs
(Server/server.go metrics plumbing); these operators are the batch
engine's equivalent of watching those counters — but computed from the
data itself, mergeable across batches, and cheap at 10^12 rows:

- profile_table: one column-pruned scan, one scalar-row shuffle (the
  same map-side-combined agg shape as checks.run_checks); output is
  #columns rows.
- profile_drift: a full-outer join of two #columns-row tables —
  driver-safe at any corpus size.
- anomaly_flags: a window over the ALREADY-AGGREGATED rollup (one row
  per (key, bucket)), so the window input is corpus-size-independent;
  the flag itself is exact BIGINT arithmetic (no float threshold
  boundary can flip between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TS = (T.TimestampType, T.TimestampNTZType)

# date_format pattern whose output is identical to DuckDB's
# strftime(ts, '%Y-%m-%d %H:%M:%S.%f') — 6-digit microseconds.
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile of ``df`` in one aggregation pass.

    One row per column: (column, dtype, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str, avg_len). Numeric columns fill
    the ``*_num`` doubles; strings fill ``*_str`` plus ``avg_len``
    (mean length over non-null values, rounded to 6); timestamps are
    formatted to microsecond strings so the profile is
    engine-portable. ``n_distinct`` is exact (count over non-nulls) —
    at 10^12 rows swap in approx_count_distinct for the same plan
    shape with bounded memory.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}

    aggs: list[F.Column] = [F.count("*").alias("_n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        dt = schema[c]
        aggs.append(
            F.sum(F.when(col.isNull(), F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"_null_{i}")
        )
        aggs.append(F.count_distinct(col).cast("bigint").alias(f"_nd_{i}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(col).cast("double").alias(f"_min_{i}"))
            aggs.append(F.max(col).cast("double").alias(f"_max_{i}"))
        elif isinstance(dt, _TS):
            aggs.append(
                F.date_format(F.min(col), _TS_FMT).alias(f"_smin_{i}")
            )
            aggs.append(
                F.date_format(F.max(col), _TS_FMT).alias(f"_smax_{i}")
            )
        else:
            aggs.append(F.min(col).cast("string").alias(f"_smin_{i}"))
            aggs.append(F.max(col).cast("string").alias(f"_smax_{i}"))
        if isinstance(dt, T.StringType):
            aggs.append(
                F.round(F.avg(F.length(col)), 6).alias(f"_len_{i}")
            )

    row = df.agg(*aggs)  # ONE pass; one scalar row

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for i, c in enumerate(cols):
        dt = schema[c]
        num = isinstance(dt, _NUMERIC)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("_n_rows").cast("bigint").alias("n_rows"),
                F.col(f"_null_{i}").alias("n_null"),
                F.col(f"_nd_{i}").alias("n_distinct"),
                (F.col(f"_min_{i}") if num else null_d).alias("min_num"),
                (F.col(f"_max_{i}") if num else null_d).alias("max_num"),
                (null_s if num else F.col(f"_smin_{i}")).alias("min_str"),
                (null_s if num else F.col(f"_smax_{i}")).alias("max_str"),
                (
                    F.col(f"_len_{i}")
                    if isinstance(dt, T.StringType)
                    else null_d
                ).alias("avg_len"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")


def profile_drift(
    cur: DataFrame,
    ref: DataFrame,
    null_drift_ppm: int = 10_000,
    distinct_drift_ppm: int = 500_000,
) -> DataFrame:
    """Diff two ``profile_table`` outputs (current batch vs reference).

    Full-outer join on column name; one row per column with
    ``status`` ('both' / 'added' / 'removed') and exact-integer drift
    flags computed by cross-multiplication in parts-per-million —
    never a float threshold, so the flag cannot flip between engines:

    - ``null_drift``: |null_rate_cur − null_rate_ref| > null_drift_ppm
      ⇔ |n_null_c·n_rows_r − n_null_r·n_rows_c|·1e6
        > ppm·n_rows_c·n_rows_r
    - ``distinct_drift``: same construction over distinct-per-row rates.
    - ``range_drift``: the batch's numeric [min,max] escapes the
      reference's, or (strings) the lexicographic bounds widen — new
      values outside everything the reference batch ever saw.
    - ``dtype_drift``: the column changed type.

    Both inputs are #columns-row tables: the join is driver-trivial at
    any corpus size. At 10^12 rows the ref profile is a stored table
    maintained per published batch, not recomputed.
    """
    c = cur.select(
        F.col("column"),
        *[F.col(x).alias(f"c_{x}") for x in cur.columns if x != "column"],
    )
    r = ref.select(
        F.col("column"),
        *[F.col(x).alias(f"r_{x}") for x in ref.columns if x != "column"],
    )
    j = c.join(r, "column", "full_outer")

    both = F.col("c_n_rows").isNotNull() & F.col("r_n_rows").isNotNull()
    status = (
        F.when(both, F.lit("both"))
        .when(F.col("c_n_rows").isNotNull(), F.lit("added"))
        .otherwise(F.lit("removed"))
    )
    m = F.lit(1_000_000).cast("bigint")

    def _rate_drift(cn, rn, ppm):
        lhs = F.abs(
            F.col(cn) * F.col("r_n_rows") - F.col(rn) * F.col("c_n_rows")
        ) * m
        rhs = F.lit(ppm).cast("bigint") * F.col("c_n_rows") * F.col("r_n_rows")
        return F.when(both, lhs > rhs).otherwise(F.lit(False))

    range_num = (
        F.col("c_min_num") < F.col("r_min_num")
    ) | (F.col("c_max_num") > F.col("r_max_num"))
    range_str = (
        F.col("c_min_str") < F.col("r_min_str")
    ) | (F.col("c_max_str") > F.col("r_max_str"))
    range_drift = F.when(
        both, F.coalesce(range_num, range_str, F.lit(False))
    ).otherwise(F.lit(False))

    return j.select(
        "column",
        status.alias("status"),
        F.coalesce(
            F.col("c_dtype") != F.col("r_dtype"), F.lit(False)
        ).alias("dtype_drift"),
        _rate_drift("c_n_null", "r_n_null", null_drift_ppm).alias(
            "null_drift"
        ),
        _rate_drift("c_n_distinct", "r_n_distinct", distinct_drift_ppm).alias(
            "distinct_drift"
        ),
        range_drift.alias("range_drift"),
    )


def anomaly_flags(
    rollup: DataFrame,
    value_col: str,
    by: str,
    order_col: str,
    trail: int = 4,
    nsigma: int = 3,
) -> DataFrame:
    """Flag windows whose BIGINT metric deviates > ``nsigma`` trailing
    standard deviations from the previous ``trail`` windows of the same
    key — the log-spike detector a pipeline runs over its per-sink
    rollups.

    The test is EXACT integer arithmetic (both sides of
    |x − mean| > nsigma·stddev_samp squared and cleared of
    denominators), so no float rounding can flip a flag between
    engines; ``zscore`` is additionally emitted as a rounded double
    for humans. Rows without a full trailing window are flag=false
    with zscore null (no baseline yet).

    With S = Σ trailing values, Q = Σ trailing values², k = trail:
      flag ⇔ (k·x − S)²·(k−1) > nsigma²·k·(k·Q − S²)
    Overflow note: BIGINT-safe while k·x² < 2^63/k — counts up to
    ~10^8 per window at k≤16; beyond that move the same identity to
    DECIMAL(38,0).

    Scale shape: input is an aggregate rollup (one row per
    (key, bucket)); the window shuffles #keys×#buckets rows, never
    corpus rows, and partitions by key so no single task sees more
    than one key's history.
    """
    w = (
        Window.partitionBy(by)
        .orderBy(order_col)
        .rowsBetween(-trail, -1)
    )
    x = F.col(value_col).cast("bigint")
    k = F.count(value_col).over(w).cast("bigint")
    s = F.sum(x).over(w)
    q = F.sum(x * x).over(w)

    kk = F.lit(trail).cast("bigint")
    lhs_i = (kk * x - s) * (kk * x - s) * (kk - 1)
    rhs_i = F.lit(nsigma * nsigma).cast("bigint") * kk * (kk * q - s * s)
    full = k == kk
    var_pos = (kk * q - s * s) > 0

    zscore = F.when(
        full & var_pos,
        F.round(
            (kk * x - s).cast("double")
            / F.sqrt((kk * (kk * q - s * s)).cast("double") / (kk - 1)),
            6,
        ),
    )
    flag = F.when(
        full,
        F.when(var_pos, lhs_i > rhs_i).otherwise(kk * x != s),
    ).otherwise(F.lit(False))
    return rollup.select(
        by,
        order_col,
        x.alias(value_col),
        k.alias("trail_n"),
        zscore.alias("zscore"),
        flag.alias("anomaly"),
    )


def key_skew(
    df: DataFrame,
    key: str,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` hottest values of ``key`` with their corpus share —
    the diagnostic that decides whether the skew path
    (``hot_block_size``, salting, AQE skew-join) is needed BEFORE a
    job hits it: a key holding >1% of 10^12 rows is a 10^10-row window
    partition.

    One map-side-combined groupBy(key) (a hot key moves O(tasks)
    partial counts, never its rows), a one-row total joined by
    broadcast, then the shared two-level top-k — the global final
    window sees <= k x P pre-ranked rows, never the key census.
    share_ppm is exact integer floor(count * 1e6 / total).
    """
    from ..functions.topk import two_level_topk

    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    shared = counts.join(F.broadcast(total))
    ranked = two_level_topk(
        shared,
        [],
        [F.col("n").desc(), F.col(key).asc()],
        k,
    )
    return ranked.select(
        key,
        F.col("n").cast("bigint").alias("n"),
        F.floor(F.col("n") * F.lit(1_000_000) / F.col("_total"))
        .cast("bigint")
        .alias("share_ppm"),
        F.col("rank").cast("int").alias("rank"),
    )


def suggest_checks(profile: DataFrame, domain_max: int = 20) -> DataFrame:
    """Constraint suggestion from a ``profile_table`` output — the
    bootstrap half of the quality gate (profile a known-good batch
    once, run the suggested suite against every future batch):

    - 0 nulls observed            → suggest ``not_null``
    - n_distinct == n_rows        → suggest ``unique``
    - string with <= domain_max
      distinct values             → suggest ``accepted_values``
    - numeric                     → suggest ``min`` at the observed min

    Pure column algebra over the #columns-row profile (driver-trivial
    at any corpus size); emits (column, kind, param) rows directly
    consumable as operators/checks.py Check specs. Suggestions are
    observations, not guarantees — gate them through a human or a
    holdout batch before enforcement (the Deequ caveat).
    """
    p = profile
    rows_nonnull = F.col("n_rows") - F.col("n_null")
    suggestions = [
        F.when(
            (F.col("n_null") == 0) & (F.col("n_rows") > 0),
            F.struct(
                F.lit("not_null").alias("kind"), F.lit("").alias("param")
            ),
        ),
        F.when(
            (F.col("n_distinct") == rows_nonnull) & (F.col("n_rows") > 0),
            F.struct(F.lit("unique").alias("kind"), F.lit("").alias("param")),
        ),
        F.when(
            (F.col("dtype") == "string")
            & (F.col("n_distinct") <= domain_max)
            & (F.col("n_distinct") > 0),
            F.struct(
                F.lit("accepted_values").alias("kind"),
                F.concat(
                    F.lit("n="), F.col("n_distinct").cast("string")
                ).alias("param"),
            ),
        ),
        F.when(
            F.col("min_num").isNotNull(),
            F.struct(
                F.lit("min").alias("kind"),
                F.col("min_num").cast("string").alias("param"),
            ),
        ),
    ]
    out = p.select(
        "column",
        F.explode(
            F.filter(F.array(*suggestions), lambda s: s.isNotNull())
        ).alias("_s"),
    )
    return out.select(
        "column", F.col("_s.kind").alias("kind"), F.col("_s.param").alias("param")
    )
