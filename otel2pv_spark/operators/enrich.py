"""Enrich stage — broadcast-join metadata + sink routing.

The routing analog of MapSinkServer (Server/server.go:141-160): each row
gets a ``sink`` column; downstream the route stage fans out one write
per sink. Dimension tables are tiny → always broadcast (no shuffle;
verified in tests via the physical plan containing BroadcastHashJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    tool_meta: DataFrame,
    role_meta: DataFrame,
) -> DataFrame:
    """Left-join tool/role metadata; route: tool sink wins over role
    default sink (routing-key lookup, server.go:146-156)."""
    out = (
        df.join(F.broadcast(tool_meta), "tool", "left")
        .join(F.broadcast(role_meta), "role", "left")
        .withColumn(
            "sink",
            F.when(
                (F.col("tool") != "") & F.col("tool_sink").isNotNull(), F.col("tool_sink")
            ).otherwise(F.col("default_sink")),
        )
    )
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "valid_from",
    value_cols: list[str] | None = None,
    skip_empty_key: bool = True,
) -> DataFrame:
    """Backward as-of join: each left row picks up the LATEST right row
    with ``right[right_ts] <= left[left_ts]`` for its key (SCD-2 dim
    lookup — "which tool-config version was live at this turn's ts").

    Spark has no as-of join operator, so this is the scalable union-
    window construction rather than a range join:

      1. union left rows (side=1, null payload) with right rows (side=0,
         payload packed into one struct), aligned on (key, ts);
      2. ONE shuffle on the key, sort within partition by (ts, side) —
         a right row at ts == left ts sorts first, so it is visible
         (inclusive backward semantics, same as DuckDB ASOF JOIN);
      3. running ``last(payload, ignorenulls=True)`` carries the most
         recent version forward onto every left row.

    No row explosion (a naive range join produces |left| × versions
    candidates then filters), no broadcast requirement — the dim may be
    arbitrarily large. Rows whose key is null/'' can never match; with
    ``skip_empty_key`` they bypass the shuffle entirely (in transcripts
    2/3 of turns carry no tool — shipping them through the window would
    put most of the table into one hot '' partition).

    Right rows must be unique per (key, right_ts) — true for any sane
    version table; ties among LEFT rows are safe (each left row's own
    payload is null, so ignorenulls skips neighbours).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key_col, right_ts)]
    left_cols = list(left.columns)
    _RESERVED = ("_asof_ts", "_asof_side", "_asof_vals", "_asof_carry")
    clash = (set(value_cols) & set(left_cols)) | (set(_RESERVED) & set(left_cols))
    if clash:
        raise ValueError(
            f"asof_join: columns {sorted(clash)} collide (carried right "
            "columns and the internal _asof_* names must not exist on the "
            "left side) — rename them rather than emit an ambiguous plan"
        )
    ldt = dict(left.dtypes)

    r = right.select(
        F.col(key_col),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_asof_vals"),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in left_cols if c != key_col],
    )
    vals_type = r.schema["_asof_vals"].dataType

    if skip_empty_key:
        # '' only means "no key" for string keys; comparing a numeric
        # key against '' would coerce to NULL and silently drop every
        # row from BOTH branches (NULL is neither true nor false).
        if ldt[key_col] == "string":
            no_key = F.col(key_col).isNull() | (F.col(key_col) == F.lit(""))
        else:
            no_key = F.col(key_col).isNull()
        keyed = left.filter(~no_key)
        unkeyed = left.filter(no_key)
    else:
        keyed, unkeyed = left, None

    l = keyed.select(
        *left_cols,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(vals_type).alias("_asof_vals"),
    )
    u = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(key_col)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        u.withColumn("_asof_carry", F.last("_asof_vals", ignorenulls=True).over(w))
        .filter(F.col("_asof_side") == 1)
        .select(
            *left_cols,
            *[F.col(f"_asof_carry.{c}").alias(c) for c in value_cols],
        )
    )
    if unkeyed is None:
        return matched
    rdt = dict(right.dtypes)
    passthrough = unkeyed.select(
        *left_cols, *[F.lit(None).cast(rdt[c]).alias(c) for c in value_cols]
    )
    return matched.unionByName(passthrough)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "tool",
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_sec: int = 21600,
) -> DataFrame:
    """Point-in-interval (overlap) join: match each left row to every
    right interval with ``key`` equal and ``start <= ts < end``. A row
    can match several overlapping intervals (one output row each).

    Spark has no native interval-join operator — the naive
    ``ON t >= start AND t < end`` plan is a broadcast-nested-loop (or,
    keyed, a sort-merge join that degenerates per hot key). This is the
    standard binning rewrite instead: each interval explodes into the
    fixed-width time bins it covers, each fact row computes its single
    bin, and the match becomes a plain equi-join on (key, bin) with the
    exact predicate re-applied after. Per-task work is bounded by bin
    population, not by interval span or corpus size; a small dim still
    auto-broadcasts (the binning adds nothing), a large dim shuffles
    hash-partitioned on (key, bin) with AQE skew-split available —
    which a range condition would never get.

    ``bin_sec`` trades replication for selectivity: intervals produce
    span/bin_sec copies; facts always exactly one.
    """
    b = int(bin_sec) * 1_000_000
    clash = set(left.columns) & {"_ij_bin"} | set(right.columns) & {"_ij_bin"}
    if clash:
        raise ValueError("interval_join: _ij_bin column name is reserved")
    # Degenerate intervals (end <= start) can never satisfy the
    # exclusive-end predicate, but F.sequence would DESCEND through
    # their reversed span and explode them into bins that join real
    # fact rows before the final filter discards every match — drop
    # them before binning instead.
    right = right.filter(F.col(end_col) > F.col(start_col))
    r = right.withColumn(
        "_ij_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / b),
                # end is EXCLUSIVE: an interval ending exactly on a bin
                # boundary does not cover that bin
                F.floor((F.unix_micros(F.col(end_col).cast("timestamp")) - 1) / b),
            )
        ),
    )
    fact_bin = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / b)
    return (
        left.withColumn("_ij_bin", fact_bin)
        .join(r, on=[key_col, "_ij_bin"], how="inner")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_ij_bin")
    )


def request_response_join(
    requests: DataFrame,
    responses: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    horizon_sec: int = 7200,
    how: str = "inner",
    bin_sec: int | None = None,
) -> DataFrame:
    """Correlate each response row to every request of the same key
    within ``[req_ts, req_ts + horizon)`` — the request/response pairing
    a log pipeline runs constantly (click->purchase attribution,
    call->callback latency, send->ack matching). The batch half of a
    lambda pair: ``streaming.stream_correlate`` is the live port with
    identical semantics, so backfill and live attribution agree.

    Built on the binned equi-join rewrite (``interval_join``): each
    request is a fixed ``horizon``-wide interval, so it lands in at most
    ``horizon/bin + 1`` bins (default bin = horizon: <= 2 copies) and the
    match is a plain (key, bin) hash join — never a broadcast-nested-
    loop, never a per-key cross product; AQE can skew-split a hot key's
    bins. ``how="leftOuter"`` additionally emits requests with NO
    response in the horizon (null response columns) — the timed-out
    requests — via a left-anti on matched request ids (``id_col`` must
    uniquely identify request rows).

    Output: key, req_event_id, req_ts_us, resp_event_id, resp_ts_us,
    latency_us (BIGINT micros end-to-end: exact, engine-portable).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"request_response_join: how={how!r}")
    horizon_us = int(horizon_sec) * 1_000_000
    req = requests.select(
        F.col(key_col),
        F.col(id_col).alias("req_event_id"),
        F.col(ts_col).cast("timestamp").alias("_rr_start"),
        F.timestamp_micros(
            F.unix_micros(F.col(ts_col).cast("timestamp")) + horizon_us
        ).alias("_rr_end"),
    )
    resp = responses.select(
        F.col(key_col),
        F.col(id_col).alias("resp_event_id"),
        F.col(ts_col).cast("timestamp").alias("_rr_ts"),
    )
    pairs = interval_join(
        resp,
        req,
        key_col=key_col,
        ts_col="_rr_ts",
        start_col="_rr_start",
        end_col="_rr_end",
        bin_sec=bin_sec if bin_sec is not None else int(horizon_sec),
    )
    matched = pairs.select(
        key_col,
        "req_event_id",
        F.unix_micros("_rr_start").alias("req_ts_us"),
        "resp_event_id",
        F.unix_micros("_rr_ts").alias("resp_ts_us"),
        (F.unix_micros("_rr_ts") - F.unix_micros("_rr_start")).alias("latency_us"),
    )
    if how == "inner":
        return matched
    resp_id_type = dict(responses.dtypes)[id_col]
    unmatched = (
        req.join(
            matched.select("req_event_id"), "req_event_id", "left_anti"
        ).select(
            key_col,
            "req_event_id",
            F.unix_micros("_rr_start").alias("req_ts_us"),
            F.lit(None).cast(resp_id_type).alias("resp_event_id"),
            F.lit(None).cast("bigint").alias("resp_ts_us"),
            F.lit(None).cast("bigint").alias("latency_us"),
        )
    )
    return matched.unionByName(unmatched)
