"""Log-template mining — the Drain-style clustering step a log
pipeline runs BEFORE anyone writes extraction rules.

The reference assumes its JQ queries are already known
(JQExtractor/jqextractor/jqTransformer.go:116-143, compiled from
config); in practice someone has to discover the message shapes first.
This operator mines them: lines are grouped by the classic Drain
prefix key (token count, first token — He et al., ICWS 2017, the
public log-parsing baseline), and within a group every token position
where lines disagree is masked to ``<*>``. The output is one row per
template — the candidate rule set for ``parse.ExtractionRule``.

Deterministic simplification vs full Drain: no similarity threshold or
tree descent — a position is a wildcard iff >1 distinct token appears
there. That makes the result a pure function of the input set
(order-independent, engine-independent), which is what the oracle
contract needs; full Drain's online clustering depends on arrival
order.

Scale shape (the reason this is set-oriented, not a driver loop):
- one ``posexplode`` bounded by tokens-per-line (not corpus size);
- groupBy (group-key, position) with map-side partial aggs — the
  shuffle carries one row per (template-group, position), NOT per
  token occurrence, after partial aggregation;
- the template reassembly groupBy collects ≤ tokens-per-line pieces
  per group — bounded state, no window over corpus rows, nothing on
  the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WILDCARD = "<*>"


def _tokens(text_col: str):
    """Whitespace-normalized tokenization (collapse runs, trim) — the
    oracle-portable form: Spark split and DuckDB regexp_split_to_array
    agree on it once runs are collapsed."""
    return F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")


def mine_templates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per discovered template.

    Returns columns:
      template   string  — tokens joined by ' ', disagreeing positions
                           masked to ``<*>``
      n_tokens   int     — tokens in the template (part of the group key)
      n_lines    bigint  — lines matching the template
      n_wild     bigint  — masked positions
    """
    toks = _tokens(text_col)
    lines = df.select(
        toks.alias("_toks"),
        F.size(toks).alias("n_tokens"),
        toks.getItem(0).alias("_first"),
    )
    tokpos = lines.select(
        "n_tokens", "_first", F.posexplode("_toks").alias("_pos", "_tok")
    )
    # one row per (group, position): how many lines, how many distinct
    # tokens, and the token itself when the position is constant
    perpos = tokpos.groupBy("n_tokens", "_first", "_pos").agg(
        F.count("*").alias("_cnt"),
        F.countDistinct("_tok").alias("_nd"),
        F.min("_tok").alias("_mt"),
    )
    piece = F.when(F.col("_nd") == 1, F.col("_mt")).otherwise(F.lit(WILDCARD))
    return (
        perpos.select(
            "n_tokens",
            "_first",
            "_cnt",
            F.struct(F.col("_pos"), piece.alias("piece")).alias("_pp"),
            (F.col("_nd") > 1).cast("long").alias("_wild"),
        )
        .groupBy("n_tokens", "_first")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("_pp")), lambda s: s["piece"]
                ),
                " ",
            ).alias("template"),
            # every position of a group sees the same line count
            F.max("_cnt").alias("n_lines"),
            F.sum("_wild").alias("n_wild"),
        )
        .select("template", "n_tokens", "n_lines", "n_wild")
    )


def assign_templates(
    df: DataFrame, templates: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach each line's template (broadcast join on the group key —
    the template table is config-sized: one row per message shape, not
    per line)."""
    toks = _tokens(text_col)
    keyed = df.withColumn("_nt", F.size(toks)).withColumn(
        "_ft", toks.getItem(0)
    )
    tmpl = templates.select(
        F.col("n_tokens").alias("_nt"),
        F.split("template", " ").getItem(0).alias("_ft"),
        "template",
    )
    return keyed.join(F.broadcast(tmpl), ["_nt", "_ft"], "left").drop(
        "_nt", "_ft"
    )


def reassemble_multiline(
    df,
    head_pattern: str = "^event=",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
):
    """Multiline log-event reassembly — the stack-trace folding pass
    every log pipeline needs before extraction (a Java traceback or a
    wrapped payload arrives as N physical lines, only the first of
    which matches the event grammar; the reference sees this as the
    consumer's invalid-JSON reject path, Server/dataTypes.go:71-99 —
    here the continuation lines FOLD INTO their head event instead of
    dying in the DLQ).

    Gaps-and-islands on the key exchange: a line is a HEAD iff it
    matches ``head_pattern``; the running head count per stream is the
    event sequence number; one groupBy on (stream, seq) — the SAME
    hash partitioning the running sum just established, so the whole
    operator costs ONE shuffle. Lines are reassembled in line order
    via sort inside a bounded per-event array (events are stack-trace
    sized, never conversation-sized). A stream that STARTS mid-event
    (rotation cut the head off) yields seq 0, flagged head_missing
    rather than silently attached or dropped."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(conv_col).orderBy(order_col)
    seq = F.sum(F.col(text_col).rlike(head_pattern).cast("bigint")).over(w)
    lines = df.select(
        F.col(conv_col), F.col(order_col), F.col(text_col), seq.alias("event_seq")
    )
    return (
        lines.groupBy(conv_col, "event_seq")
        .agg(
            F.min(order_col).alias("start_turn_idx"),
            F.count("*").alias("n_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(order_col).alias("i"),
                                F.col(text_col).alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                "\n",
            ).alias("event_text"),
        )
        .withColumn("head_missing", F.col("event_seq") == 0)
    )


def rate_limit(
    df,
    max_per_window: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    width: str = "1 hour",
):
    """Deterministic per-key rate limiting with an EXACT dropped
    census — the log-shipper throttle (fluentd/vector's per-tag rate
    cap) done audit-correctly: keep the FIRST ``max_per_window`` rows
    of each (key, window) in (ts, id) order, and emit per-grain drop
    counts so downstream aggregates can correct for the sampling
    instead of silently under-counting (the same no-silent-drops
    doctrine as prep.curate's audit table).

    Returns (kept, census): ``kept`` = the admitted rows (plus their
    ``sample_rank``), ``census`` = one row per (key, window) with
    n_total / n_kept / n_dropped — n_kept + n_dropped == n_total
    exactly, and a grain that dropped nothing still appears (audit
    completeness).

    Scale shape: admission runs through the shared two-level top-k —
    partial per-partition cut first, so a hot key's viral window never
    lands in one task before shrinking to <= k x P rows; the census is
    one map-side-combined groupBy on the same (key, window) grain.
    Determinism: (ts, id) is a total order, so reruns admit the same
    rows — the cap is reproducible, not arrival-order-dependent."""
    from pyspark.sql import functions as F

    from ..functions.topk import two_level_topk
    from .aggregate import _width_us, _win

    if max_per_window < 1:
        raise ValueError(
            f"max_per_window must be >= 1, got {max_per_window} — a"
            " non-positive cap would emit a self-contradictory census"
        )
    _width_us(width)  # fail loudly on unparseable/non-positive widths

    src = df.withColumn(
        "_w_start",
        F.unix_micros(_win(ts_col, width, None).start),
    )
    kept = two_level_topk(
        src,
        group_cols=[key_col, "_w_start"],
        order_cols=[F.col(ts_col).asc(), F.col(id_col).asc()],
        k=max_per_window,
        rank_col="sample_rank",
    ).withColumnRenamed("_w_start", "window_start_us")
    census = (
        src.groupBy(F.col(key_col), F.col("_w_start").alias("window_start_us"))
        .agg(F.count("*").alias("n_total"))
        .withColumn("n_kept", F.least(F.col("n_total"), F.lit(max_per_window)))
        .withColumn("n_dropped", F.col("n_total") - F.col("n_kept"))
    )
    return kept, census
