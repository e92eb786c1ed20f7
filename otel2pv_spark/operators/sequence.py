"""Sequence stage — the Sequencer analog (window fast path).

The reference linearizes each tree by post-order DFS and writes a
previous-event link into each node's appJSON
(Sequencer/sequencer/sequencer.go:491-538, 812-898). For straight-line
transcripts (each turn's parent is the previous turn) the DFS emission
order IS turn order, so the whole operator collapses to ONE window:

    Window.partitionBy(conv_id).orderBy(turn_idx)

— a single shuffle on conv_id, sort within partition, lag() for the
prev link. This is the 100 TB hot path: sort-based window spills
gracefully, AQE sizes the shuffle, and a hot conversation is bounded by
per-conversation length (salting applies to the order-free stages; the
window itself must see a whole conversation, like the reference's
actor-per-tree, groupandverify.go:440-479).

Semantics carried over (file:line into /root/reference):
- prev value = previous node's appJSON[sequence-id field] else nodeId
  (sequencer.go:685-731)  → lag(coalesce(map_col, node_id)).
- array vs string typed output field (sequencer.go:718-731, default
  array :251).
- first node of a chain gets NO prev (sequencer.go:752-773).
- missing-turn gap resets prev to null — the missing-child dummy
  semantics (sequencer.go:519-529,761-763): a gap in turn_idx means the
  next emitted row has no prev link.
- unsequenceable gating (sequencer.go:588-614,663-666): self-reference
  or conflicting duplicates ⇒ whole conversation emitted with NO prev
  fields (sequencer.go:788-799). Order stays (conv_id, turn_idx) — a
  deterministic refinement of the reference's Go-map order.
- duplicate rows (same conv_id+event_id): first is canonical, later
  ones flagged is_duplicate and inherit the SAME prev
  (sequencer.go:874-880); conflicting duplicates (differing payload)
  make the conversation unsequenceable (sequencer.go:572-583).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_window(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    id_col: str = "event_id",
    parent_col: str = "parent_event_id",
    seq_id_map_col: str | None = None,
    out_col: str = "previous_event_ids",
    array_mode: bool = True,
    gap_reset: bool = True,
    dup_compare_cols: tuple[str, ...] = (),
    ok_col: str | None = None,
) -> DataFrame:
    """Assign previous-event linkage per conversation.

    ``seq_id_map_col``: column whose value is used as the prev-link id
    (outputAppFieldSequenceIdMap, sequencer.go:685-702); defaults to
    ``id_col``.
    ``dup_compare_cols``: payload columns deep-compared to decide
    duplicate equality (sequencer.go:373-398).
    ``ok_col``: optional boolean column gating row validity (the
    single-pass pipeline runs the sequencer BEFORE splitting off parse
    rejects, so one plan makes one pass — invalid rows neither donate
    prev ids nor trip the conflict/self-reference flags, exactly as if
    they had been filtered out first; their own output values are
    meaningless and they route to the rejects sink downstream).
    """
    ok = F.col(ok_col) if ok_col else F.lit(True)
    idv = F.coalesce(
        F.nullif(F.col(seq_id_map_col), F.lit("")) if seq_id_map_col else F.lit(None),
        F.col(id_col),
    )

    # Duplicate ranking partitions on the ok-GATED id: a reject row whose
    # id regex happened to match must not outrank (and wrongly flag) a
    # valid row sharing its event_id — rejects fall into the null group,
    # exactly as if they had been filtered out before sequencing. The
    # gate is materialized ONCE (`_gid`) so both duplicate windows key
    # the same attribute and share a single in-partition sort (two
    # anonymous when()-expressions would each get their own projection
    # and their own sort).
    df = df.withColumn("_gid", F.when(ok, F.col(id_col)))
    w_dup = Window.partitionBy(conv_col, "_gid").orderBy(order_col)
    df = df.withColumn("is_duplicate", F.row_number().over(w_dup) > 1)

    wc = Window.partitionBy(conv_col)
    # conflicting duplicates: same id, >1 distinct payload struct
    # (collect_set skips nulls, so non-ok rows never contribute)
    if dup_compare_cols:
        payload = F.when(ok, F.struct(*[F.col(c) for c in dup_compare_cols]))
        w_id = Window.partitionBy(conv_col, "_gid")
        df = df.withColumn(
            "_dup_conflict", F.size(F.collect_set(payload).over(w_id)) > 1
        )
    else:
        df = df.withColumn("_dup_conflict", F.lit(False))
    df = df.drop("_gid")
    # eqNullSafe: with NULL parent ids a three-valued `==` would make
    # self_ref NULL, the max() over the conversation NULL, and
    # sequenceable NULL — silently suppressing every prev link
    self_ref = ok & F.col(parent_col).eqNullSafe(F.col(id_col))
    df = df.withColumn(
        "sequenceable",
        ~F.max(F.col("_dup_conflict") | self_ref).over(wc),
    ).drop("_dup_conflict")

    # Emission window: RANGE frame up to the previous *turn value* —
    # rows sharing a turn_idx (duplicates) see the same frame, so a
    # duplicate inherits exactly its canonical row's prev
    # (sequencer.go:874-880). Canonical rows alone donate ids.
    w_range = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    canon_id = F.when(~F.col("is_duplicate") & ok, idv)
    canon_order = F.when(~F.col("is_duplicate") & ok, F.col(order_col))
    prev = F.last(canon_id, ignorenulls=True).over(w_range)
    if gap_reset:
        prev_order = F.last(canon_order, ignorenulls=True).over(w_range)
        # a turn_idx gap == missing-child dummy → prev reset
        prev = F.when(F.col(order_col) - prev_order <= 1, prev)
    prev = F.when(F.col("sequenceable"), prev)

    if array_mode:
        out = F.when(prev.isNotNull(), F.array(prev))
    else:
        out = prev
    return df.withColumn(out_col, out)


def sequence_window_salted(
    df: DataFrame,
    block_size: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    id_col: str = "event_id",
    parent_col: str = "parent_event_id",
    seq_id_map_col: str | None = None,
    out_col: str = "previous_event_ids",
    array_mode: bool = True,
    gap_reset: bool = True,
    dup_compare_cols: tuple[str, ...] = (),
    ok_col: str | None = None,
) -> DataFrame:
    """``sequence_window`` with per-task work bounded by ``block_size``
    instead of conversation length — the explicit skew path for hot
    conversations (the reference's actor-per-tree saturates the same
    way a single window partition does; SURVEY §4.1/§7.4).

    Identical output to ``sequence_window``; the mechanics differ:

    - rows are windowed over ``(conv_id, block)`` where
      ``block = floor(turn_idx / block_size)`` — a RANGE-contiguous
      salt, so the in-block prev link is exact;
    - each block's carry-in (the last canonical id/turn of any PRIOR
      block) comes from a per-(conv, block) aggregate — thousands of
      rows per conversation at most — cumulated with a tiny window and
      joined back on the skew-free (conv, block) key, so no task ever
      sees a whole hot conversation;
    - the per-conversation ``sequenceable`` flag becomes a groupBy
      aggregate + shuffle join (AQE skew-join splits the hot key)
      instead of an unbounded window.

    The (conv, event_id) duplicate windows are unchanged: their group
    cardinality is per-event, already skew-free.

    ``ok_col`` gates row validity exactly as in ``sequence_window`` (the
    single-pass pipeline sequences before splitting off rejects).
    """
    ok = F.col(ok_col) if ok_col else F.lit(True)
    idv = F.coalesce(
        F.nullif(F.col(seq_id_map_col), F.lit("")) if seq_id_map_col else F.lit(None),
        F.col(id_col),
    )

    # ok-gated id partitioning, same contract (and same shared-sort
    # materialization) as sequence_window
    df = df.withColumn("_gid", F.when(ok, F.col(id_col)))
    w_dup = Window.partitionBy(conv_col, "_gid").orderBy(order_col)
    df = df.withColumn("is_duplicate", F.row_number().over(w_dup) > 1)

    if dup_compare_cols:
        payload = F.when(ok, F.struct(*[F.col(c) for c in dup_compare_cols]))
        w_id = Window.partitionBy(conv_col, "_gid")
        df = df.withColumn(
            "_dup_conflict", F.size(F.collect_set(payload).over(w_id)) > 1
        )
    else:
        df = df.withColumn("_dup_conflict", F.lit(False))
    df = df.drop("_gid")
    # eqNullSafe: with NULL parent ids a three-valued `==` would make
    # self_ref NULL, the max() over the conversation NULL, and
    # sequenceable NULL — silently suppressing every prev link
    self_ref = ok & F.col(parent_col).eqNullSafe(F.col(id_col))

    # plain shuffle join, NOT broadcast: conv_flags has one row per
    # conversation (billions at full scale). The join key is the skewed
    # conv_id, but unlike a window AQE's skew-join can split a hot key's
    # partition for a join, so this stays balanced.
    conv_flags = (
        df.groupBy(conv_col)
        .agg((~F.max(F.col("_dup_conflict") | self_ref)).alias("sequenceable"))
    )
    df = df.join(conv_flags, conv_col, "left").drop("_dup_conflict")

    blk = F.floor(F.col(order_col) / block_size)
    df = df.withColumn("_blk", blk)

    canon_id = F.when(~F.col("is_duplicate") & ok, idv)
    canon_order = F.when(~F.col("is_duplicate") & ok, F.col(order_col))

    # carry-in per block: last canonical (id, turn) over all prior blocks
    blk_last = (
        df.filter(~F.col("is_duplicate") & ok)
        .groupBy(conv_col, "_blk")
        .agg(
            F.max_by(idv, F.col(order_col)).alias("_blk_last_id"),
            F.max(order_col).alias("_blk_last_ord"),
        )
    )
    w_carry = (
        Window.partitionBy(conv_col)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = blk_last.select(
        conv_col,
        "_blk",
        F.last("_blk_last_id", ignorenulls=True).over(w_carry).alias("_carry_id"),
        F.last("_blk_last_ord", ignorenulls=True).over(w_carry).alias("_carry_ord"),
    )
    # block-grained key: a hot conversation's rows spread across its
    # blocks, so this join is skew-free by construction
    df = df.join(carry, [conv_col, "_blk"], "left")

    w_range = (
        Window.partitionBy(conv_col, "_blk")
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(
        F.last(canon_id, ignorenulls=True).over(w_range), F.col("_carry_id")
    )
    if gap_reset:
        prev_order = F.coalesce(
            F.last(canon_order, ignorenulls=True).over(w_range), F.col("_carry_ord")
        )
        prev = F.when(F.col(order_col) - prev_order <= 1, prev)
    prev = F.when(F.col("sequenceable"), prev)

    if array_mode:
        out = F.when(prev.isNotNull(), F.array(prev))
    else:
        out = prev
    return df.withColumn(out_col, out).drop(
        "_blk", "_carry_id", "_carry_ord"
    )


def group_applies(
    df: DataFrame,
    share_col: str,
    identifying_col: str,
    identifying_value: str,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ok_col: str | None = None,
) -> DataFrame:
    """groupApplies (sequencer.go:124-170,863-887): the FIRST row in
    emission order whose ``identifying_col == identifying_value`` and
    whose ``share_col`` is non-null donates its ``share_col`` value to
    EVERY row of the conversation. One unbounded window, no extra
    shuffle (same conv_id partitioning as sequencing).

    ``ok_col`` gates donor eligibility: in the single-pass plan this
    operator sees parse-reject rows too, and a reject whose extracted
    fields happen to match the identifying predicate must not donate —
    the reference only ever sees valid rows (rejects died at the
    consumer, Server/consumers.go:776-827)."""
    ok = F.col(ok_col) if ok_col else F.lit(True)
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    donor = F.first(
        F.when(
            ok
            & (F.col(identifying_col) == identifying_value)
            & F.col(share_col).isNotNull()
            & (F.col(share_col) != ""),
            F.col(share_col),
        ),
        ignorenulls=True,
    ).over(w)
    return df.withColumn(share_col, F.coalesce(donor, F.col(share_col)))
