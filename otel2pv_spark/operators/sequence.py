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
) -> DataFrame:
    """Assign previous-event linkage per conversation.

    ``seq_id_map_col``: column whose value is used as the prev-link id
    (outputAppFieldSequenceIdMap, sequencer.go:685-702); defaults to
    ``id_col``.
    ``dup_compare_cols``: payload columns deep-compared to decide
    duplicate equality (sequencer.go:373-398).
    """
    idv = F.coalesce(
        F.nullif(F.col(seq_id_map_col), F.lit("")) if seq_id_map_col else F.lit(None),
        F.col(id_col),
    )

    w_dup = Window.partitionBy(conv_col, id_col).orderBy(order_col)
    df = df.withColumn("is_duplicate", F.row_number().over(w_dup) > 1)

    wc = Window.partitionBy(conv_col)
    # conflicting duplicates: same id, >1 distinct payload struct
    if dup_compare_cols:
        payload = F.struct(*[F.col(c) for c in dup_compare_cols])
        w_id = Window.partitionBy(conv_col, id_col)
        df = df.withColumn(
            "_dup_conflict", F.size(F.collect_set(payload).over(w_id)) > 1
        )
    else:
        df = df.withColumn("_dup_conflict", F.lit(False))
    self_ref = F.col(parent_col) == F.col(id_col)
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
    canon_id = F.when(~F.col("is_duplicate"), idv)
    canon_order = F.when(~F.col("is_duplicate"), F.col(order_col))
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


def group_applies(
    df: DataFrame,
    share_col: str,
    identifying_col: str,
    identifying_value: str,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """groupApplies (sequencer.go:124-170,863-887): the FIRST row in
    emission order whose ``identifying_col == identifying_value`` and
    whose ``share_col`` is non-null donates its ``share_col`` value to
    EVERY row of the conversation. One unbounded window, no extra
    shuffle (same conv_id partitioning as sequencing)."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    donor = F.first(
        F.when(
            (F.col(identifying_col) == identifying_value) & F.col(share_col).isNotNull()
            & (F.col(share_col) != ""),
            F.col(share_col),
        ),
        ignorenulls=True,
    ).over(w)
    return df.withColumn(share_col, F.coalesce(donor, F.col(share_col)))
