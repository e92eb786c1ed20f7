"""Verify stage — the GroupAndVerify analog, as pure DataFrame ops.

The reference verifies each tree with a per-tree actor holding a
bidirectional balance map: every parent→child edge must be seen both
forward (parent's childIds) and backward (child's parentId) before the
tree is verified (GroupAndVerify/groupandverify/groupandverify.go:
555-671, holder 684-802). Re-expressed set-orientedly:

    forward  = explode(child_ids)          → (conv, parent, child, fwd)
    backward = rows with parent_id != ''   → (conv, parent, child, bwd)
    balance  = full_outer join on (conv, parent, child)
    node ok  = fwd AND bwd for every edge of the node
    conv ok  = AND over all its edges               (one shuffle each)

parentVerifySet exception (groupandverify.go:148-183,632-650, manual
GroupAndVerify_User_Manual.md:142-149): node types whose children are
known only by backward links — such a parent must have EMPTY child_ids
(violation ⇒ reject) and verifies iff count(distinct backward children)
== its configured expected_children (tiny broadcast-joined lookup).

Dangling parent refs (child points at a parent that never arrived) are
"placeholders": pruned from output, tree unverified
(groupandverify.go:855-859,913-917).

Duplicates (same conv+node id): first kept as canonical, later flagged
(groupandverify.go:839-861); payload inequality surfaced as
``dup_mismatch`` (the reference only logs it, :816-826).

Batch-mode notes: the 2 s verification timeout (G5, :211,873-919), the
early-exit (G6) and MaxTrees backpressure (G7) are streaming-only
concerns — a batch partition is complete by construction; the streaming
module documents the applyInPandasWithState analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def verify_trees(
    nodes: DataFrame,
    conv_col: str = "conv_id",
    node_col: str = "node_id",
    parent_col: str = "parent_id",
    children_col: str = "child_ids",
    parent_verify_types: DataFrame | None = None,
    node_type_col: str = "node_type",
    arrival_col: str | None = None,
    payload_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(per_conv, rejects)``:

    per_conv: (conv_id, n_nodes, n_dup_nodes, dup_mismatch, verified)
    rejects:  parentVerifySet violations (non-empty child_ids on a
              backward-link-only node type).

    ``arrival_col``: message-arrival order; when given, the canonical
    copy of a duplicated node is the FIRST arrival, exactly like the
    reference (groupandverify.go:839-861). Without it the choice among
    duplicates is arbitrary (fine when payloads are equal).

    ``payload_cols``: extra columns deep-compared for ``dup_mismatch``
    beyond the link fields — the reference's duplicate inequality check
    compares the FULL node incl. nodeType/timestamp/appJSON
    (groupandverify.go:816-826). Map-typed payloads should be passed
    pre-serialized (e.g. to_json of sorted entries) since distinct-agg
    over maps is unsupported.
    """
    # -- duplicates: canonical = first arrival within (conv,node)
    w_dup = Window.partitionBy(conv_col, node_col).orderBy(
        F.col(arrival_col) if arrival_col else F.col(node_col)
    )
    flagged = nodes.withColumn("_rn", F.row_number().over(w_dup))
    canon = flagged.filter(F.col("_rn") == 1).drop("_rn")

    dup_struct = F.struct(
        parent_col, children_col, *[F.col(c) for c in payload_cols]
    )
    dup_stats = (
        flagged.groupBy(conv_col, node_col)
        .agg(
            F.count("*").alias("_n"),
            F.count_distinct(dup_struct).alias("_distinct"),
        )
        .groupBy(conv_col)
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.when(F.col("_n") > 1, 1).otherwise(0)).alias("n_dup_nodes"),
            F.max(F.col("_distinct") > 1).alias("dup_mismatch"),
        )
    )

    # -- parentVerifySet handling
    if parent_verify_types is not None:
        canon = canon.join(
            F.broadcast(parent_verify_types), on=node_type_col, how="left"
        )
        is_pvs = F.col("expected_children").isNotNull()
        rejects = canon.filter(is_pvs & (F.size(F.coalesce(F.col(children_col), F.array())) > 0)).select(
            conv_col, node_col, F.lit("parent_verify_set_nonempty_children").alias("reject_reason")
        )
    else:
        canon = canon.withColumn("expected_children", F.lit(None).cast("int"))
        is_pvs = F.lit(False)
        rejects = canon.limit(0).select(
            F.col(conv_col), F.col(node_col), F.lit("").alias("reject_reason")
        )

    # -- edge sets (canonical nodes only, like the reference's node map)
    fwd = canon.select(
        F.col(conv_col),
        F.col(node_col).alias("parent"),
        F.explode(children_col).alias("child"),
    ).withColumn("fwd", F.lit(True))
    bwd = canon.filter((F.col(parent_col).isNotNull()) & (F.col(parent_col) != "")).select(
        F.col(conv_col),
        F.col(parent_col).alias("parent"),
        F.col(node_col).alias("child"),
    ).withColumn("bwd", F.lit(True))

    balance = fwd.join(bwd, [conv_col, "parent", "child"], "full_outer").select(
        conv_col,
        "parent",
        "child",
        F.coalesce("fwd", F.lit(False)).alias("fwd"),
        F.coalesce("bwd", F.lit(False)).alias("bwd"),
    )

    # parentVerifySet parents: skip the fwd requirement, count backward kids
    pvs_parents = canon.filter(is_pvs).select(
        F.col(conv_col), F.col(node_col).alias("parent"), "expected_children"
    )
    # NOT broadcast: pvs_parents is data-sized (one row per pvs-typed
    # node across the input, not per configured TYPE) — forcing it to
    # the driver would OOM at scale. Both sides key on (conv, parent);
    # AQE picks the strategy (and broadcasts small cases by itself).
    balance = balance.join(pvs_parents.select(conv_col, "parent").withColumn("_pvs", F.lit(True)),
                           [conv_col, "parent"], "left")
    edge_ok = F.when(F.col("_pvs"), F.col("bwd")).otherwise(F.col("fwd") & F.col("bwd"))

    # dangling parents: backward edge whose parent is not a real node
    real_parents = canon.select(F.col(conv_col), F.col(node_col).alias("parent")).withColumn(
        "_real", F.lit(True)
    )
    balance = balance.join(real_parents, [conv_col, "parent"], "left")
    edge_ok = edge_ok & F.coalesce(F.col("_real"), F.lit(False))

    per_conv_edges = balance.groupBy(conv_col).agg(
        F.min(edge_ok).alias("_edges_ok")
    )

    # parentVerifySet count rule. Starts from pvs_parents (NOT the
    # observed-edge groups) so a pvs node with ZERO backward children
    # still fails its count check — the reference only verifies such a
    # node once exactly expectedChildren distinct children have
    # referenced it (groupandverify.go:657-664).
    bwd_counts = (
        balance.filter(F.col("_pvs") & F.col("bwd"))
        .groupBy(conv_col, "parent")
        .agg(F.count_distinct("child").alias("_nkids"))
    )
    pvs_counts = (
        pvs_parents.join(bwd_counts, [conv_col, "parent"], "left")
        .groupBy(conv_col)
        .agg(
            F.min(
                F.coalesce(F.col("_nkids"), F.lit(0)) == F.col("expected_children")
            ).alias("_pvs_ok")
        )
    )

    per_conv = (
        dup_stats.join(per_conv_edges, conv_col, "left")
        .join(pvs_counts, conv_col, "left")
        .select(
            conv_col,
            "n_nodes",
            "n_dup_nodes",
            F.coalesce("dup_mismatch", F.lit(False)).alias("dup_mismatch"),
            (
                F.coalesce(F.col("_edges_ok"), F.lit(True))
                & F.coalesce(F.col("_pvs_ok"), F.lit(True))
            ).alias("verified"),
        )
    )
    return per_conv, rejects


def parent_verify_counts(
    nodes: DataFrame,
    parent_verify_types: DataFrame,
    conv_col: str = "conv_id",
    node_col: str = "node_id",
    parent_col: str = "parent_id",
    node_type_col: str = "node_type",
    arrival_col: str | None = None,
) -> DataFrame:
    """Per-parentVerifySet-parent backward-children accounting (G4):
    (conv_id, parent, n_bwd_children, expected_children, pvs_ok) — the
    observable the reference's CheckVerified gates on
    (groupandverify.go:632-664): a pvs parent verifies iff the count of
    DISTINCT canonical children referencing it backward equals its
    configured expectedChildren. ``parent_verify_types`` is the tiny
    (node_type, expected_children) config — broadcast."""
    w_dup = Window.partitionBy(conv_col, node_col).orderBy(
        F.col(arrival_col) if arrival_col else F.col(node_col)
    )
    canon = (
        nodes.withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    pvs = canon.join(F.broadcast(parent_verify_types), on=node_type_col).select(
        F.col(conv_col), F.col(node_col).alias("parent"), "expected_children"
    )
    bwd = canon.filter(
        F.col(parent_col).isNotNull() & (F.col(parent_col) != "")
    ).select(F.col(conv_col), F.col(parent_col).alias("parent"), F.col(node_col).alias("child"))
    counts = bwd.groupBy(conv_col, "parent").agg(
        F.count_distinct("child").alias("n_bwd_children")
    )
    return pvs.join(counts, [conv_col, "parent"], "left").select(
        conv_col,
        "parent",
        F.coalesce("n_bwd_children", F.lit(0)).alias("n_bwd_children"),
        "expected_children",
        (
            F.coalesce("n_bwd_children", F.lit(0)) == F.col("expected_children")
        ).alias("pvs_ok"),
    )


def chain_verify_salted(
    parsed: DataFrame,
    block_size: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    id_col: str = "event_id",
    parent_col: str = "parent_event_id",
) -> DataFrame:
    """``chain_verify`` with per-task work bounded by ``block_size`` —
    the hot-conversation skew path (same block+carry technique as
    ``sequence_window_salted``): link checks window over
    (conv, floor(turn/B)) blocks; each block's first row checks against
    the prior block's last id, delivered by a tiny per-block aggregate;
    the per-conversation verdict is a plain groupBy aggregate."""
    blk = F.floor(F.col(order_col) / block_size)
    df = parsed.withColumn("_blk", blk)

    blk_last = df.groupBy(conv_col, "_blk").agg(
        F.max_by(id_col, F.col(order_col)).alias("_blk_last_id")
    )
    w_carry = (
        Window.partitionBy(conv_col).orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = blk_last.select(
        conv_col, "_blk",
        F.last("_blk_last_id", ignorenulls=True).over(w_carry).alias("_carry_id"),
    )
    # block-grained key: skew-free by construction
    df = df.join(carry, [conv_col, "_blk"], "left")

    w = Window.partitionBy(conv_col, "_blk").orderBy(order_col)
    prev_id = F.lag(id_col).over(w)
    first_in_blk = F.row_number().over(w) == 1
    link_ok = (
        F.when(
            first_in_blk,
            F.when(F.col("_carry_id").isNull(), F.col(parent_col) == "")
            .otherwise(F.col(parent_col) == F.col("_carry_id")),
        )
        .otherwise(F.col(parent_col) == prev_id)
    )
    per_row = df.withColumn("_link_ok", link_ok & F.col("parse_ok"))
    return per_row.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.min("_link_ok").alias("verified"),
    )


def chain_verify_flags(
    parsed: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    id_col: str = "event_id",
    parent_col: str = "parent_event_id",
    out_col: str = "verified",
) -> DataFrame:
    """``chain_verify`` as a pure window: the per-conversation verdict
    is attached to every row as ``out_col`` instead of being aggregated
    and joined back. Both windows share the one conv_id partitioning,
    so in the single-pass pipeline plan this adds NO branch, NO join
    and NO extra shuffle — the verdict rides the same exchange the
    sequencer uses (the reference computes it in the same per-tree
    actor, groupandverify.go:657-671)."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    wc = Window.partitionBy(conv_col)
    prev_id = F.lag(id_col).over(w)
    link_ok = F.when(F.row_number().over(w) == 1, F.col(parent_col) == "").otherwise(
        F.col(parent_col) == prev_id
    )
    return parsed.withColumn(
        out_col, F.min(link_ok & F.col("parse_ok")).over(wc)
    )


def chain_verify(
    parsed: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    id_col: str = "event_id",
    parent_col: str = "parent_event_id",
) -> DataFrame:
    """Straight-line specialization over parsed transcripts: a
    conversation is verified iff every parseable non-first turn's
    parent id equals the previous parseable turn's id AND no turn
    failed to parse (a garbled turn breaks the chain — the missing-node
    case). One window over the same conv_id partitioning."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    prev_id = F.lag(id_col).over(w)
    link_ok = F.when(F.row_number().over(w) == 1, F.col(parent_col) == "").otherwise(
        F.col(parent_col) == prev_id
    )
    per_row = parsed.withColumn("_link_ok", link_ok & F.col("parse_ok"))
    return per_row.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.min("_link_ok").alias("verified"),
    )
