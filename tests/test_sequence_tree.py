"""Golden tests for the general-tree DFS sequencer kernel — each vector
replicates a reference test case (cites into /root/reference/Sequencer/
sequencer/sequencer_test.go and the Sequencer user manual)."""

from __future__ import annotations

import pytest

from otel2pv_spark.operators.sequence_tree import (
    NODE_SCHEMA,
    TreeSequencerConfig,
    sequence_tree,
)


def mk(spark, rows, conv="t1"):
    data = []
    for i, r in enumerate(rows):
        data.append(
            (
                conv,
                r["id"],
                r.get("parent", ""),
                r.get("children", []),
                r.get("type", ""),
                r.get("ts", 0),
                r.get("app", {"eventId": "ev-" + r["id"]}),
                i,
            )
        )
    return spark.createDataFrame(data, NODE_SCHEMA)


def run(spark, rows, cfg=None, conv="t1"):
    out = sequence_tree(mk(spark, rows, conv), cfg)
    return sorted(
        (
            (r.emit_pos, r.node_id, r.prev, r.is_duplicate, r.sequenceable, r.reject_reason)
            for r in out.collect()
        )
    )


def seq_of(res):
    return [(r[1], r[2]) for r in res]


def test_chain(spark):
    """1→[2]: emit 2 (no prev), 1 (prev=2) — sequencer_test.go:843-845."""
    res = run(spark, [{"id": "1", "children": ["2"]}, {"id": "2", "parent": "1"}])
    assert seq_of(res) == [("2", None), ("1", "2")]
    assert all(r[4] for r in res)


def test_seven_node_post_order(spark):
    """DFS order 4,5,2,6,7,3,1 — sequencer_test.go:1225."""
    rows = [
        {"id": "1", "children": ["2", "3"]},
        {"id": "2", "children": ["4", "5"], "parent": "1"},
        {"id": "3", "children": ["6", "7"], "parent": "1"},
        {"id": "4", "parent": "2"},
        {"id": "5", "parent": "2"},
        {"id": "6", "parent": "3"},
        {"id": "7", "parent": "3"},
    ]
    res = run(spark, rows)
    assert [r[1] for r in res] == ["4", "5", "2", "6", "7", "3", "1"]
    assert seq_of(res) == [
        ("4", None), ("5", "4"), ("2", "5"), ("6", "2"),
        ("7", "6"), ("3", "7"), ("1", "3"),
    ]


def test_missing_child_resets_prev(spark):
    """1→[2,3,4], 3 absent: 2(no prev), 4(no prev — dummy reset),
    1(prev=4) — sequencer_test.go:998-1030, sequencer.go:519-529,761-763."""
    rows = [
        {"id": "1", "children": ["2", "3", "4"]},
        {"id": "2", "parent": "1"},
        {"id": "4", "parent": "1"},
    ]
    res = run(spark, rows)
    assert seq_of(res) == [("2", None), ("4", None), ("1", "4")]


def test_equal_duplicates(spark):
    """dup emitted right after original with the same prev —
    sequencer_test.go:847-850, sequencer.go:874-880."""
    rows = [
        {"id": "1", "children": ["2"]},
        {"id": "2", "parent": "1"},
        {"id": "1", "children": ["2"]},  # equal duplicate of node 1
    ]
    res = run(spark, rows)
    assert [(r[1], r[2], r[3]) for r in res] == [
        ("2", None, False), ("1", "2", False), ("1", "2", True),
    ]
    assert all(r[4] for r in res)


def test_unequal_duplicates_unsequenceable(spark):
    """conflicting dup ⇒ all rows, NO prev — sequencer_test.go:851-855."""
    rows = [
        {"id": "1", "children": ["2"]},
        {"id": "2", "parent": "1"},
        {"id": "1", "children": ["2"], "type": "DIFFERENT"},
    ]
    res = run(spark, rows)
    assert [(r[1], r[2], r[3], r[4]) for r in res] == [
        ("1", None, False, False), ("1", None, True, False), ("2", None, False, False),
    ]


def test_self_reference_unsequenceable(spark):
    """1→[1,2] ⇒ unsequenceable — sequencer_test.go:856-860."""
    res = run(spark, [{"id": "1", "children": ["1", "2"]}, {"id": "2", "parent": "1"}])
    assert all(r[2] is None and not r[4] for r in res)


def test_zero_roots_unsequenceable(spark):
    """cycle 1→[2], 2→[1] ⇒ no roots ⇒ unsequenceable — sequencer.go:663-666."""
    res = run(spark, [{"id": "1", "children": ["2"]}, {"id": "2", "children": ["1"]}])
    assert all(r[2] is None and not r[4] for r in res)


def test_multi_root_prev_resets(spark):
    """Each root chain emitted consecutively; prev resets per root —
    sequencer.go:752-773."""
    rows = [
        {"id": "1", "children": ["2"]},
        {"id": "2", "parent": "1"},
        {"id": "3", "children": ["4"]},
        {"id": "4", "parent": "3"},
    ]
    res = run(spark, rows)
    assert seq_of(res) == [("2", None), ("1", "2"), ("4", None), ("3", "4")]


def test_group_applies(spark):
    """first emitted node with appJSON[ident]==value donates share field
    to ALL rows — sequencer_test.go:897-997, sequencer.go:863-887."""
    rows = [
        {"id": "1", "children": ["2"], "app": {"eventType": "start", "jobName": "J-late"}},
        {"id": "2", "parent": "1", "app": {"eventType": "start", "jobName": "J-first"}},
    ]
    cfg = TreeSequencerConfig(group_applies={"jobName": [("eventType", "start")]})
    out = sequence_tree(mk(spark, rows), cfg).collect()
    # node 2 is emitted first (post-order) → its jobName wins everywhere
    assert {r.app_json["jobName"] for r in out} == {"J-first"}


def test_group_applies_first_match_list(spark):
    """multiple configs per share field: first match in emission order
    across the config list — sequencer.go:914-951."""
    rows = [
        {"id": "1", "children": ["2"], "app": {"eventType": "A", "jobName": "JA"}},
        {"id": "2", "parent": "1", "app": {"eventType": "B", "jobName": "JB"}},
    ]
    cfg = TreeSequencerConfig(
        group_applies={"jobName": [("eventType", "A"), ("eventType", "B")]}
    )
    out = sequence_tree(mk(spark, rows), cfg).collect()
    # emission order: 2 (B) then 1 (A) → B captured first
    assert {r.app_json["jobName"] for r in out} == {"JB"}


def test_backwards_link_all(spark):
    """childIds discarded, rebuilt per parent from parentId, ordered by
    timestamp — Sequencer_User_Manual.md:407-493, sequencer.go:622-641."""
    rows = [
        {"id": "1", "ts": 1},
        {"id": "3", "parent": "1", "ts": 30},
        {"id": "2", "parent": "1", "ts": 20},
    ]
    cfg = TreeSequencerConfig(backwards_link_all=True)
    res = run(spark, rows, cfg)
    assert seq_of(res) == [("2", None), ("3", "2"), ("1", "3")]


def test_backwards_link_absent_parent_children_become_roots(spark):
    """children of absent parents become roots — sequencer.go:628-633."""
    rows = [
        {"id": "2", "parent": "missing", "ts": 10},
        {"id": "3", "parent": "missing", "ts": 20},
    ]
    cfg = TreeSequencerConfig(backwards_link_all=True)
    res = run(spark, rows, cfg)
    assert seq_of(res) == [("2", None), ("3", None)]
    assert all(r[4] for r in res)


def test_backwards_link_node_types(spark):
    """only listed nodeTypes rebuilt — sequencer.go:642-662."""
    rows = [
        {"id": "1", "children": ["2"], "type": "plain"},
        {"id": "2", "parent": "1", "type": "BL", "ts": 5},
        {"id": "3", "parent": "2", "ts": 7},
    ]
    cfg = TreeSequencerConfig(backwards_link_node_types=frozenset({"BL"}))
    res = run(spark, rows, cfg)
    assert seq_of(res) == [("3", None), ("2", "3"), ("1", "2")]


def test_backwards_link_zero_timestamp_rejects(spark):
    """child with timestamp==0 under timestamp ordering ⇒ InvalidError ⇒
    whole conversation rejected — sequencer.go:975-977."""
    rows = [{"id": "1", "ts": 1}, {"id": "2", "parent": "1", "ts": 0}]
    cfg = TreeSequencerConfig(backwards_link_all=True)
    res = run(spark, rows, cfg)
    assert all(r[5] and r[5].startswith("order_children_zero_timestamp") for r in res)
    assert all(not r[4] for r in res)


def test_exchange_sort_unstable_parity(spark):
    """the reference's exchange sort is NOT stable: arrival [5a,3,5b,1]
    by ts ends [1,3,5b,5a] — we must reproduce that exactly
    (sequencer.go:982-988)."""
    rows = [
        {"id": "r", "ts": 1},
        {"id": "5a", "parent": "r", "ts": 50},
        {"id": "3x", "parent": "r", "ts": 30},
        {"id": "5b", "parent": "r", "ts": 50},
        {"id": "1x", "parent": "r", "ts": 10},
    ]
    cfg = TreeSequencerConfig(backwards_link_all=True)
    res = run(spark, rows, cfg)
    assert [r[1] for r in res] == ["1x", "3x", "5b", "5a", "r"]


def test_seq_id_map_field(spark):
    """prev value = prev node's appJSON[map field] — sequencer.go:685-702."""
    rows = [{"id": "1", "children": ["2"]}, {"id": "2", "parent": "1"}]
    cfg = TreeSequencerConfig(seq_id_map_field="eventId")
    res = run(spark, rows, cfg)
    assert seq_of(res) == [("2", None), ("1", "ev-2")]


def test_seq_id_map_field_missing_rejects(spark):
    """map field absent on the prev node ⇒ error ⇒ reject
    (sequencer.go:689-699)."""
    rows = [
        {"id": "1", "children": ["2"], "app": {}},
        {"id": "2", "parent": "1", "app": {}},
    ]
    cfg = TreeSequencerConfig(seq_id_map_field="eventId")
    res = run(spark, rows, cfg)
    assert all(r[5] == "seq_id_map_field_missing" for r in res)


def test_cycle_guard(spark):
    """partial cycle reachable from a root would hang the reference; we
    reject deterministically instead."""
    rows = [
        {"id": "1", "children": ["2"]},
        {"id": "2", "children": ["3"], "parent": "1"},
        {"id": "3", "children": ["2"], "parent": "2"},
    ]
    res = run(spark, rows)
    assert all(r[5] == "cycle_detected" for r in res)


def test_many_convs_parallel(spark):
    """kernel is per-group: many conversations in one DataFrame."""
    dfs = [mk(spark, [{"id": "1", "children": ["2"]}, {"id": "2", "parent": "1"}], conv=f"c{i}")
           for i in range(6)]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d)
    out = sequence_tree(df).collect()
    assert len(out) == 12
    assert {r.conv_id for r in out} == {f"c{i}" for i in range(6)}


def test_bucketed_kernel_matches_per_conv(spark, sf_dir):
    """buckets= groups whole conversations per Arrow batch; output must
    be identical to per-conversation grouping."""
    from otel2pv_spark import tree_queries

    nodes = tree_queries.tree_nodes_df(spark, sf_dir)
    from otel2pv_spark.operators import sequence_tree as tree_op

    cols = ["conv_id", "emit_pos", "node_id", "prev", "is_duplicate", "sequenceable"]
    a = sorted(map(tuple, tree_op.sequence_tree(nodes).select(*cols).collect()))
    b = sorted(
        map(tuple, tree_op.sequence_tree(nodes, buckets=7).select(*cols).collect())
    )
    assert a == b and len(a) > 0
