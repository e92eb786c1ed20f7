"""Golden tests for tree verification — replicating GroupAndVerify
scenarios (cites into /root/reference/GroupAndVerify/groupandverify/)."""

from __future__ import annotations

from otel2pv_spark.operators.sequence_tree import NODE_SCHEMA
from otel2pv_spark.operators.verify import verify_trees


def mk(spark, rows, conv="t1"):
    data = []
    for i, r in enumerate(rows):
        data.append(
            (conv, r["id"], r.get("parent", ""), r.get("children", []),
             r.get("type", ""), r.get("ts", 0), {}, i)
        )
    return spark.createDataFrame(data, NODE_SCHEMA)


def pvs(spark, pairs):
    return spark.createDataFrame(pairs, "node_type string, expected_children int")


def one(df, conv="t1"):
    rows = {r.conv_id: r for r in df.collect()}
    return rows[conv]


def test_bidirectional_ok(spark):
    """forward+backward balanced ⇒ verified — groupandverify.go:555-671,
    groupandverify_test.go:1209-1256."""
    df = mk(spark, [{"id": "1", "children": ["2"]}, {"id": "2", "parent": "1"}])
    per_conv, _ = verify_trees(df)
    r = one(per_conv)
    assert r.verified and r.n_nodes == 2 and r.n_dup_nodes == 0


def test_one_way_forward_only(spark):
    """child never backward-references parent ⇒ unverified
    (childBalance missing UpdateFromChild, groupandverify.go:611-619)."""
    df = mk(spark, [{"id": "1", "children": ["2"]}, {"id": "2"}])
    per_conv, _ = verify_trees(df)
    assert not one(per_conv).verified


def test_one_way_backward_only(spark):
    """parent never lists child in childIds ⇒ unverified
    (missing UpdateFromParent, groupandverify.go:632-650)."""
    df = mk(spark, [{"id": "1"}, {"id": "2", "parent": "1"}])
    per_conv, _ = verify_trees(df)
    assert not one(per_conv).verified


def test_dangling_parent_ref(spark):
    """child references absent parent ⇒ placeholder pruned, unverified —
    groupandverify.go:855-859,913-917."""
    df = mk(spark, [{"id": "2", "parent": "ghost"}])
    per_conv, _ = verify_trees(df)
    assert not one(per_conv).verified


def test_parent_verify_set_count_rule(spark):
    """type-T parent with empty childIds verifies iff distinct backward
    children == expectedChildren — groupandverify.go:632-650,657-664,
    groupandverify_test.go:1155-1166."""
    rows = [
        {"id": "1", "type": "T"},
        {"id": "2", "parent": "1", "children": []},
    ]
    per_conv, rejects = verify_trees(mk(spark, rows), parent_verify_types=pvs(spark, [("T", 1)]))
    assert one(per_conv).verified
    assert rejects.count() == 0

    # wrong count ⇒ unverified
    rows_bad = [
        {"id": "1", "type": "T"},
        {"id": "2", "parent": "1"},
        {"id": "3", "parent": "1"},
    ]
    per_conv, _ = verify_trees(mk(spark, rows_bad), parent_verify_types=pvs(spark, [("T", 1)]))
    assert not one(per_conv).verified


def test_parent_verify_set_nonempty_children_rejects(spark):
    """non-empty childIds on a parentVerifySet type ⇒ reject row —
    manual GroupAndVerify_User_Manual.md:142-149."""
    rows = [
        {"id": "1", "type": "T", "children": ["2"]},
        {"id": "2", "parent": "1"},
    ]
    _, rejects = verify_trees(mk(spark, rows), parent_verify_types=pvs(spark, [("T", 1)]))
    rj = rejects.collect()
    assert len(rj) == 1 and rj[0].reject_reason == "parent_verify_set_nonempty_children"


def test_duplicates_counted_and_mismatch_flagged(spark):
    """first instance canonical, later appended as duplicates; payload
    inequality surfaced — groupandverify.go:839-861,816-826."""
    rows = [
        {"id": "1", "children": ["2"]},
        {"id": "2", "parent": "1"},
        {"id": "2", "parent": "1"},             # equal duplicate
    ]
    per_conv, _ = verify_trees(mk(spark, rows))
    r = one(per_conv)
    assert r.verified and r.n_nodes == 2 and r.n_dup_nodes == 1 and not r.dup_mismatch

    rows_conflict = rows[:2] + [{"id": "2", "parent": "OTHER"}]
    per_conv, _ = verify_trees(mk(spark, rows_conflict))
    r = one(per_conv)
    assert r.n_dup_nodes == 1 and r.dup_mismatch


def test_parent_verify_set_zero_children_fails_count(spark):
    """a pvs parent with NO backward children must NOT verify — the
    reference only verifies it once exactly expectedChildren distinct
    children referenced it (groupandverify.go:657-664)."""
    rows = [{"id": "1", "type": "T"}]
    per_conv, _ = verify_trees(
        mk(spark, rows), parent_verify_types=pvs(spark, [("T", 2)])
    )
    assert not one(per_conv).verified


def test_dup_mismatch_payload_only(spark):
    """duplicates identical on links but differing ONLY in payload trip
    dup_mismatch when payload_cols are compared — the reference's
    inequality is a FULL deep-equal incl. appJSON
    (groupandverify.go:816-826)."""
    from pyspark.sql import functions as F

    base = [
        {"id": "1", "children": ["2"]},
        {"id": "2", "parent": "1", "ts": 5},
        {"id": "2", "parent": "1", "ts": 9},   # differs only in timestamp
    ]
    df = mk(spark, base).withColumn(
        "_app_ser",
        F.to_json(F.map_from_entries(F.array_sort(F.map_entries("app_json")))),
    )
    shallow, _ = verify_trees(df, arrival_col="arrival_pos")
    assert not one(shallow).dup_mismatch
    deep, _ = verify_trees(
        df, arrival_col="arrival_pos",
        payload_cols=("node_type", "timestamp", "_app_ser"),
    )
    assert one(deep).dup_mismatch


def test_multiple_convs_independent(spark):
    good = mk(spark, [{"id": "1", "children": ["2"]}, {"id": "2", "parent": "1"}], conv="g")
    bad = mk(spark, [{"id": "1", "children": ["2"]}, {"id": "2"}], conv="b")
    per_conv, _ = verify_trees(good.unionByName(bad))
    res = {r.conv_id: r.verified for r in per_conv.collect()}
    assert res == {"g": True, "b": False}
