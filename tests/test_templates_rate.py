"""Golden tests: Drain-style template mining (operators/templates.py)
and PromQL-style counter_rate (operators/aggregate.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from otel2pv_spark.operators import aggregate as agg_op
from otel2pv_spark.operators import templates as tmpl_op


def _lines(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "text string")


def test_mine_templates_masks_disagreeing_positions(spark):
    df = _lines(
        spark,
        ["GET /user/1 200",
         "GET /user/2 200",
         "GET  /user/3\t200",  # run-collapsed whitespace joins the group
         "POST /cart 500",
         "boot ok"],
    )
    got = {r.template: r for r in tmpl_op.mine_templates(df).collect()}
    assert set(got) == {"GET <*> 200", "POST /cart 500", "boot ok"}
    g = got["GET <*> 200"]
    assert (g.n_tokens, g.n_lines, g.n_wild) == (3, 3, 1)
    assert got["POST /cart 500"].n_wild == 0


def test_mine_templates_group_key_is_count_and_first(spark):
    """Same first token, different arity -> distinct templates (the
    Drain prefix key); constant positions keep their literal token."""
    df = _lines(spark, ["job start 1", "job start 2", "job start"])
    got = sorted(
        (r.template, r.n_lines) for r in tmpl_op.mine_templates(df).collect()
    )
    assert got == [("job start", 1), ("job start <*>", 2)]


def test_assign_templates_round_trip(spark):
    df = _lines(spark, ["GET /a 200", "GET /b 200", "boot ok"])
    tm = tmpl_op.mine_templates(df)
    out = {r.text: r.template for r in tmpl_op.assign_templates(df, tm).collect()}
    assert out == {
        "GET /a 200": "GET <*> 200",
        "GET /b 200": "GET <*> 200",
        "boot ok": "boot ok",
    }


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_counter_rate_reset_semantics(spark):
    """10 -> 12.5 -> 3 (reset: contributes its full value) -> 4."""
    ev = _events(
        spark,
        [(1, "2024-01-01 10:00:00", 7, "bytes", 10.0),
         (2, "2024-01-01 10:10:00", 7, "bytes", 12.5),
         (3, "2024-01-01 10:20:00", 7, "bytes", 3.0),
         (4, "2024-01-01 10:30:00", 7, "bytes", 4.0)],
    )
    got = agg_op.counter_rate(ev).collect()
    assert len(got) == 1
    r = got[0]
    # 2.5 + 3.0 (reset) + 1.0 = 6.5
    assert r.increase_micro == 6_500_000
    assert r.n_deltas == 3
    assert r.event_type == "bytes"


def test_counter_rate_series_are_independent(spark):
    """Another user's counter never donates a lag to this one; each
    series' first sample contributes nothing."""
    ev = _events(
        spark,
        [(1, "2024-01-01 10:00:00", 1, "bytes", 100.0),
         (2, "2024-01-01 10:05:00", 2, "bytes", 1.0),
         (3, "2024-01-01 10:10:00", 2, "bytes", 2.0)],
    )
    got = agg_op.counter_rate(ev).collect()
    assert len(got) == 1
    assert got[0].increase_micro == 1_000_000  # only user 2's delta
    assert got[0].n_deltas == 1


def test_counter_rate_window_split(spark):
    """Deltas land in the window of the CURRENT sample's timestamp."""
    ev = _events(
        spark,
        [(1, "2024-01-01 10:50:00", 7, "bytes", 1.0),
         (2, "2024-01-01 11:10:00", 7, "bytes", 5.0)],
    )
    got = agg_op.counter_rate(ev).collect()
    assert len(got) == 1
    r = got[0]
    assert r.increase_micro == 4_000_000
    # 11:00 UTC bucket
    assert r.window_start_us == 1704106800000000


def test_reassemble_multiline_golden(spark):
    """Continuations fold into their head in line order; a stream
    starting mid-event flags head_missing; single one-shuffle shape."""
    from otel2pv_spark.operators.templates import reassemble_multiline

    df = spark.createDataFrame(
        [("c1", 0, "event=a id=1"),
         ("c1", 1, "  at Foo.bar(Foo.java:7)"),
         ("c1", 2, "  at Baz.qux(Baz.java:9)"),
         ("c1", 3, "event=b id=2"),
         ("c2", 0, "  at Orphan.line(O.java:1)"),  # rotation cut the head
         ("c2", 1, "event=c id=3")],
        "conv_id string, turn_idx int, text string",
    )
    got = {(r.conv_id, r.event_seq): r
           for r in reassemble_multiline(df).collect()}
    assert len(got) == 4
    a = got[("c1", 1)]
    assert a.n_lines == 3 and a.start_turn_idx == 0 and not a.head_missing
    assert a.event_text == (
        "event=a id=1\n  at Foo.bar(Foo.java:7)\n  at Baz.qux(Baz.java:9)")
    assert got[("c1", 2)].n_lines == 1
    orphan = got[("c2", 0)]
    assert orphan.head_missing and orphan.n_lines == 1


def test_rate_limit_cap_census_golden(spark):
    """First-N admission in (ts, id) order; census reconciles exactly;
    uncapped grains still appear with zero drops."""
    from datetime import datetime

    from otel2pv_spark.operators.templates import rate_limit

    rows = [(i, datetime(2025, 1, 1, 0, 0, i), "hot", 1.0) for i in range(7)]
    rows += [(100, datetime(2025, 1, 1, 0, 30, 0), "cold", 1.0)]
    rows += [(200, datetime(2025, 1, 1, 1, 0, 0), "hot", 1.0)]  # next hour
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    kept, census = rate_limit(df, max_per_window=3)
    admitted = {}
    for r in kept.collect():
        admitted.setdefault((r.event_type, r.window_start_us), []).append(
            (r.sample_rank, r.event_id))
    h0 = 1735689600000000
    hot0 = sorted(admitted[("hot", h0)])
    assert hot0 == [(1, 0), (2, 1), (3, 2)]  # first three by (ts, id)
    assert admitted[("cold", h0)] == [(1, 100)]  # under cap: all admitted
    cen = {(r.event_type, r.window_start_us): (r.n_total, r.n_kept, r.n_dropped)
           for r in census.collect()}
    assert cen[("hot", h0)] == (7, 3, 4)
    assert cen[("cold", h0)] == (1, 1, 0)           # uncapped, still audited
    assert cen[("hot", h0 + 3600 * 1_000_000)] == (1, 1, 0)
    assert all(t == kk + d for (t, kk, d) in cen.values())
