"""Tests for the mergeable sketches (functions/sketch.py): HLL
distinct-count state and the packed Bloom existence index."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from otel2pv_spark.functions import sketch


def _ids(spark, n, g=1, prefix=""):
    return spark.range(n).select(
        F.lit(g).alias("g"), F.concat(F.lit(prefix), F.col("id")).alias("v")
    )


class TestHll:
    def test_accuracy_large_cardinality(self, spark):
        df = _ids(spark, 50_000)
        est = sketch.hll_estimate(
            sketch.hll_state(df, ("g",), "v", p=12), ("g",), p=12
        ).collect()[0]
        assert abs(est.n_distinct_est - 50_000) / 50_000 < 0.05

    def test_small_cardinality_linear_counting(self, spark):
        df = _ids(spark, 10)
        est = sketch.hll_estimate(
            sketch.hll_state(df, ("g",), "v", p=8), ("g",), p=8
        ).collect()[0]
        # linear counting is near-exact when n << m
        assert abs(est.n_distinct_est - 10) <= 1

    def test_merge_equals_direct(self, spark):
        """Split/merge must be LOSSLESS: same registers, same rho, same
        estimate as the single-pass state (max is associative)."""
        df = spark.range(5_000).select(
            (F.col("id") % 3).alias("g"), F.col("id").cast("string").alias("v")
        )
        halves = [
            sketch.hll_state(df.filter(F.col("id") % 2 == i), ("g",), "v", p=8)
            for i in (0, 1)
        ]
        merged = sketch.hll_merge(halves, ("g",))
        direct = sketch.hll_state(df, ("g",), "v", p=8)
        m = {(r.g, r.register): r.rho for r in merged.collect()}
        d = {(r.g, r.register): r.rho for r in direct.collect()}
        assert m == d

    def test_merge_idempotent_under_replay(self, spark):
        """Replaying a batch (at-least-once delivery) must not change
        the state — the property the exact count/sum merge does NOT
        have."""
        df = _ids(spark, 1_000)
        st = sketch.hll_state(df, ("g",), "v", p=8)
        replayed = sketch.hll_merge([st, st, st], ("g",))
        assert sorted(map(tuple, st.collect())) == sorted(
            map(tuple, replayed.collect())
        )

    def test_duplicates_do_not_inflate(self, spark):
        once = _ids(spark, 2_000)
        tripled = once.unionByName(once).unionByName(once)
        e1 = sketch.hll_estimate(
            sketch.hll_state(once, ("g",), "v", p=10), ("g",), p=10
        ).collect()[0]
        e3 = sketch.hll_estimate(
            sketch.hll_state(tripled, ("g",), "v", p=10), ("g",), p=10
        ).collect()[0]
        assert e1.n_distinct_est == e3.n_distinct_est

    def test_null_values_excluded(self, spark):
        df = spark.range(100).select(
            F.lit(1).alias("g"),
            F.when(F.col("id") < 50, F.col("id").cast("string")).alias("v"),
        )
        st = sketch.hll_state(df, ("g",), "v", p=8)
        est = sketch.hll_estimate(st, ("g",), p=8).collect()[0]
        assert abs(est.n_distinct_est - 50) <= 2

    def test_state_bounded_by_registers(self, spark):
        st = sketch.hll_state(_ids(spark, 20_000), ("g",), "v", p=6)
        assert st.count() <= 64

    def test_bad_p_rejected(self, spark):
        with pytest.raises(ValueError):
            sketch.hll_state(_ids(spark, 10), ("g",), "v", p=2)


class TestBloom:
    def test_no_false_negatives(self, spark):
        base = _ids(spark, 2_000, prefix="k")
        bloom = sketch.bloom_build(base, "v", bits_log2=16, k=4).cache()
        # probe a mix: 500 members, 500 non-members
        probe = spark.range(1_500, 2_500).select(
            F.concat(F.lit("k"), F.col("id")).alias("v")
        )
        res = sketch.bloom_probe(
            probe, "v", bloom, bits_log2=16, k=4
        ).collect()
        members = {r.v for r in res if r.maybe_member}
        for i in range(1_500, 2_000):
            assert f"k{i}" in members  # zero false negatives, guaranteed

    def test_false_positive_rate_bounded(self, spark):
        base = _ids(spark, 2_000, prefix="k")
        bloom = sketch.bloom_build(base, "v", bits_log2=16, k=4).cache()
        probe = spark.range(10_000, 14_000).select(
            F.concat(F.lit("x"), F.col("id")).alias("v")
        )
        res = sketch.bloom_probe(probe, "v", bloom, bits_log2=16, k=4).collect()
        fp = sum(1 for r in res if r.maybe_member)
        # theoretical (1-e^(-kn/m))^k ~ 0.024% at n=2k, m=64Ki, k=4;
        # allow a generous margin
        assert fp / len(res) < 0.01

    def test_merge_equals_single_build(self, spark):
        a = _ids(spark, 1_000, prefix="k")
        b = spark.range(1_000, 2_000).select(
            F.lit(1).alias("g"), F.concat(F.lit("k"), F.col("id")).alias("v")
        )
        both = a.unionByName(b)
        merged = sketch.bloom_merge(
            [
                sketch.bloom_build(a, "v", bits_log2=14, k=3),
                sketch.bloom_build(b, "v", bits_log2=14, k=3),
            ]
        )
        direct = sketch.bloom_build(both, "v", bits_log2=14, k=3)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_null_key_probes_null(self, spark):
        base = _ids(spark, 100, prefix="k")
        bloom = sketch.bloom_build(base, "v", bits_log2=12, k=2)
        probe = spark.range(3).select(
            F.when(F.col("id") < 2, F.concat(F.lit("k"), F.col("id"))).alias("v")
        )
        res = {
            r.v: r.maybe_member
            for r in sketch.bloom_probe(
                probe, "v", bloom, bits_log2=12, k=2
            ).collect()
        }
        assert res["k0"] is True and res["k1"] is True and res[None] is None

    def test_probe_plan_is_broadcast_only(self, spark):
        """The probe side must NOT shuffle: k broadcast hash joins,
        with the only Exchanges inside the (tiny) state aggregation."""
        base = _ids(spark, 500, prefix="k")
        bloom = sketch.bloom_build(base, "v", bits_log2=14, k=4).cache()
        bloom.count()  # materialize so the probe plan reads the cache
        probe = _ids(spark, 500, prefix="k")
        plan = sketch.bloom_probe(
            probe, "v", bloom, bits_log2=14, k=4
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") == 4
        assert "SortMergeJoin" not in plan


class TestRollupHll:
    def test_rollup_users_hll_grain_matches(self, spark, sf_dir):
        """The sketch state's grain must be exactly the rollup's grain
        so estimates join 1:1 onto the maintained aggregate."""
        from otel2pv_spark.operators import aggregate as agg_op
        from otel2pv_spark import datagen

        ev = datagen.load_events(spark, sf_dir)
        roll = agg_op.rollup_time_windows(ev, width="1 hour")
        st = agg_op.rollup_users_hll(ev, width="1 hour")
        grain = ["window_start_us", "window_end_us", "event_type"]
        est = sketch.hll_estimate(st, tuple(grain), p=8)
        joined = roll.join(est, grain, "inner")
        assert joined.count() == roll.filter(F.col("n_users") > 0).count()

    def test_estimate_tracks_exact_within_tolerance(self, spark, sf_dir):
        from otel2pv_spark.operators import aggregate as agg_op
        from otel2pv_spark import datagen

        ev = datagen.load_events(spark, sf_dir)
        roll = agg_op.rollup_time_windows(ev, width="1 hour")
        st = agg_op.rollup_users_hll(ev, width="1 hour")
        grain = ["window_start_us", "window_end_us", "event_type"]
        est = sketch.hll_estimate(st, tuple(grain), p=8, estimate_col="n_hll")
        rows = roll.join(est, grain).select("n_users", "n_hll").collect()
        assert rows
        for r in rows:
            # p=8 keeps per-grain cardinalities in the linear-counting
            # regime on the fixture — near-exact
            assert abs(r.n_hll - r.n_users) <= max(3, 0.2 * r.n_users)


class TestCountMin:
    def test_estimate_never_underestimates_and_merge_matches(self, spark):
        """CMS one-sidedness: est >= exact for every key even with a
        width (2^2=4) far below the key count; merging two halves must
        equal the single-pass sketch cell-for-cell."""
        rows = [(i, f"k{i % 13}") for i in range(200)]
        df = spark.createDataFrame(rows, ["i", "k"]).select("i", "k")
        exact = {r["k"]: r["c"] for r in df.groupBy("k").agg(
            F.count("*").alias("c")).collect()}
        cms = sketch.cms_build(df, "k", depth=4, width_log2=2)
        keys = df.select("k").distinct()
        est = {
            r["k"]: r["cnt_est"]
            for r in sketch.cms_estimate(
                keys, "k", cms, depth=4, width_log2=2
            ).collect()
        }
        assert set(est) == set(exact)
        assert all(est[k] >= exact[k] for k in exact)
        # a fixture this overloaded must actually collide somewhere
        assert any(est[k] > exact[k] for k in exact)

        half_a = df.filter(F.col("i") < 100)
        half_b = df.filter(F.col("i") >= 100)
        merged = sketch.cms_merge([
            sketch.cms_build(half_a, "k", depth=4, width_log2=2),
            sketch.cms_build(half_b, "k", depth=4, width_log2=2),
        ])
        one = {(r["row_idx"], r["bucket"]): r["cnt"] for r in cms.collect()}
        two = {(r["row_idx"], r["bucket"]): r["cnt"] for r in merged.collect()}
        assert one == two

    def test_null_keys_skipped_and_probe_null(self, spark):
        df = spark.createDataFrame([("a",), (None,)], ["k"])
        cms = sketch.cms_build(df, "k", depth=2, width_log2=3)
        # only the non-null key contributes cells
        assert cms.agg(F.sum("cnt")).collect()[0][0] == 2  # depth rows
        probed = sketch.cms_estimate(df, "k", cms, depth=2, width_log2=3)
        got = {r["k"]: r["cnt_est"] for r in probed.collect()}
        assert got["a"] == 1 and got[None] is None


# ------------------------------------------------------------- KMV sample
def _kmv_rows(spark, n, key="a", start=1):
    return spark.createDataFrame(
        [(key, i, i * 10) for i in range(start, start + n)],
        "k string, id long, v long",
    )


def test_kmv_exact_when_k_covers_input(spark):
    """k >= n: the sample IS the input, quantiles are exact
    nearest-rank order statistics (integer-ceil ranks)."""
    df = _kmv_rows(spark, 100)
    st = sketch.kmv_state(df, ("k",), "id", "v", k=100)
    assert st.count() == 100
    got = {
        r.q_permille: (r.value, r.n_sample)
        for r in sketch.kmv_quantiles(st, ("k",)).collect()
    }
    # ceil(0.5*100)=50 -> 50th smallest = 500 ; 95 -> 950 ; 99 -> 990
    assert got == {500: (500, 100), 950: (950, 100), 990: (990, 100)}


def test_kmv_merge_of_split_halves_equals_direct_build(spark):
    """Bottom-k of unioned bottom-k states == bottom-k of the full
    input, row for row (the lossless-merge property the driver query
    relies on)."""
    df = _kmv_rows(spark, 500)
    direct = sketch.kmv_state(df, ("k",), "id", "v", k=32)
    halves = [
        sketch.kmv_state(df.filter(F.col("id") % 2 == i), ("k",), "id", "v", k=32)
        for i in (0, 1)
    ]
    merged = sketch.kmv_merge(halves, ("k",), k=32)
    rows = lambda d: sorted((r.k, r.priority, r.value) for r in d.collect())  # noqa: E731
    assert rows(merged) == rows(direct)
    assert merged.count() == 32  # genuinely sampling (k < n)


def test_kmv_merge_replay_idempotent(spark):
    """Merging a state with itself is a no-op (same rows, same
    priorities -> dedup absorbs the replay)."""
    st = sketch.kmv_state(_kmv_rows(spark, 200), ("k",), "id", "v", k=16)
    twice = sketch.kmv_merge([st, st], ("k",), k=16)
    rows = lambda d: sorted((r.k, r.priority, r.value) for r in d.collect())  # noqa: E731
    assert rows(twice) == rows(st)


def test_kmv_quantile_rank_floor_guard(spark):
    """Tiny q on a tiny sample: integer-ceil rank would be 1 anyway,
    but the GREATEST(.., 1) guard pins it — and per-key grains stay
    independent."""
    df = _kmv_rows(spark, 4, key="a").union(_kmv_rows(spark, 8, key="b"))
    st = sketch.kmv_state(df, ("k",), "id", "v", k=64)
    got = {
        (r.k, r.q_permille): r.value
        for r in sketch.kmv_quantiles(st, ("k",), q_permille=(1, 1000)).collect()
    }
    assert got[("a", 1)] == 10      # rank ceil(0.001*4)=1 -> min
    assert got[("a", 1000)] == 40   # rank 4 -> max
    assert got[("b", 1000)] == 80


# --------------------------------------------------------- oracle drift gate
# The HLL DuckDB oracle text shipped in __spark_entry__.py is STATIC
# (hand-auditable, independent of engine code at import time). These
# test-local generators re-derive it from the engine constants; the
# drift test below asserts static == generated, so a change to the
# engine estimator that forgets the oracle text fails loudly here
# instead of silently weakening the parity gate.
_TWO33 = 1 << 33


def hll_estimate_oracle_sql(
    inner_sql: str,
    keys_sql: str,
    value_sql: str,
    p: int = 8,
    salt: str = "hll-v1",
    estimate_col: str = "n_distinct_est",
) -> str:
    """The DuckDB rendering of hll_state+hll_estimate over
    ``inner_sql`` — generated next to the Spark code so the two
    formulas cannot drift (same pattern as the histogram oracle)."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    trimmed = "trim(LEADING '0' FROM _whex)"
    return f"""
WITH _src AS ({inner_sql}),
_h AS (
  SELECT {keys_sql},
         CAST(('0x' || substr(md5({value_sql} || '#{salt}'), 1, 8))::BIGINT % {m} AS INT) AS register,
         substr(md5({value_sql} || '#{salt}'), 9, 8) AS _whex
  FROM _src WHERE {value_sql} IS NOT NULL
),
_r AS (
  SELECT {keys_sql}, register,
         MAX(CAST(4 * (8 - length({trimmed})) + CASE substring({trimmed}, 1, 1)
             WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
             WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
             ELSE 0 END + 1 AS INT)) AS rho
  FROM _h GROUP BY {keys_sql}, register
),
_a AS (
  SELECT {keys_sql},
         CAST(COUNT(*) AS BIGINT) AS registers_present,
         SUM(1::BIGINT << (33 - rho)) + ({m} - COUNT(*)) * {_TWO33} AS z_scaled
  FROM _r GROUP BY {keys_sql}
)
SELECT {keys_sql}, registers_present, CAST(z_scaled AS BIGINT) AS z_scaled,
       CAST(ROUND(CASE WHEN CAST({alpha!r} AS DOUBLE) * {m} * {m} * CAST({float(_TWO33)!r} AS DOUBLE) / CAST(z_scaled AS DOUBLE) <= CAST({2.5 * m!r} AS DOUBLE)
                        AND {m} - registers_present > 0
                  THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / ({m} - registers_present))
                  ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m} * CAST({float(_TWO33)!r} AS DOUBLE) / CAST(z_scaled AS DOUBLE) END)
            AS BIGINT) AS {estimate_col}
FROM _a
"""




def hll_intersect_oracle_sql(
    inner_a: str,
    inner_b: str,
    keys_sql: str,
    value_sql: str,
    p: int = 8,
    salt: str = "hll-v1",
) -> str:
    """DuckDB rendering of hll_intersect_estimate over two inner
    queries — generated next to the Spark formula (same no-drift rule
    as hll_estimate_oracle_sql): register chains for A, B, and their
    per-register MAX union, then the shared estimator + inclusion-
    exclusion."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    trimmed = "trim(LEADING '0' FROM _whex)"

    def chain(src: str, tag: str) -> str:
        return f"""_h{tag} AS (
  SELECT {keys_sql},
         CAST(('0x' || substr(md5({value_sql} || '#{salt}'), 1, 8))::BIGINT % {m} AS INT) AS register,
         substr(md5({value_sql} || '#{salt}'), 9, 8) AS _whex
  FROM {src} WHERE {value_sql} IS NOT NULL
),
_r{tag} AS (
  SELECT {keys_sql}, register,
         MAX(CAST(4 * (8 - length({trimmed})) + CASE substring({trimmed}, 1, 1)
             WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
             WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
             ELSE 0 END + 1 AS INT)) AS rho
  FROM _h{tag} GROUP BY {keys_sql}, register
)"""

    def est(src: str, tag: str, out: str) -> str:
        raw = (
            f"CAST({alpha!r} AS DOUBLE) * {m} * {m} * "
            f"CAST({float(_TWO33)!r} AS DOUBLE) / CAST(z_scaled AS DOUBLE)"
        )
        return f"""_agg{tag} AS (
  SELECT {keys_sql},
         CAST(COUNT(*) AS BIGINT) AS registers_present,
         SUM(1::BIGINT << (33 - rho)) + ({m} - COUNT(*)) * {_TWO33} AS z_scaled
  FROM {src} GROUP BY {keys_sql}
),
_est{tag} AS (
  SELECT {keys_sql},
         CAST(ROUND(CASE WHEN {raw} <= CAST({2.5 * m!r} AS DOUBLE)
                          AND {m} - registers_present > 0
                    THEN CAST({float(m)!r} AS DOUBLE)
                         * ln(CAST({float(m)!r} AS DOUBLE) / ({m} - registers_present))
                    ELSE {raw} END) AS BIGINT) AS {out}
  FROM _agg{tag}
)"""

    return f"""
WITH _srca AS ({inner_a}),
_srcb AS ({inner_b}),
{chain("_srca", "a")},
{chain("_srcb", "b")},
_ru AS (
  SELECT {keys_sql}, register, MAX(rho) AS rho
  FROM (SELECT * FROM _ra UNION ALL SELECT * FROM _rb)
  GROUP BY {keys_sql}, register
),
{est("_ra", "a", "n_a")},
{est("_rb", "b", "n_b")},
{est("_ru", "u", "n_union")}
SELECT {keys_sql}, a.n_a, b.n_b, u.n_union,
       GREATEST(CAST(0 AS BIGINT), a.n_a + b.n_b - u.n_union)
         AS n_intersect_est
FROM _esta a
JOIN _estb b USING ({keys_sql})
JOIN _estu u USING ({keys_sql})
"""




def _entry_module():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("_entry_drift", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_static_hll_oracles_match_engine_constants():
    m = _entry_module()
    oracles = m.oracle_sql()
    assert oracles["events_hll_intersect"] == hll_intersect_oracle_sql(
        "SELECT event_type, CAST(user_id AS VARCHAR) AS u FROM events"
        " WHERE ts < TIMESTAMP '2024-01-16'",
        "SELECT event_type, CAST(user_id AS VARCHAR) AS u FROM events"
        " WHERE ts >= TIMESTAMP '2024-01-16'",
        "event_type",
        "u",
    )
    assert oracles["events_hll_users"] == hll_estimate_oracle_sql(
        "SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us, "
        "CAST(user_id AS VARCHAR) AS u FROM events",
        "hour_us",
        "u",
        p=8,
        estimate_col="n_users_hll",
    )
    grain = hll_estimate_oracle_sql(
        "SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, "
        "epoch_us(date_trunc('hour', ts)) + CAST(3600 AS BIGINT) * 1000000 "
        "AS window_end_us, event_type, CAST(user_id AS VARCHAR) AS u FROM events",
        "window_start_us, window_end_us, event_type",
        "u",
        p=8,
        estimate_col="n_users_hll",
    )
    assert grain in oracles["events_rollup_hll"]
