"""Snapshot history / time-travel on the Catalog (the parquet stand-in
for Iceberg's snapshot log): versioned commits, VERSION AS OF reads,
rollback, and the expire_snapshots maintenance action."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from otel2pv_spark.sources.catalog import Catalog


def _df(spark, tag: str, n: int = 5):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


class TestSnapshots:
    def test_default_keeps_nothing(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.write(_df(spark, "a"), "t")
        cat.write(_df(spark, "b"), "t")
        assert cat.snapshots("t") == []
        assert {r.tag for r in cat.read("t").collect()} == {"b"}

    def test_time_travel_read(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"), keep_snapshots=3)
        cat.write(_df(spark, "a"), "t")
        cat.write(_df(spark, "b"), "t")
        cat.write(_df(spark, "c"), "t")
        assert cat.snapshots("t") == [1, 2]
        assert {r.tag for r in cat.read("t").collect()} == {"c"}
        assert {r.tag for r in cat.read("t", version=1).collect()} == {"a"}
        assert {r.tag for r in cat.read("t", version=2).collect()} == {"b"}

    def test_expiry_trims_oldest(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"), keep_snapshots=2)
        for tag in "abcde":
            cat.write(_df(spark, tag), "t")
        # versions count monotonically; only the newest 2 remain
        assert cat.snapshots("t") == [3, 4]
        with pytest.raises(ValueError):
            cat.read("t", version=1)

    def test_rollback_restores_and_archives(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"), keep_snapshots=5)
        cat.write(_df(spark, "a"), "t")
        cat.write(_df(spark, "b"), "t")
        cat.rollback("t", 1)
        assert {r.tag for r in cat.read("t").collect()} == {"a"}
        # pre-rollback state (b) was archived, and v1 is still in the log
        tags = {
            v: {r.tag for r in cat.read("t", version=v).collect()}
            for v in cat.snapshots("t")
        }
        assert {"a"} in tags.values() and {"b"} in tags.values()

    def test_rollback_unknown_version_raises(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"), keep_snapshots=2)
        cat.write(_df(spark, "a"), "t")
        with pytest.raises(ValueError):
            cat.rollback("t", 9)

    def test_fanout_commit_versions_both_tables(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"), keep_snapshots=2)
        routed = spark.range(10).select(
            F.col("id"),
            F.when(F.col("id") % 5 == 0, "__reject_parse__")
            .otherwise(F.concat(F.lit("sink_"), (F.col("id") % 2).cast("string")))
            .alias("sink"),
        )
        cat.commit_fanout_split(routed, "main", "rej")
        cat.commit_fanout_split(routed, "main", "rej")
        assert cat.snapshots("main") == [1] and cat.snapshots("rej") == [1]
        assert cat.read("main").count() == 8
        assert cat.read("main", version=1).count() == 8

    def test_snapshot_dirs_not_visible_as_tables(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"), keep_snapshots=2)
        cat.write(_df(spark, "a"), "t")
        cat.write(_df(spark, "b"), "t")
        # the archive lives under _snapshots/, away from table paths
        assert not cat.exists("t.v1")
        assert os.path.isdir(os.path.join(str(tmp_path / "cat"), "_snapshots", "t"))


class TestSnapshotDiff:
    def test_snapshot_diff_golden(self, spark):
        """insert / delete / update classification, changed-column
        names, null-safe compare (NULL == NULL is unchanged,
        NULL vs value is a change), unchanged keys absent."""
        from otel2pv_spark.operators.diff import snapshot_diff

        old = spark.createDataFrame(
            [
                (1, "a", 10),       # unchanged
                (2, "b", 20),       # value updated
                (3, None, 30),      # NULL == NULL -> unchanged
                (4, "d", 40),       # deleted
                (5, None, 50),      # NULL -> value: update
            ],
            "k int, s string, v int",
        )
        new = spark.createDataFrame(
            [
                (1, "a", 10),
                (2, "b", 21),
                (3, None, 30),
                (5, "e", 51),       # both columns change
                (6, "f", 60),       # inserted
            ],
            "k int, s string, v int",
        )
        got = sorted(
            (r.k, r.change, r.changed_cols)
            for r in snapshot_diff(old, new, ["k"]).collect()
        )
        assert got == [
            (2, "update", "v"),
            (4, "delete", ""),
            (5, "update", "s,v"),
            (6, "insert", ""),
        ]

    def test_snapshot_diff_explicit_compare_cols(self, spark):
        from otel2pv_spark.operators.diff import snapshot_diff

        old = spark.createDataFrame([(1, "a", 10)], "k int, s string, v int")
        new = spark.createDataFrame([(1, "a", 11)], "k int, s string, v int")
        # v not compared -> no change row at all
        assert snapshot_diff(old, new, ["k"], compare_cols=["s"]).count() == 0

    def test_catalog_diff_between_versions(self, spark, tmp_path):
        """Catalog.diff = changelog scan between two retained versions
        (and vs the current state)."""
        from pyspark.sql import functions as F

        cat = Catalog(spark, str(tmp_path / "cat"), keep_snapshots=3)
        v1 = spark.range(4).select("id", F.lit("x").alias("tag"))
        v2 = spark.range(1, 5).select(  # drop id=0, add id=4
            "id",
            F.when(F.col("id") == 2, "y").otherwise("x").alias("tag"),
        )
        cat.write(v1, "t")
        cat.write(v2, "t")
        got = sorted(
            (r.id, r.change)
            for r in cat.diff("t", ["id"], old_version=1).collect()
        )
        assert got == [(0, "delete"), (2, "update"), (4, "insert")]

    def test_snapshot_diff_reserved_names_rejected(self, spark):
        import pytest as _pytest

        from otel2pv_spark.operators.diff import snapshot_diff

        df = spark.createDataFrame([(1, "i")], "change int, s string")
        with _pytest.raises(ValueError, match="reserved"):
            snapshot_diff(df, df, ["change"])
        df2 = spark.createDataFrame([(1, "i")], "k int, changed_cols string")
        with _pytest.raises(ValueError, match="reserved"):
            snapshot_diff(df2, df2, ["k"])

    def test_diff_apply_round_trip(self, spark):
        """The CDC round-trip law: applying a value-carrying diff to
        the old state reproduces the new state exactly — inserts,
        deletes, updates, null transitions and all."""
        from otel2pv_spark.operators.diff import apply_changes, snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
            "k int, s string, v int",
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 21), (3, "c", 30), (6, None, 60)],
            "k int, s string, v int",
        )
        d = snapshot_diff(old, new, ["k"], include_values=True)
        got = apply_changes(old, d, ["k"])
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, new.collect())
        )
        # empty diff applies as identity
        empty = snapshot_diff(old, old, ["k"], include_values=True)
        same = apply_changes(old, empty, ["k"])
        assert sorted(map(tuple, same.collect())) == sorted(
            map(tuple, old.collect())
        )

    def test_apply_changes_rejects_valueless_diff(self, spark):
        import pytest as _pytest

        from otel2pv_spark.operators.diff import apply_changes, snapshot_diff

        old = spark.createDataFrame([(1, "a")], "k int, s string")
        new = spark.createDataFrame([(1, "b")], "k int, s string")
        d = snapshot_diff(old, new, ["k"])  # no include_values
        with _pytest.raises(ValueError, match="include_values"):
            apply_changes(old, d, ["k"])

    def test_diff_round_trip_with_null_keys(self, spark):
        """Null key values are one identity (null-safe matching): the
        round-trip law holds when a null-keyed row updates."""
        from otel2pv_spark.operators.diff import apply_changes, snapshot_diff

        old = spark.createDataFrame([(None, "x"), (1, "a")], "k int, s string")
        new = spark.createDataFrame([(None, "y"), (1, "a")], "k int, s string")
        d = snapshot_diff(old, new, ["k"], include_values=True)
        assert [(r.k, r.change) for r in d.collect()] == [(None, "update")]
        got = apply_changes(old, d, ["k"])
        assert sorted(map(tuple, got.collect()), key=str) == sorted(
            map(tuple, new.collect()), key=str
        )


class TestAppendEvolve:
    def test_append_same_schema(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.write(_df(spark, "a", 3), "t")
        cat.append(_df(spark, "b", 2), "t")
        got = sorted((r.id, r.tag) for r in cat.read("t").collect())
        assert [t for _, t in got].count("a") == 3
        assert [t for _, t in got].count("b") == 2
        # unevolved: no merge marker, cheap reads
        assert not os.path.exists(str(tmp_path / "cat" / "t" / "_evolved"))

    def test_append_rejects_silent_schema_drift(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.write(_df(spark, "a"), "t")
        widened = _df(spark, "b").withColumn("score", F.lit(1.5))
        with pytest.raises(ValueError, match="merge_schema"):
            cat.append(widened, "t")

    def test_append_evolves_schema_old_rows_null(self, spark, tmp_path):
        """Iceberg ADD COLUMN semantics: after an evolved append, every
        reader sees the union schema; pre-evolution rows project NULL
        for the new column."""
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.write(_df(spark, "a", 2), "t")
        widened = _df(spark, "b", 2).withColumn("score", F.lit(1.5))
        cat.append(widened, "t", merge_schema=True)
        rows = {(r.id, r.tag): r.score for r in cat.read("t").collect()}
        assert set(cat.read("t").columns) == {"id", "tag", "score"}
        assert all(v is None for (i, t), v in rows.items() if t == "a")
        assert all(v == 1.5 for (i, t), v in rows.items() if t == "b")

    def test_append_batch_may_omit_columns(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.write(_df(spark, "a", 2), "t")
        narrow = spark.range(2).select("id")  # omits tag
        cat.append(narrow, "t", merge_schema=True)
        got = cat.read("t")
        assert set(got.columns) == {"id", "tag"}
        assert got.filter(F.col("tag").isNull()).count() == 2

    def test_append_type_conflict_always_rejected(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.write(_df(spark, "a"), "t")
        bad = spark.range(2).select("id", F.lit(7).alias("tag"))  # tag int
        with pytest.raises(ValueError, match="type changes"):
            cat.append(bad, "t", merge_schema=True)

    def test_append_snapshot_history_and_marker_sticks(self, spark, tmp_path):
        """Appends version like any commit; once evolved, later
        same-schema appends keep the merge marker (old thin files
        remain in the table)."""
        cat = Catalog(spark, str(tmp_path / "cat"), keep_snapshots=3)
        cat.write(_df(spark, "a", 2), "t")
        widened = _df(spark, "b", 1).withColumn("score", F.lit(2.0))
        cat.append(widened, "t", merge_schema=True)
        cat.append(widened, "t", merge_schema=True)
        assert cat.read("t").count() == 4
        assert set(cat.read("t").columns) == {"id", "tag", "score"}
        # pre-append version still readable, WITHOUT the new column
        v1 = cat.snapshots("t")[0]
        assert set(cat.read("t", version=v1).columns) == {"id", "tag"}

    def test_append_to_partitioned_table_rejected(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.write(_df(spark, "a"), "t", partition_by=["tag"])
        with pytest.raises(ValueError, match="partitioned"):
            cat.append(_df(spark, "b"), "t")

    def test_append_creates_missing_table(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.append(_df(spark, "a", 3), "t")
        assert cat.read("t").count() == 3


class TestOverwritePartitions:
    def _ev(self, spark, sink, tag, n=3):
        return spark.range(n).select(
            "id", F.lit(sink).alias("sink"), F.lit(tag).alias("tag")
        )

    def test_only_present_partitions_replaced(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        base = self._ev(spark, "a", "old").unionByName(self._ev(spark, "b", "old"))
        cat.write(base, "t", partition_by=["sink"])
        cat.overwrite_partitions(self._ev(spark, "a", "new", 2), "t", ["sink"])
        got = {(r.sink, r.tag) for r in cat.read("t").collect()}
        assert got == {("a", "new"), ("b", "old")}
        assert cat.read("t").filter(F.col("sink") == "a").count() == 2

    def test_new_partition_value_appears(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.write(self._ev(spark, "a", "old"), "t", partition_by=["sink"])
        cat.overwrite_partitions(self._ev(spark, "c", "new"), "t", ["sink"])
        got = {r.sink for r in cat.read("t").collect()}
        assert got == {"a", "c"}

    def test_multi_level_swaps_at_leaf_grain(self, spark, tmp_path):
        """(sink, day) spec: restating (a, d1) must not touch (a, d2)."""
        cat = Catalog(spark, str(tmp_path / "cat"))

        def mk(sink, day, tag):
            return spark.range(2).select(
                "id", F.lit(sink).alias("sink"), F.lit(day).alias("day"),
                F.lit(tag).alias("tag"),
            )

        base = mk("a", "d1", "old").unionByName(mk("a", "d2", "old"))
        cat.write(base, "t", partition_by=["sink", "day"])
        cat.overwrite_partitions(mk("a", "d1", "new"), "t", ["sink", "day"])
        got = {(r.day, r.tag) for r in cat.read("t").collect()}
        assert got == {("d1", "new"), ("d2", "old")}

    def test_unpartitioned_target_rejected(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.write(self._ev(spark, "a", "x"), "t")  # unpartitioned
        with pytest.raises(ValueError, match="not hive-partitioned"):
            cat.overwrite_partitions(self._ev(spark, "a", "y"), "t", ["sink"])

    def test_missing_table_created(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path / "cat"))
        cat.overwrite_partitions(self._ev(spark, "a", "x"), "t", ["sink"])
        assert cat.read("t").count() == 3
