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
