"""Tests for the z-order clustered layout (sources/layout.py):
interleave correctness vs a pure-Python reference, and MEASURED
row-group skipping on a clustered parquet write."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from otel2pv_spark.sources.layout import cluster_by_zvalue, zvalue


def _py_z(x: int, y: int, bits: int = 16) -> int:
    dom = 1 << bits
    x %= dom
    y %= dom
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


class TestZValue:
    def test_golden_small(self, spark):
        rows = spark.createDataFrame(
            [(3, 5), (0, 0), (1, 0), (0, 1), (65535, 65535)], "x long, y long"
        ).select("x", "y", zvalue("x", "y").alias("z")).collect()
        for r in rows:
            assert r.z == _py_z(r.x, r.y), (r.x, r.y)
        assert _py_z(3, 5) == 39  # pin the bit convention itself

    def test_matches_python_reference_sweep(self, spark):
        df = spark.range(2_000).select(
            (F.col("id") * 7919 % 4096).alias("x"),
            (F.col("id") * 104729 % 4096).alias("y"),
        )
        rows = df.select("x", "y", zvalue("x", "y", bits=12).alias("z")).collect()
        for r in rows:
            assert r.z == _py_z(r.x, r.y, bits=12)

    def test_negative_keys_wrap_like_pmod(self, spark):
        rows = spark.createDataFrame(
            [(-1, 2), (-4096, 7)], "x long, y long"
        ).select("x", "y", zvalue("x", "y", bits=12).alias("z")).collect()
        for r in rows:
            assert r.z == _py_z(r.x % 4096, r.y, bits=12)

    def test_bad_bits_rejected(self, spark):
        with pytest.raises(ValueError):
            zvalue("a", "b", bits=20)

    def test_locality(self, spark):
        """Consecutive z-values must stay spatially close on average —
        the property that makes min/max pruning work. Compare against
        a row-major (y-sorted) ordering of the same grid."""
        n = 64
        grid = spark.range(n * n).select(
            (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
        )
        zs = sorted(
            (r.z, r.x) for r in grid.select(
                "x", zvalue("x", "y", bits=6).alias("z")
            ).collect()
        )
        # split the z-ordered sequence into 16 equal runs; each run
        # should span only a fraction of the x domain
        run = len(zs) // 16
        spans = []
        for i in range(16):
            xs = [x for _, x in zs[i * run : (i + 1) * run]]
            spans.append(max(xs) - min(xs) + 1)
        assert max(spans) <= n // 2  # a y-sorted run spans all of x (=n)


class TestClusteredWrite:
    def test_row_group_skipping_measured(self, spark, tmp_path):
        """Write the same grid z-clustered and y-sorted; the fraction
        of parquet files whose [min,max] x-stats overlap a point
        predicate must drop substantially under z-order."""
        n = 128
        grid = spark.range(n * n).select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )

        zdir = str(tmp_path / "zorder")
        cluster_by_zvalue(grid, "x", "y", bits=7, num_partitions=16).write.parquet(
            zdir
        )
        ldir = str(tmp_path / "linear")
        grid.repartitionByRange(16, "y").sortWithinPartitions("y").write.parquet(
            ldir
        )

        def overlap_fraction(d: str, point: int) -> float:
            files = [
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            ]
            assert files
            hit = tot = 0
            for fp in files:
                md = pq.ParquetFile(fp).metadata
                for rg in range(md.num_row_groups):
                    col = next(
                        md.row_group(rg).column(i)
                        for i in range(md.row_group(rg).num_columns)
                        if md.row_group(rg).column(i).path_in_schema == "x"
                    )
                    tot += 1
                    if col.statistics.min <= point <= col.statistics.max:
                        hit += 1
            return hit / tot

        z_frac = overlap_fraction(zdir, 37)
        l_frac = overlap_fraction(ldir, 37)
        assert l_frac > 0.9  # y-sorted layout cannot prune on x
        assert z_frac <= 0.5  # z-order layout skips most groups
        # and the rewrite must not lose or duplicate rows
        assert spark.read.parquet(zdir).count() == n * n

    def test_keep_z_column(self, spark):
        df = spark.range(10).select(
            F.col("id").alias("x"), (F.col("id") * 3).alias("y")
        )
        out = cluster_by_zvalue(df, "x", "y", bits=4, z_col="z")
        assert "z" in out.columns
        for r in out.collect():
            assert r.z == _py_z(r.x, r.y, bits=4)
