"""Table layer — parquet directories standing in for Iceberg tables.

The production target is Iceberg (atomic snapshot commits, partition
pruning on conv_id buckets / days(ts)); the sandbox has no Iceberg jars,
so this thin layer gives the same API over parquet dirs and gates the
Iceberg path behind an import/availability check (SURVEY §7.4 risk 4).

ALL commit mechanics live HERE — operators and plans never touch the
filesystem directly, so an Iceberg-backed Catalog (snapshot commit,
partition overwrite, metadata-only partition moves) slots in without
changing the pipeline. The parquet stand-in emulates those semantics
with write-to-tmp + atomic rename — the same temp+rename+fsync protocol
as the reference's atomic file writer (Server/atomicWrite.go:153-226).

Iceberg mapping of each method (what the real implementation does):
- ``write``            → ``df.writeTo(tbl).createOrReplace()``
- ``commit_fanout_split`` → one ``writeTo(staging).create()`` with sink
  partitioning, then TWO metadata-only operations: move the reserved
  reject partitions into the rejects table (partition-level REPLACE)
  and snapshot-swap staging into the main table. No data rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

# Reserved reject sink partition prefix (operators/route.py assigns the
# sinks): the single-pass plan ROUTES invalid rows here, and the commit
# splits them out into the rejects table at metadata level.
from ..operators.route import REJECT_SINK_PREFIX


class Catalog:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fmt: str = "parquet",
        keep_snapshots: int = 0,
    ):
        """``keep_snapshots``: number of previous table versions to
        retain on every atomic replace (0 = none, the default —
        replaced data is dropped as before). With N > 0, each commit
        archives the outgoing version under ``_snapshots/<table>/vK``
        and expires versions beyond N: the parquet stand-in for
        Iceberg's snapshot log, enabling ``read(version=...)``
        time-travel, ``rollback`` and ``expire_snapshots``."""
        self.spark = spark
        self.root = root
        self.fmt = fmt
        self.keep_snapshots = keep_snapshots
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    # ------------------------------------------------- snapshot history
    def _snap_dir(self, table: str) -> str:
        return os.path.join(self.root, "_snapshots", table)

    def snapshots(self, table: str) -> list[int]:
        """Retained version numbers, oldest first. Versions count up
        monotonically across commits (expiry leaves gaps)."""
        d = self._snap_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(v[1:]) for v in os.listdir(d)
            if v.startswith("v") and v[1:].isdigit()
        )

    def _archive_current(self, table: str) -> None:
        """Move the current table dir into the snapshot log as the next
        version (a rename — metadata-only, like keeping the previous
        Iceberg snapshot reachable instead of expiring it)."""
        final = self.path(table)
        if not os.path.exists(final):
            return
        d = self._snap_dir(table)
        os.makedirs(d, exist_ok=True)
        versions = self.snapshots(table)
        nxt = (versions[-1] + 1) if versions else 1
        os.rename(final, os.path.join(d, f"v{nxt}"))

    def expire_snapshots(self, table: str, keep: int | None = None) -> list[int]:
        """Drop all but the newest ``keep`` versions (Iceberg's
        ``expire_snapshots`` maintenance action). Returns the expired
        version numbers."""
        keep = self.keep_snapshots if keep is None else keep
        versions = self.snapshots(table)
        expired = versions[: max(0, len(versions) - keep)]
        for v in expired:
            shutil.rmtree(
                os.path.join(self._snap_dir(table), f"v{v}"), ignore_errors=True
            )
        return expired

    def rollback(self, table: str, version: int) -> None:
        """Make ``version`` the current table again. The current state
        is archived as a new version first and the target snapshot
        stays in the log (Iceberg: a metadata-only repoint of the
        current snapshot id; the parquet stand-in copies the files)."""
        src = os.path.join(self._snap_dir(table), f"v{version}")
        if not os.path.isdir(src):
            raise ValueError(f"no snapshot v{version} of table {table!r}")
        tmp = self.path(table) + ".tmp-" + uuid.uuid4().hex[:8]
        shutil.copytree(src, tmp)
        self._swap_in(tmp, table)
        self.expire_snapshots(table)

    def exists(self, table: str) -> bool:
        """True if the table has data files — directly, or one level
        down inside hive-style ``key=value`` partition directories
        (the layout commit_fanout_split's partition moves produce;
        checking only the top level made such tables look absent)."""
        p = self.path(table)
        if not os.path.isdir(p):
            return False
        for f in os.listdir(p):
            if f.endswith(".parquet") or f == "_SUCCESS":
                return True
            sub = os.path.join(p, f)
            if "=" in f and os.path.isdir(sub) and any(
                g.endswith(".parquet") for g in os.listdir(sub)
            ):
                return True
        return False

    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Read the current table, or — when snapshots are retained —
        time-travel to a specific retained ``version`` (Iceberg's
        ``VERSION AS OF``). A schema-evolved table (see ``append``)
        reads with footer merging; unevolved tables skip that cost."""
        if version is None:
            src = self.path(table)
        else:
            src = os.path.join(self._snap_dir(table), f"v{version}")
            if not os.path.isdir(src):
                raise ValueError(f"no snapshot v{version} of table {table!r}")
        r = self.spark.read
        if os.path.exists(os.path.join(src, "_evolved")):
            r = r.option("mergeSchema", "true")
        return r.parquet(src)

    def append(
        self, df: DataFrame, table: str, merge_schema: bool = False
    ) -> None:
        """Atomic append — the Iceberg append snapshot: the new table
        version references every existing data file UNCHANGED plus the
        new batch's files. The parquet stand-in hardlinks the current
        files into a staging dir (metadata-only, like a manifest
        re-reference), writes the batch beside them, and swaps — a
        crash anywhere leaves the current version intact.

        Schema evolution (Iceberg ``ALTER TABLE ADD COLUMN`` +
        append): with ``merge_schema=True`` the batch may ADD columns
        and/or OMIT existing ones — readers see the union schema with
        NULLs where a file lacks a column, exactly Iceberg's
        read-time projection of old files against the evolved schema.
        The table is marked evolved so ``read`` merges parquet footers
        (unevolved tables keep the cheap single-footer read). A column
        present on both sides must keep its exact type (Iceberg allows
        only safe widenings; the stand-in allows none — widen by
        rewriting). Without ``merge_schema``, any schema difference
        raises, mirroring Iceberg's write-schema validation.

        Unpartitioned tables only: appending loose files at the root
        of a hive-partitioned layout would corrupt partition discovery
        (use ``commit_fanout_split`` / ``replace_keys`` there)."""
        if not self.exists(table):
            self.write(df, table)
            return
        final = self.path(table)
        if any(
            "=" in d and os.path.isdir(os.path.join(final, d))
            for d in os.listdir(final)
        ):
            raise ValueError(
                f"append targets unpartitioned tables; {table!r} is "
                "hive-partitioned (use replace_keys/commit_fanout_split)"
            )
        cur_types = {f.name: f.dataType for f in self.read(table).schema.fields}
        new_types = {f.name: f.dataType for f in df.schema.fields}
        shared_conflicts = {
            c for c in cur_types.keys() & new_types.keys()
            if cur_types[c] != new_types[c]
        }
        if shared_conflicts:
            raise ValueError(
                f"column type changes not supported in append: "
                f"{sorted(shared_conflicts)}"
            )
        evolves = cur_types.keys() != new_types.keys()
        if evolves and not merge_schema:
            raise ValueError(
                f"schema mismatch appending to {table!r} "
                f"(batch adds {sorted(new_types.keys() - cur_types.keys())}, "
                f"omits {sorted(cur_types.keys() - new_types.keys())}); "
                "pass merge_schema=True to evolve"
            )

        self._sweep_stale(table)
        batch_tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(batch_tmp)

        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        os.makedirs(tmp)
        for f in os.listdir(final):
            if f.endswith(".parquet") or f == "_evolved":
                os.link(os.path.join(final, f), os.path.join(tmp, f))
        prefix = "b-" + uuid.uuid4().hex[:8] + "-"
        for f in os.listdir(batch_tmp):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(batch_tmp, f), os.path.join(tmp, prefix + f)
                )
        shutil.rmtree(batch_tmp, ignore_errors=True)
        if evolves or os.path.exists(os.path.join(final, "_evolved")):
            with open(os.path.join(tmp, "_evolved"), "w") as fh:
                fh.write("1")
        self._swap_in(tmp, table)

    def diff(
        self,
        table: str,
        key_cols: list[str],
        old_version: int,
        new_version: int | None = None,
        compare_cols: list[str] | None = None,
        include_values: bool = False,
    ) -> DataFrame:
        """Keyed change capture between two retained versions of a
        table (``new_version=None`` = the current state) — the parquet
        stand-in for Iceberg's changelog scan. ``include_values=True``
        carries after-images so the result feeds
        ``operators.diff.apply_changes`` (see snapshot_diff for
        semantics and scale shape)."""
        from ..operators.diff import snapshot_diff

        return snapshot_diff(
            self.read(table, version=old_version),
            self.read(table, version=new_version),
            key_cols,
            compare_cols=compare_cols,
            include_values=include_values,
        )

    # ------------------------------------------------- commit mechanics
    def _sweep_stale(self, table: str) -> None:
        """Remove leftover staging/old dirs from a crashed previous
        attempt — BOTH '.tmp-' and '.old-' suffixes (each attempt uses a
        fresh uuid, so stale ones would otherwise leak forever)."""
        parent = os.path.dirname(self.path(table).rstrip("/")) or "."
        base = os.path.basename(self.path(table).rstrip("/"))
        if not os.path.isdir(parent):
            return
        for d in os.listdir(parent):
            if d.startswith(base + ".tmp-") or d.startswith(base + ".old-"):
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)

    def _swap_in(self, new_dir: str, table: str) -> None:
        """Atomically replace ``table`` with ``new_dir`` (rename is the
        parquet stand-in for an Iceberg snapshot swap). With snapshot
        retention on, the outgoing version is archived (and history
        trimmed) instead of dropped."""
        final = self.path(table)
        if self.keep_snapshots > 0:
            self._archive_current(table)
            os.rename(new_dir, final)
            self.expire_snapshots(table)
            return
        old = final + ".old-" + uuid.uuid4().hex[:8]
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(new_dir, final)
        shutil.rmtree(old, ignore_errors=True)

    def write(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        """Atomic replace: write to a tmp dir, swap into place."""
        self._sweep_stale(table)
        tmp = self.path(table) + ".tmp-" + uuid.uuid4().hex[:8]
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if partition_by and not any(
            f.endswith(".parquet") for _, _, fs in os.walk(tmp) for f in fs
        ):
            # a partitioned write of an EMPTY DataFrame emits only
            # _SUCCESS — an unreadable table (schema inference fails).
            # Re-commit as an unpartitioned empty file with the schema
            # (limit(0) optimizes to an empty relation: no-scan job).
            df.limit(0).write.mode("overwrite").parquet(tmp)
        self._swap_in(tmp, table)

    def commit_fanout_split(
        self,
        routed_all: DataFrame,
        table: str,
        rejects_table: str,
        reject_prefix: str = REJECT_SINK_PREFIX,
    ) -> None:
        """Single-job fan-out commit of the WHOLE single-pass output
        (routable + reject rows): one dynamic-partition write on
        ``sink``, then the reserved reject partitions are moved out to
        become ``rejects_table`` and the remainder is swapped into
        ``table`` — O(#sinks) metadata operations, never a second data
        pass. Iceberg analog: staged create + partition-level REPLACE +
        snapshot swap (see module docstring)."""
        self._sweep_stale(table)
        self._sweep_stale(rejects_table)

        tmp = self.path(table) + ".tmp-" + uuid.uuid4().hex[:8]
        routed_all.write.mode("overwrite").partitionBy("sink").parquet(tmp)

        rej_tmp = self.path(rejects_table) + ".tmp-" + uuid.uuid4().hex[:8]
        os.makedirs(rej_tmp, exist_ok=True)
        moved = False
        for d in os.listdir(tmp):
            if d.startswith(reject_prefix):
                os.rename(os.path.join(tmp, d), os.path.join(rej_tmp, d))
                moved = True
        if not moved:
            # zero rejects: commit an EMPTY table with the full schema
            # (an empty directory is not a readable parquet table —
            # any later read would fail schema inference). limit(0) is
            # optimized to an empty relation, so this is a no-scan job.
            routed_all.limit(0).write.mode("overwrite").parquet(rej_tmp)

        self._swap_in(rej_tmp, rejects_table)
        self._swap_in(tmp, table)

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_by: list[str]
    ) -> None:
        """Dynamic partition overwrite — Iceberg's
        ``INSERT OVERWRITE`` in dynamic mode (and Spark's
        ``partitionOverwriteMode=dynamic``): only the partition values
        PRESENT in ``df`` are replaced; every other partition of the
        table is untouched. The backfill/restatement primitive — e.g.
        recompute one day of a ``days(ts)``-partitioned sink without
        rewriting the year.

        Stand-in mechanics: the batch writes partitioned to staging,
        then each staged partition directory swaps into the table
        (archive-and-rename, metadata-only). Each partition swap is
        atomic; the commit as a WHOLE is not (Iceberg's snapshot commit
        is — documented stand-in gap, same class as the fanout-split
        note in the module docstring). A crash mid-commit leaves some
        partitions new and some old, and the sweep on the next write
        clears the staging remnant."""
        if not partition_by:
            raise ValueError("overwrite_partitions requires partition columns")
        if not self.exists(table):
            self.write(df, table, partition_by=partition_by)
            return
        final = self.path(table)
        if not any(
            "=" in d and os.path.isdir(os.path.join(final, d))
            for d in os.listdir(final)
        ):
            raise ValueError(
                f"{table!r} is not hive-partitioned; use write() to replace it"
            )
        self._sweep_stale(table)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)

        # leaf partition dirs: one key=value path component per
        # partition column (multi-level specs swap at LEAF grain — the
        # dynamic-overwrite contract — not at the first level)
        def _leaves(root: str, depth: int, rel: str = ""):
            base = os.path.join(root, rel) if rel else root
            for d in os.listdir(base):
                if "=" not in d or not os.path.isdir(os.path.join(base, d)):
                    continue
                sub = os.path.join(rel, d) if rel else d
                if depth == 1:
                    yield sub
                else:
                    yield from _leaves(root, depth - 1, sub)

        for leaf in _leaves(tmp, len(partition_by)):
            dst = os.path.join(final, leaf)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.isdir(dst):
                # evicted dir moves OUT of the table dir before delete:
                # a crash-leaked '<part>.old-*' INSIDE it would be read
                # back as a bogus partition value; as a root-level
                # sibling it is swept by _sweep_stale instead
                old = final + ".old-" + uuid.uuid4().hex[:8]
                os.rename(dst, old)
                os.rename(os.path.join(tmp, leaf), dst)
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.rename(os.path.join(tmp, leaf), dst)
        shutil.rmtree(tmp, ignore_errors=True)

    def replace_keys(
        self,
        table: str,
        staging_table: str,
        keys: DataFrame,
        key_col: str = "conv_id",
        partition_by: list[str] | None = None,
    ) -> None:
        """Key-level merge: rows of ``table`` whose ``key_col`` appears
        in ``keys`` are replaced by the contents of ``staging_table``
        (which holds the recomputed rows for exactly those keys).

        Iceberg analog: MERGE INTO / DELETE WHERE key IN (...) +
        APPEND, file-pruned by the key-bucket partition spec — a
        metadata+affected-files operation. The parquet stand-in
        rewrites the table (anti-join ∪ staging) behind the same
        atomic swap; the CALLER's semantics are identical.

        Idempotent: re-running the same merge with the same staging
        contents yields the same table (anti-join removes the
        previously merged rows first)."""
        staged = self.read(staging_table)
        if self.exists(table):
            old = self.read(table)
            merged = old.join(keys, key_col, "left_anti").unionByName(staged)
        else:
            merged = staged
        self.write(merged, table, partition_by=partition_by)

    def compact(
        self,
        table: str,
        target_file_mb: int = 256,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Small-file compaction: rewrite ``table`` into
        ceil(bytes / target_file_mb) files behind the same atomic swap.

        Fan-out sinks accumulate one file per (task, partition value)
        per run — at 10^12-turn scale that is millions of KB-sized
        files, and scan planning cost grows with file count, so
        periodic compaction is part of the operating contract.
        Iceberg analog: the ``rewrite_data_files`` maintenance action
        (bin-packs small files into target-sized ones at snapshot
        level); the parquet stand-in measures the directory and
        repartitions through the atomic-replace path. For partitioned
        tables pass ``partition_by`` — rows are clustered on the
        partition columns so each output task writes whole partition
        files instead of a sliver per partition value."""
        p = self.path(table)
        files_before = 0
        total_bytes = 0
        for dirpath, _dirnames, filenames in os.walk(p):
            for f in filenames:
                if f.endswith(".parquet"):
                    files_before += 1
                    total_bytes += os.path.getsize(os.path.join(dirpath, f))
        n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
        df = self.read(table)
        if partition_by:
            df = df.repartition(n_files, *partition_by)
        else:
            df = df.repartition(n_files)
        self.write(df, table, partition_by=partition_by)
        return {
            "table": table,
            "files_before": files_before,
            "target_files": int(n_files),
            "bytes": total_bytes,
        }

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table), ignore_errors=True)

    # ----------------------------------------------------------- bucketing
    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_by: str,
        n_buckets: int = 32,
        sort_by: tuple[str, ...] | None = None,
    ) -> str:
        """Write ``table`` hash-bucketed on ``bucket_by`` (optionally
        sorted within buckets) and register it in the session catalog —
        the layout that makes every later equi-join / groupBy on the
        bucket key SHUFFLE-FREE: two tables bucketed on the same key
        with the same bucket count sort-merge-join with zero Exchange
        on either side (asserted in tests), and with ``sort_by`` on the
        join key the per-task sort disappears too.

        This is how the 10^12-turn deployment co-locates the sequenced
        table with per-conversation side tables (tree edges, verify
        output, incremental deltas): pay the conv_id shuffle ONCE at
        write time, never again across runs. Iceberg analog: a
        ``bucket(N, conv_id)`` partition transform + sorted data files
        with storage-partitioned joins; the parquet stand-in uses the
        session-catalog bucketed-table support (metadata lives in the
        session catalog, so a NEW session must re-register — Iceberg
        makes it durable).

        Returns the registered table identifier.
        """
        ident = "o2pv_" + "".join(
            ch if ch.isalnum() else "_" for ch in table
        )
        self.spark.sql(f"DROP TABLE IF EXISTS {ident}")
        path = self.path(table + ".bucketed")
        shutil.rmtree(path, ignore_errors=True)
        w = (
            df.write.format(self.fmt)
            .mode("overwrite")
            .bucketBy(n_buckets, bucket_by)
        )
        if sort_by:
            w = w.sortBy(*sort_by)
        w.option("path", path).saveAsTable(ident)
        return ident

    def register_bucketed(
        self,
        table: str,
        bucket_by: str,
        n_buckets: int,
        sort_by: tuple[str, ...] | None = None,
    ) -> str:
        """Re-attach a committed ``write_bucketed`` layout in a FRESH
        session: the parquet stand-in keeps bucket metadata in the
        session catalog, so a new session (e.g. a crash-resumed job)
        must recreate the table entry over the already-committed files
        — the data files carry their bucket ids, only the metadata was
        lost. CREATE TABLE ... CLUSTERED BY over the existing location
        restores the layout contract, so downstream joins/groupBys on
        the bucket key stay shuffle-free across restarts (Iceberg's
        bucket transform makes this durable without the re-attach).
        No-op if the table is already registered."""
        ident = "o2pv_" + "".join(
            ch if ch.isalnum() else "_" for ch in table
        )
        path = self.path(table + ".bucketed")
        schema = self.spark.read.format(self.fmt).load(path).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        sorted_sql = (
            f"SORTED BY ({', '.join(sort_by)}) " if sort_by else ""
        )
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {ident} ({cols}) "
            f"USING {self.fmt} "
            f"CLUSTERED BY ({bucket_by}) {sorted_sql}"
            f"INTO {int(n_buckets)} BUCKETS "
            f"LOCATION '{path}'"
        )
        return ident

    def read_bucketed(self, table: str) -> DataFrame:
        """Read a table written by ``write_bucketed`` WITH its bucket
        metadata (a plain parquet read of the same files would lose the
        layout and reintroduce the shuffle)."""
        ident = "o2pv_" + "".join(
            ch if ch.isalnum() else "_" for ch in table
        )
        return self.spark.table(ident)
