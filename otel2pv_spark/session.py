"""SparkSession factory with scale-oriented defaults.

Local mode stands in for the multi-executor cluster: the same configs
(AQE, shuffle partitions ~ cores, Arrow batches) are what we would pass
to spark-submit on a 1000-executor cluster, with shuffle.partitions
sized to total cores × 2-3 there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _physical_mem_gb() -> int | None:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) // (1024 * 1024)
    except OSError:
        pass
    return None


def get_spark(
    master: str | None = None,
    app_name: str = "otel2pv_spark",
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this pipeline.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else 32).
    ``shuffle_partitions`` defaults to the local core count — for a real
    cluster pass cores×2-3 instead (AQE coalesces the excess).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = 32 if inner == "*" else max(8, int(inner))
    # Local mode runs every task thread against ONE shared heap, so the
    # heap must scale with thread count to keep per-task memory constant
    # (the analog of fixed per-executor memory on a cluster). Measured
    # here: 16 threads on a 16g heap spend ~40% of wall in GC and cap
    # thread-scaling at ~0.6 efficiency; 2g/thread restores ~linear.
    # Scaling applies ONLY to local masters (a cluster driver request
    # must come from sizing, not thread math — SPARK_DRIVER_MEM wins),
    # and is capped by detected physical memory so local[*] on a small
    # host doesn't get OOM-killed mid-run.
    if master.startswith("local"):
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "1"
        threads = (os.cpu_count() or 8) if inner == "*" else max(1, int(inner))
        heap_gb = max(16, 2 * threads)
        phys = _physical_mem_gb()
        if phys:
            heap_gb = max(4, min(heap_gb, int(phys * 0.6)))
        default_mem = f"{heap_gb}g"
    else:
        default_mem = "16g"
    driver_mem = os.environ.get("SPARK_DRIVER_MEM", default_mem)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # wide text rows: keep scan partitions modest so executors don't OOM
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", driver_mem)
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # WindowExec warns on every empty-partition window. The ONLY such
    # windows in this repo are deliberately config-sized: the final
    # k×P-row merge of two_level_topk and the ≤65536-row offsets sum in
    # prep.shuffle_deterministic — both documented at the call site
    # (partitioning them by a literal doesn't help: Catalyst constant-
    # folds foldable partition keys back to an empty spec). Any NEW
    # unpartitioned window over real data is still caught by the plan
    # tests (tests/test_plans.py asserts exchange/sort shapes).
    jvm = spark.sparkContext._jvm
    try:
        jvm.org.apache.log4j.LogManager.getLogger(
            "org.apache.spark.sql.execution.window.WindowExec"
        ).setLevel(jvm.org.apache.log4j.Level.ERROR)
    except Exception:
        pass  # logging backend differences must never fail the session
    return spark
