#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

`--scaling` mode: run the full parse→enrich→verify→sequence→route→
aggregate DAG at two parallelism levels ($SPARK_GRAFT_SCALE_LEVELS,
default local[4] vs local[16] — both map to physical cores on this
guest; the sandbox stand-in for N vs 4N executors per BASELINE.md §2)
in separate
subprocesses (a JVM's master is fixed at session creation), and write
BENCH/BASELINE.md with turns/sec at both levels + scaling efficiency.

Queries are forced with the `noop` write sink so every output column is
materialized (a bare count() would let Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative spread: pipeline stages + training-data ops.
HEADLINE = [
    "parse_extract",
    "parse_extract_json",
    "parse_extract_grok",
    "parse_extract_expr",
    "validate_nested",
    "extract_fanout",
    "validate_events",
    "enrich_route",
    "enrich_asof",
    "sessionize",
    "route_counts",
    "sequence_prev",
    "chain_verify",
    "group_applies",
    "pipeline_sink_counts",
    "pipeline_tree_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_lines",
    "dedup_exact_substr",
    "embedding_semdedup",
    "dedup_incremental",
    "dedup_jaccard_est",
    "text_repetition",
    "text_quality_percentiles",
    "text_quality_histogram",
    "prep_decontaminate",
    "prep_decontaminate_neardup",
    "prep_sample_temperature",
    "prep_shuffle",
    "prep_chunks",
    "ann_pq_topk",
    "ann_pq_refined",
    "ann_ivfadc_topk",
    "text_quality",
    "text_classifier",
    "classifier_auc",
    "embed_hash_topk",
    "text_ngram_lm",
    "text_lm_perplexity",
    "prep_cap_per_group",
    "prep_mix_corpus",
    "text_token_count",
    "text_winnow",
    "prep_scrub",
    "prep_curate",
    "prep_pack",
    "ann_cosine_topk",
    "ann_hard_negatives",
    "embedding_pca_cov",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "enrich_interval",
    "events_rollup_hourly",
    "events_rollup_incremental",
    "pipeline_checks",
    "table_profile",
    "rollup_anomalies",
    "burn_rate_alerts",
    "log_multiline",
    "log_rate_limit",
    "funnel_reach",
    "error_bursts",
    "events_hll_intersect",
    "latency_stats",
    "events_rollup_hll",
    "dedup_bloom_probe",
    "layout_zorder",
    "text_bm25_topk",
    "text_bm25_indexed",
    "text_rerank_topk",
    "retrieval_topk",
    "text_top_ngrams",
    "conv_features",
    "dedup_conversations",
    "text_gopher_rules",
    "text_lm_backoff",
    "multimodal_phash_neardup",
    "prep_url_dedup",
    "dedup_survivors",
    "prep_sft_examples",
    "text_classifier_train",
    "correlate_events",
    "table_diff",
    "tpch_pricing",
    "tpch_shipping",
    "tpch_priority",
    "tpch_custdist",
    "tpch_parts_suppliers",
    "tpch_big_orders",
    "tpch_idle_customers",
    "tpch_waiting_suppliers",
    "tpch_min_cost_supp",
    "tpch_market_share",
    "tpch_returned_customers",
    "tpch_dominant_suppliers",
    "log_templates",
    "counter_rate",
    "graph_pagerank",
    "graph_triangles",
    "text_pair_lift",
    "events_cube",
    "events_kmv_quantiles",
    "rollup_gaps_filled",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> int:
    """Materialize every column of the plan; return row count."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict[str, float] = {}
    # min of 2 runs per query: this guest sees multi-x throughput swings
    # from hypervisor neighbors (measured in BENCH/BASELINE.md), and a
    # single timed run conflates that noise with plan cost — e.g. one
    # round recorded enrich_route at 11.5 s where steady state is 2.8 s.
    for name in HEADLINE:
        fn = qs[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def run_e2e(spark, sf_dir: str, out_root: str) -> dict:
    """Full DAG incl. all sink/metrics/lineage writes — the BASELINE metric."""
    from otel2pv_spark.plans import pipeline

    cfg = pipeline.PipelineConfig(out_root=out_root, run_id="bench")
    return pipeline.run_from_events(spark, sf_dir, cfg)


def main_bench() -> None:
    from otel2pv_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # warm the JVM + parquet footers once so timings measure the queries
    spark.read.parquet(f"{SF_DIR}/events.parquet").limit(1).count()

    t0 = time.time()
    queries = run_queries(spark, SF_DIR)
    # e2e min-of-2 too (fresh out_root each run — same run_id would
    # resume from the manifest and skip all writes).
    e2e = None
    for i in range(2):
        out_root = f"/tmp/otel2pv_bench_{os.getpid()}_{i}"
        r = run_e2e(spark, SF_DIR, out_root=out_root)
        shutil.rmtree(out_root, ignore_errors=True)
        e2e = r if e2e is None or r["wall_sec"] < e2e["wall_sec"] else e2e
    queries["pipeline_e2e"] = round(e2e["wall_sec"], 3)
    wall = round(time.time() - t0, 3)

    # headline value = sum of the reported per-query minimums: the
    # comparable "how fast are the queries" number under min-of-2
    # (raw wall doubles with the repeat count and includes the noisy
    # discarded runs; it is still reported as wall_sec).
    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        "wall_sec": wall,
        "e2e_rows": e2e["rows"],
        "e2e_turns_per_sec": round(e2e["turns_per_sec"], 1),
    }))
    spark.stop()


# --------------------------------------------------------- scale ladder
# `--ladder`: time the most expensive bench queries at sf0.01 / sf0.1 /
# a GENERATED sf1 (10x sf0.1, shifted-key replication) and report each
# query's scaling exponent alpha where t ~ sf^alpha on the 0.1 -> 1
# rung (the 0.01 rung is fixed-overhead-dominated and reported for
# context only). This is the cheap way to catch an accidentally
# superlinear plan that a single-sf bench hides (the
# dedup_conversations class of issue, r3 verdict #6): a healthy
# data-parallel plan lands alpha ~<= 1; alpha >> 1 is a scale smell.
# No gate — evidence, written to BENCH/LADDER.md.
LADDER_QUERIES = [
    "embedding_semdedup",
    "dedup_conversations",
    "dedup_conv_clusters",
    "pipeline_tree_counts",
    "ann_pq_refined",
    "ann_pq_topk",
    "dedup_survivors",
    "funnel_reach",
    "text_lm_backoff",
    "log_templates",
    "prep_curate",
]
LADDER_SF1_DIR = os.environ.get(
    "SPARK_GRAFT_LADDER_SF1", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".ladder", "sf1")
)


def _gen_sf1(spark, src_dir: str, out_dir: str, factor: int = 10) -> None:
    """Deterministic 10x scale-up of the ladder tables from sf0.1:
    key-shifted replicas (new users -> new conversations of the same
    size distribution; new doc/vec ids below the fixtures' +100000
    offset so planted-copy ranges never collide), with per-replica text
    tokens / small embedding perturbations so dup/ANN candidate
    structure scales ~linearly instead of creating 10-way identical
    clusters (which would measure a different workload)."""
    from pyspark.sql import functions as F

    marker = os.path.join(out_dir, "_LADDER_OK")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(factor).select(F.col("id").alias("_k"))

    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    n_ev = ev.agg(F.max("event_id")).head()[0] + 1
    n_us = ev.agg(F.max("user_id")).head()[0] + 1
    ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("_k") * n_ev).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_k") * n_us).alias("user_id"),
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    n_doc = docs.agg(F.max("doc_id")).head()[0] + 1
    docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("_k") * n_doc).alias("doc_id"),
        F.when(F.col("_k") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("_k").cast("string")))
        .alias("text"),
        "lang", "source", "n_chars",
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    n_vec = emb.agg(F.max("vec_id")).head()[0] + 1
    perturbed = F.transform(
        "embedding",
        lambda x, i: (
            x
            + ((F.col("_k") * 31 + i) % 13 - 6).cast("float")
            * F.lit(0.001).cast("float")
        ).cast("float"),
    )
    emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("_k") * n_vec).alias("vec_id"),
        # _k=0 replica stays the VERBATIM sf0.1 data (like documents),
        # so sf1 is a strict superset and per-key outputs are
        # comparable across rungs (review finding)
        F.when(F.col("_k") == 0, F.col("embedding"))
        .otherwise(perturbed)
        .alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    with open(marker, "w") as fh:
        fh.write("ok")


def main_ladder() -> None:
    import math

    import __spark_entry__ as entry
    from otel2pv_spark.session import get_spark

    spark = get_spark(app_name="bench-ladder")
    _gen_sf1(spark, "/root/testdata/sf0.1", LADDER_SF1_DIR)
    rungs = [
        ("sf0.01", 0.01, "/root/testdata/sf0.01"),
        ("sf0.1", 0.1, "/root/testdata/sf0.1"),
        ("sf1", 1.0, LADDER_SF1_DIR),
    ]
    qs = entry.queries()
    times: dict[str, dict[str, float]] = {q: {} for q in LADDER_QUERIES}
    for label, _sf, d in rungs:
        spark.read.parquet(f"{d}/events.parquet").limit(1).count()  # warm footers
        for q in LADDER_QUERIES:
            best = None
            for _ in range(2):
                t0 = time.time()
                _force(qs[q](spark, d))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[q][label] = round(best, 3)
    rows = []
    for q in LADDER_QUERIES:
        t01, t1 = times[q]["sf0.1"], times[q]["sf1"]
        alpha = math.log(t1 / t01) / math.log(10) if t01 > 0 else float("nan")
        rows.append((q, times[q]["sf0.01"], t01, t1, alpha))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/LADDER.md", "w") as f:
        f.write(
            """# BENCH/LADDER — scale-ladder exponents

The 10 most expensive bench queries timed at sf0.01 / sf0.1 / a
generated sf1 (10x sf0.1: key-shifted replicas — new users mean new
conversations of the same size distribution; per-replica doc tokens /
embedding perturbations keep dup/ANN candidate structure ~linear).
alpha = log10(t_sf1 / t_sf0.1): the t ~ sf^alpha exponent on the big
rung (the sf0.01 rung is fixed-overhead-dominated, shown for context).
A healthy data-parallel plan lands alpha <~ 1 at these sizes (below 1
means fixed overheads still amortizing); alpha >> 1 flags a
superlinear plan that one-sf benching hides. min-of-2 per rung on
local[$SPARK_GRAFT_CPUS], noop-sink forced.

| query | sf0.01 s | sf0.1 s | sf1 s | alpha (0.1→1) |
|---|---|---|---|---|
"""
        )
        for q, t001, t01, t1, alpha in rows:
            f.write(f"| {q} | {t001:.2f} | {t01:.2f} | {t1:.2f} | {alpha:.2f} |\n")
        f.write(
            "\nInvestigate every alpha > 1 row before accepting it —"
            " measure whether the OUTPUT grew superlinearly (LSH"
            " candidate pairs on duplicate-heavy data legitimately do)"
            " or a fixed config stopped fitting the corpus (cluster"
            " counts that must scale with N). The round-4 investigation"
            " of embedding_semdedup and dedup_conversations lives in"
            " BENCH/LADDER_ANALYSIS.md — dated evidence, kept out of"
            " this generated file so fresh numbers never pair with"
            " stale prose.\n"
        )
    print(json.dumps({
        "ladder": {q: times[q] for q in LADDER_QUERIES},
        "alpha": {r[0]: round(r[4], 3) for r in rows},
    }))
    spark.stop()


SCALE_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "2000000"))
SCALE_PARTS = 64  # fixed input partitioning so both levels see identical splits
SCALE_ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "2"))


def main_e2e_once() -> None:
    """Subprocess worker for --scaling: one e2e run at $SPARK_GRAFT_CPUS.

    Input is the deterministic synthetic transcript table at a size
    where parallel work dominates JVM/driver fixed overheads (~3M turns
    by default) — the sandbox analog of measuring a cluster on a real
    partition of the 10^12-turn table, not on a toy sample."""
    from otel2pv_spark import datagen
    from otel2pv_spark.plans import pipeline
    from otel2pv_spark.session import get_spark

    spark = get_spark(app_name=f"bench-e2e-{os.environ.get('SPARK_GRAFT_CPUS')}")
    tr = datagen.synth_transcripts(spark, n_convs=SCALE_CONVS, partitions=SCALE_PARTS)
    # Warmup run: the first execution of the plan pays whole-stage
    # codegen compilation + JVM JIT (measured ~10x the steady-state
    # cost in this sandbox). A production cluster is warm; we measure
    # steady state — min of 2 timed runs to reject host-contention
    # noise (this Firecracker guest sees ~6x throughput swings from
    # invisible hypervisor neighbors).
    # Each run's output is DELETED right after timing: the ~800 MB per
    # run otherwise accumulates in /tmp across rounds and the resulting
    # disk pressure disproportionately slows the high-parallelism level
    # (measured: a 78%-full disk cost local[16] ~15% throughput).
    warm_root = f"/tmp/otel2pv_scale_{os.getpid()}_warm"
    pipeline.run(spark, tr, pipeline.PipelineConfig(out_root=warm_root, run_id="warm"))
    shutil.rmtree(warm_root, ignore_errors=True)
    best = None
    for rep in range(2):
        root = f"/tmp/otel2pv_scale_{os.getpid()}_{rep}"
        res = pipeline.run(spark, tr, pipeline.PipelineConfig(
            out_root=root, run_id=f"r{rep}"))
        shutil.rmtree(root, ignore_errors=True)
        if best is None or res["wall_sec"] < best["wall_sec"]:
            best = res
    print("E2E_RESULT " + json.dumps(
        {"rows": best["rows"], "wall_sec": best["wall_sec"],
         "turns_per_sec": best["turns_per_sec"]}))
    spark.stop()


CURATION_FACTOR = int(os.environ.get("SPARK_GRAFT_CURATION_FACTOR", "10"))


def main_curation_once() -> None:
    """Subprocess worker for --curation-scaling: one curation-DAG e2e
    run (scrub → curate → LSH+CC near-dup clustering → decontaminate →
    pack → committed audit/clean/stats tables) over the generated-sf1
    documents scaled a further CURATION_FACTOR x at $SPARK_GRAFT_CPUS.
    The extra replication matters: at sf1's 50k docs the DAG is
    fixed-overhead-dominated (driver-paced CC rounds, ~hundreds of
    tiny jobs) and local[16] measured SLOWER than local[4] — the same
    reason the transcript protocol runs ~3M-turn inputs. Key-shifted
    replicas with per-replica token perturbation (the _gen_sf1 rule)
    keep dup/candidate structure ~linear. Same protocol as
    main_e2e_once: warmup run first, min of 2 timed runs, outputs
    deleted per rep."""
    from otel2pv_spark.entry_queries import eval_fixture
    from otel2pv_spark.plans import curation
    from otel2pv_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-cur-{os.environ.get('SPARK_GRAFT_CPUS')}"
    )
    _gen_sf1(spark, "/root/testdata/sf0.1", LADDER_SF1_DIR)
    cur_dir = os.path.join(
        os.path.dirname(LADDER_SF1_DIR), f"cur_x{CURATION_FACTOR}"
    )
    marker = os.path.join(cur_dir, "_CUR_OK")
    if not os.path.exists(marker):
        from pyspark.sql import functions as F

        base = spark.read.parquet(f"{LADDER_SF1_DIR}/documents.parquet")
        n_doc = base.agg(F.max("doc_id")).head()[0] + 1
        reps = spark.range(CURATION_FACTOR).select(F.col("id").alias("_k"))
        base.crossJoin(reps).select(
            (F.col("doc_id") + F.col("_k") * n_doc).alias("doc_id"),
            F.when(F.col("_k") == 0, F.col("text"))
            .otherwise(
                F.concat(F.col("text"), F.lit(" repc"), F.col("_k").cast("string"))
            )
            .alias("text"),
            "lang", "source", "n_chars",
        ).write.mode("overwrite").parquet(f"{cur_dir}/documents.parquet")
        with open(marker, "w") as fh:
            fh.write("ok")
    docs = spark.read.parquet(f"{cur_dir}/documents.parquet")
    eval_df = eval_fixture(spark, LADDER_SF1_DIR)
    n_docs = docs.count()

    def once(run_id: str) -> dict:
        root = f"/tmp/otel2pv_curscale_{os.getpid()}_{run_id}"
        res = curation.run_curation(
            spark, docs, eval_df,
            curation.CurationConfig(out_root=root, run_id=run_id),
        )
        shutil.rmtree(root, ignore_errors=True)
        return res

    once("warm")
    best = None
    for rep in range(2):
        res = once(f"r{rep}")
        if best is None or res["wall_sec"] < best["wall_sec"]:
            best = res
    print("CUR_RESULT " + json.dumps({
        "docs": n_docs,
        "kept": best["n_kept"],
        "wall_sec": best["wall_sec"],
        "docs_per_sec": n_docs / best["wall_sec"],
    }))
    spark.stop()


def main_probe_once() -> None:
    """Subprocess worker for --scaling: the pure-CPU guest-ceiling
    probe at $SPARK_GRAFT_CPUS — 24B-row xxhash64 max, zero shuffle,
    zero disk, embarrassingly parallel. Whatever 4N/N speedup THIS
    fails to reach is the host's ceiling (few-core turbo boost /
    hypervisor scheduling), not pipeline serialization; the scaling
    report normalizes against it."""
    from pyspark.sql import functions as F

    from otel2pv_spark.session import get_spark

    spark = get_spark(app_name=f"bench-probe-{os.environ.get('SPARK_GRAFT_CPUS')}")
    n = 24_000_000_000

    def probe():
        spark.range(n, numPartitions=64).select(
            F.max(F.xxhash64("id"))
        ).collect()

    spark.range(n // 24, numPartitions=64).select(
        F.max(F.xxhash64("id"))
    ).collect()  # warmup
    best = None
    for _ in range(2):
        t0 = time.time()
        probe()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print("PROBE_RESULT " + json.dumps({"wall_sec": best}))
    spark.stop()


# N and 4N parallelism levels for the scaling evidence. Default 4 vs 16:
# a pure-CPU probe (8B-row xxhash sum, fresh plan per rep) shows this
# guest scales cleanly only up to 16 threads (4->16 = 4.26x) and flattens
# 16->32 (1.27x) — its 32 vCPUs are 16 physical cores + SMT. Using levels
# that both map to physical cores mirrors adding real executors on a
# cluster; running the 4N level on hyperthreads would measure SMT, not
# the pipeline.
SCALE_LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "4,16").split(",")
)


def main_scaling() -> None:
    # Interleave the two levels across SCALE_ROUNDS subprocess rounds
    # (N, 4N, N, 4N, ...) and keep each level's best round: hypervisor
    # noise bursts last minutes, so back-to-back single measurements
    # can bias one level arbitrarily; interleaving + min rejects that.
    def _sub(mode: str, cpus: int, marker: str) -> dict:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = next(
            (ln for ln in p.stdout.splitlines() if ln.startswith(marker)), None)
        if line is None:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            raise RuntimeError(f"{mode} run at local[{cpus}] failed")
        return json.loads(line[len(marker):])

    levels: dict[int, dict] = {}
    probes: dict[int, float] = {}
    for _ in range(SCALE_ROUNDS):
        for cpus in SCALE_LEVELS:
            res = _sub("--e2e-once", cpus, "E2E_RESULT ")
            if cpus not in levels or res["wall_sec"] < levels[cpus]["wall_sec"]:
                levels[cpus] = res
        # same-round guest-ceiling probe per level (see main_probe_once)
        for cpus in SCALE_LEVELS:
            pr = _sub("--probe-once", cpus, "PROBE_RESULT ")["wall_sec"]
            probes[cpus] = min(probes.get(cpus, pr), pr)

    n1, n4 = SCALE_LEVELS
    tp1, tp4 = levels[n1]["turns_per_sec"], levels[n4]["turns_per_sec"]
    eff = (tp4 / tp1) / (n4 / n1) if tp1 > 0 else 0.0
    ceiling = (probes[n1] / probes[n4]) / (n4 / n1) if probes.get(n4) else None
    rel = eff / ceiling if ceiling else None
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

Full DAG (parse → enrich → verify → sequence → route → aggregate,
all sink + metrics + lineage tables written) over the deterministic
synthetic transcript table ({SCALE_CONVS:,} conversations ≈
{levels[n1]['rows']:,} turns, fixed {SCALE_PARTS} input partitions so
both levels see identical splits); only parallelism differs
(local[{n1}] vs local[{n4}] — the sandbox stand-in for N vs 4N
executors, BASELINE.md §2). Both levels map to PHYSICAL cores: a
pure-CPU probe shows this guest's 32 vCPUs are 16 physical cores +
SMT (thread scaling flattens past 16), so running the 4N level on
hyperthreads would measure SMT, not the pipeline. Each level does a
warmup run first (whole-stage-codegen + JIT compile ≈ 10x the
steady-state cost) then reports the min of 2 timed runs per
subprocess, best of {SCALE_ROUNDS} interleaved (N, 4N, N, 4N)
subprocess rounds (this Firecracker guest sees multi-x throughput
swings from hypervisor neighbors lasting minutes; interleaving + min
rejects that noise). Input sized so parallel work dominates driver
fixed overheads, as on a real cluster partition of the full table.

| parallelism | rows (turns) | wall sec | turns/sec | cpu-probe sec |
|---|---|---|---|---|
| local[{n1}]  (N)  | {levels[n1]['rows']} | {levels[n1]['wall_sec']:.2f} | {tp1:,.0f} | {probes.get(n1, float('nan')):.2f} |
| local[{n4}] (4N) | {levels[n4]['rows']} | {levels[n4]['wall_sec']:.2f} | {tp4:,.0f} | {probes.get(n4, float('nan')):.2f} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target ≥ 0.8 per BASELINE.json north rule).

**Same-session guest ceiling**: the pure-CPU probe (24B-row xxhash64
max — zero shuffle, zero disk, embarrassingly parallel; see
bench.py main_probe_once) measured a 4N/N speedup of
{(probes[n1] / probes[n4]):.2f}x, i.e. a HARDWARE scaling ceiling of
{ceiling:.3f} in this guest state (few-core turbo boost / hypervisor
scheduling make low-thread runs disproportionately fast). The
pipeline's efficiency relative to that same-session ceiling is
**{rel:.3f}** — the number that actually isolates pipeline
serialization from host behavior. Both are reported; when the raw
efficiency is below target but the relative efficiency is ~1.0, the
gap is the host's, not the plan's.

Per-query scale-ladder exponents (sf0.01 / 0.1 / generated sf1):
see `BENCH/LADDER.md` (`python bench.py --ladder`). Curation-DAG
(LLM-pipeline flagship) N→4N scaling under the same protocol:
see `BENCH/CURATION.md` (`python bench.py --curation-scaling`).
""")
    print(json.dumps({
        "levels": levels,
        "efficiency": round(eff, 3),
        "cpu_ceiling": round(ceiling, 3) if ceiling else None,
        "efficiency_vs_ceiling": round(rel, 3) if rel else None,
    }))


def main_curation_scaling() -> None:
    """N→4N scaling evidence for the CURATION DAG (the LLM-pipeline
    flagship carries its own scaling number instead of inheriting the
    transcript pipeline's): same interleaved-subprocess min-of-rounds
    protocol as --scaling, over the generated-sf1 documents corpus.
    Writes BENCH/CURATION.md. No gate — evidence."""
    def _sub(cpus: int) -> dict:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--curation-once"],
            env=env, capture_output=True, text=True, timeout=7200,
        )
        line = next(
            (ln for ln in p.stdout.splitlines()
             if ln.startswith("CUR_RESULT ")), None)
        if line is None:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            raise RuntimeError(f"curation run at local[{cpus}] failed")
        return json.loads(line[len("CUR_RESULT "):])

    levels: dict[int, dict] = {}
    for _ in range(SCALE_ROUNDS):
        for cpus in SCALE_LEVELS:
            res = _sub(cpus)
            if cpus not in levels or res["wall_sec"] < levels[cpus]["wall_sec"]:
                levels[cpus] = res
    n1, n4 = SCALE_LEVELS
    tp1 = levels[n1]["docs_per_sec"]
    tp4 = levels[n4]["docs_per_sec"]
    eff = (tp4 / tp1) / (n4 / n1) if tp1 > 0 else 0.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/CURATION.md", "w") as f:
        f.write(f"""# BENCH/CURATION — curation-DAG scaling evidence

The curation plan (`plans/curation.py`: scrub → quality/lang/exact-dup
curate → MinHash-LSH + connected-components near-dup clustering →
broadcast decontamination → per-split sequence packing → committed
audit / clean_docs / _corpus_stats tables) run end-to-end over the
generated-sf1 documents corpus replicated a further
{CURATION_FACTOR}x ({levels[n1]['docs']:,} docs — sized so parallel
work dominates the driver-paced CC rounds, exactly why the transcript
protocol uses ~3M-turn inputs; at sf1's 50k docs local[{n4}] measured
SLOWER than local[{n1}]), at
local[{n1}] (N) vs local[{n4}] (4N) — the same two-parallelism-level
protocol as the transcript pipeline's BENCH/BASELINE.md: warmup run
per subprocess, min of 2 timed runs, best of {SCALE_ROUNDS}
interleaved rounds, outputs deleted per rep.

| parallelism | docs | kept | wall sec | docs/sec |
|---|---|---|---|---|
| local[{n1}]  (N)  | {levels[n1]['docs']:,} | {levels[n1]['kept']:,} | {levels[n1]['wall_sec']:.2f} | {tp1:,.0f} |
| local[{n4}] (4N) | {levels[n4]['docs']:,} | {levels[n4]['kept']:,} | {levels[n4]['wall_sec']:.2f} | {tp4:,.0f} |

**Scaling efficiency (throughput_4N / throughput_N) / {n4 // n1} =
{eff:.3f}.** Evidence, not a gate (the ≥0.8 BASELINE.json gate is the
transcript pipeline's); the guest-ceiling caveat of BENCH/BASELINE.md
applies identically — on this host few-core turbo makes local[{n1}]
disproportionately fast, so raw efficiency UNDERSTATES the plan's
cluster scaling. The CC fixpoint loop (driver-paced rounds of two
aggs + two joins) and the two count() actions in sampling/stats are
the serial fractions; everything else is exchange-parallel.
""")
    print(json.dumps({
        "levels": levels,
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--ladder" in sys.argv:
        main_ladder()
    elif "--curation-scaling" in sys.argv:
        main_curation_scaling()
    elif "--curation-once" in sys.argv:
        main_curation_once()
    elif "--e2e-once" in sys.argv:
        main_e2e_once()
    elif "--probe-once" in sys.argv:
        main_probe_once()
    else:
        main_bench()
