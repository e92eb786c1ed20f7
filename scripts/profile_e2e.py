"""Per-phase timing of the e2e pipeline at $SPARK_GRAFT_CPUS.

Replicates plans/pipeline.run() with a timer around each action so we
can see which phase fails to scale between local[4] and local[16].
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otel2pv_spark import datagen
from otel2pv_spark.operators import aggregate as agg_op
from otel2pv_spark.operators import enrich as enrich_op
from otel2pv_spark.operators import parse as parse_op
from otel2pv_spark.operators import route as route_op
from otel2pv_spark.plans import pipeline
from otel2pv_spark.session import get_spark

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "250000"))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(app_name=f"profile-{cpus}")
    tr = datagen.synth_transcripts(spark, n_convs=N_CONVS, partitions=64)
    cfg = pipeline.PipelineConfig(out_root=f"/tmp/otel2pv_prof_{os.getpid()}", run_id="prof")

    tool_meta = datagen.tool_meta(spark)
    role_meta = datagen.role_meta(spark)

    # warmup full run
    pipeline.run(spark, tr, pipeline.PipelineConfig(
        out_root=f"/tmp/otel2pv_prof_{os.getpid()}_warm", run_id="warm"))

    times = {}
    t_all = time.time()

    t0 = time.time()
    parsed = parse_op.parse(tr, use_pandas=False).persist()
    parsed.count()
    times["persist_parsed"] = round(time.time() - t0, 2)

    good, parse_rejects = parse_op.split_rejects(parsed)
    enriched = enrich_op.enrich(good, tool_meta, role_meta)
    from otel2pv_spark.operators import verify as verify_op
    ver = verify_op.chain_verify(parsed).select("conv_id", "verified")
    enriched = enriched.join(ver, "conv_id", "left")

    t0 = time.time()
    seq = pipeline._apply_sequence(enriched, cfg).persist()
    seq.count()
    times["persist_seq"] = round(time.time() - t0, 2)

    routable, route_rejects = route_op.route(seq, pipeline.KNOWN_SINKS)
    routable = routable.select(*pipeline.OUTPUT_COLS)
    rejects = parse_rejects.select(
        "conv_id", "turn_idx", "text", "reject_reason"
    ).unionByName(route_rejects.select("conv_id", "turn_idx", "text", "reject_reason"))

    t0 = time.time()
    route_op.write_fanout(routable, cfg.out_root + "/sequenced_events")
    times["write_fanout"] = round(time.time() - t0, 2)

    t0 = time.time()
    rejects.write.mode("overwrite").parquet(cfg.out_root + "/rejects")
    times["write_rejects"] = round(time.time() - t0, 2)

    t0 = time.time()
    agg_op.metrics(routable, "prof").write.mode("overwrite").parquet(cfg.out_root + "/_metrics")
    times["write_metrics"] = round(time.time() - t0, 2)

    t0 = time.time()
    agg_op.lineage(routable, "prof", "sequence").write.mode("overwrite").parquet(cfg.out_root + "/_lineage")
    times["write_lineage"] = round(time.time() - t0, 2)

    t0 = time.time()
    n = routable.count()
    times["final_count"] = round(time.time() - t0, 2)

    times["TOTAL"] = round(time.time() - t_all, 2)
    times["rows"] = n
    print(f"PROFILE[{cpus}] " + json.dumps(times))
    spark.stop()


if __name__ == "__main__":
    main()
