"""Isolate fanout cost: noop materialization vs partitioned parquet write."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otel2pv_spark import datagen
from otel2pv_spark.operators import route as route_op
from otel2pv_spark.plans import pipeline
from otel2pv_spark.session import get_spark

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "250000"))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(app_name=f"profile-fanout-{cpus}")
    tr = datagen.synth_transcripts(spark, n_convs=N_CONVS, partitions=64)
    tool_meta, role_meta = datagen.tool_meta(spark), datagen.role_meta(spark)
    routed_all = pipeline.build_single_pass(tr, tool_meta, role_meta, pipeline.PipelineConfig())

    # warmup both plans
    routed_all.write.format("noop").mode("overwrite").save()
    route_op.write_fanout_split(routed_all, f"/tmp/pf_{os.getpid()}_w/se", f"/tmp/pf_{os.getpid()}_w/rr")

    times = {}
    for rep in range(2):
        t0 = time.time()
        routed_all.write.format("noop").mode("overwrite").save()
        times[f"noop_{rep}"] = round(time.time() - t0, 2)
        t0 = time.time()
        route_op.write_fanout_split(routed_all, f"/tmp/pf_{os.getpid()}_{rep}/se", f"/tmp/pf_{os.getpid()}_{rep}/rr")
        times[f"write_{rep}"] = round(time.time() - t0, 2)
    print(f"PROFFAN[{cpus}] " + json.dumps(times))
    spark.stop()


if __name__ == "__main__":
    main()
