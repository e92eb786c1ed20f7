"""Job entrypoint — the RunApp/--config analog.

The reference boots from ``main --config config.json`` through
``Server.RunApp`` → ``ReadConfigJSON`` → ``SetupAndRunApp``
(Server/runApp.go:32-44, Server/utils.go:64-70,
Server/setupServers.go:367-394), with typed config structs and
required-field validation (setupServers.go:80-139). This module is the
Spark equivalent: a JSON job config ingested into ``PipelineConfig``
(+ session settings), validated with the same spirit of explicit
errors, then one driver run — submitted as

    spark-submit --py-files otel2pv_spark.zip -m otel2pv_spark.job \
        --config job.json

or locally ``python -m otel2pv_spark.job --config job.json``.

Config schema (all optional except input/out_root)::

    {
      "input":   {"events_dir": ".../sf0.01"} | {"transcripts_path": "..."},
      "out_root": "/data/otel2pv_out",
      "run_id":  "2026-08-17-a",
      "parse":   {"use_pandas": false},
      "sequence": {"out_col": "previous_event_ids", "array_mode": true,
                   "id_map_col": null, "gap_reset": true,
                   "hot_block_size": null,
                   "tree_mode": false, "tree_buckets": null},
      "group_applies": [["job_name", "event_type", "error"], ...],
      "spark":   {"master": "local[16]", "shuffle_partitions": 32,
                  "extra": {"spark.foo": "bar"}},
      "incremental": {"changed_convs": ["conv-0001-000002", ...]}
                  // or {"changed_convs_path": ".../keys.parquet"} —
                  // when present, run_incremental merges instead of a
                  // full run (late/changed-data re-processing)
    }
"""

from __future__ import annotations

import argparse
import json
import sys

from .plans.pipeline import PipelineConfig


class ConfigError(ValueError):
    """Invalid job config — the Config.IngestConfig error analog
    (Server/setupServers.go:99-139)."""


def load_config(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    if not isinstance(raw, dict):
        raise ConfigError("config root must be a JSON object")
    inp = raw.get("input")
    if not isinstance(inp, dict) or not (
        "events_dir" in inp or "transcripts_path" in inp
    ):
        raise ConfigError(
            "input must set events_dir (driver tables) or transcripts_path (parquet)"
        )
    if not raw.get("out_root"):
        raise ConfigError("out_root is required")
    ga = raw.get("group_applies", [])
    if not all(isinstance(g, (list, tuple)) and len(g) == 3 for g in ga):
        raise ConfigError(
            "group_applies entries must be [share_col, identifying_col, value]"
        )
    inc = raw.get("incremental")
    if inc is not None and (
        not isinstance(inc, dict)
        or not ("changed_convs" in inc or "changed_convs_path" in inc)
    ):
        raise ConfigError(
            "incremental must set changed_convs (list) or changed_convs_path"
        )
    return raw


def to_pipeline_config(raw: dict) -> PipelineConfig:
    seq = raw.get("sequence", {})
    return PipelineConfig(
        out_root=raw["out_root"],
        use_pandas_parse=bool(raw.get("parse", {}).get("use_pandas", False)),
        seq_array_mode=bool(seq.get("array_mode", True)),
        seq_out_col=seq.get("out_col", "previous_event_ids"),
        seq_id_map_col=seq.get("id_map_col"),
        gap_reset=bool(seq.get("gap_reset", True)),
        group_applies=[tuple(g) for g in raw.get("group_applies", [])],
        hot_block_size=seq.get("hot_block_size"),
        tree_mode=bool(seq.get("tree_mode", False)),
        tree_buckets=seq.get("tree_buckets"),
        run_id=raw.get("run_id"),
    )


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", required=True)
    args = ap.parse_args(argv)

    raw = load_config(args.config)
    cfg = to_pipeline_config(raw)

    from . import datagen
    from .plans import pipeline
    from .session import get_spark

    sp = raw.get("spark", {})
    spark = get_spark(
        master=sp.get("master"),
        shuffle_partitions=sp.get("shuffle_partitions"),
        extra=sp.get("extra"),
        app_name=f"otel2pv-{cfg.run_id or 'job'}",
    )
    inp = raw["input"]
    if "events_dir" in inp:
        transcripts = datagen.transcripts_from_events(spark, inp["events_dir"])
    else:
        transcripts = spark.read.parquet(inp["transcripts_path"])
    incr = raw.get("incremental")
    if incr:
        if "changed_convs_path" in incr:
            keys = spark.read.parquet(incr["changed_convs_path"])
        else:
            keys = incr.get("changed_convs", [])
        res = pipeline.run_incremental(spark, transcripts, cfg, keys)
    else:
        res = pipeline.run(spark, transcripts, cfg)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    try:
        main()
    except ConfigError as e:
        print(f"config error: {e}", file=sys.stderr)
        sys.exit(2)
