"""Multi-format document/transcript sources with a decode gate.

The reference's consumers decode AMQP payloads and route undecodable
messages to an error path instead of crashing the pipe
(Server/consumers.go:638-651 ack-after-success; the S3 validity gate in
SURVEY §2). This is that contract for file formats Spark reads
natively: JSON-lines and CSV land with an enforced schema in PERMISSIVE
mode, and rows that failed to decode are ROUTED (with the raw record
preserved) rather than silently dropped or fatally thrown.

Scale notes: the split needs the scan materialized once
(``snapshot()`` — a lineage cut) because Spark refuses to filter on the internal
corrupt-record column straight off the scan (it could be pruned away
before the parser runs). That one materialization is the price of a
DLQ split in any engine; on the real target the checkpoint is a few
MB per task of columnar batches, not a second input copy. Parquet is
self-describing and arrives through the plain reader (a corrupt
parquet FILE is a storage incident, not a row-level event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..snapshot import snapshot

CORRUPT_COL = "_corrupt_record"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_with_dlq(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    schema: T.StructType = DOC_SCHEMA,
    key_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read documents/turns from ``fmt`` ∈ {parquet, jsonl, csv} and
    split into (good, rejects). Rejects carry (raw_record,
    reject_reason); a row is rejected when the parser could not decode
    it against the schema, or when ``key_col`` (required key) is NULL
    after decoding — the validity-gate analog of parse.split_rejects
    for transport-level decode failures."""
    if fmt == "parquet":
        df = spark.read.schema(schema).parquet(path)
        corrupt = F.lit(None).cast("string")
    elif fmt in ("jsonl", "json"):
        df = (
            spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
        corrupt = F.col(CORRUPT_COL)
    elif fmt == "csv":
        df = (
            spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("header", "true")
            .csv(path)
        )
        corrupt = F.col(CORRUPT_COL)
    else:
        raise ValueError(f"unsupported format: {fmt!r}")

    if fmt != "parquet":
        # Spark refuses to filter the internal corrupt column straight
        # off the scan; one materialization funds the DLQ split
        df = df.transform(snapshot)

    reason = F.when(corrupt.isNotNull(), F.lit("decode_error"))
    if key_col is not None:
        reason = reason.when(F.col(key_col).isNull(), F.lit("missing_key"))

    flagged = df.withColumn("_reject_reason", reason)
    good = flagged.filter(F.col("_reject_reason").isNull()).select(
        *[f.name for f in schema.fields]
    )
    # "raw record preserved": the corrupt column only holds the raw
    # text when the PARSER failed — a missing_key row decoded fine, so
    # its raw form is reconstructed from the decoded columns (and for
    # parquet, where no corrupt column exists, always is). to_json of
    # the schema struct is lossless for replay/inspection.
    decoded_json = F.to_json(F.struct(*[F.col(f.name) for f in schema.fields]))
    raw = (
        F.coalesce(corrupt, decoded_json)
        if fmt != "parquet"
        else decoded_json
    )
    rejects = flagged.filter(F.col("_reject_reason").isNotNull()).select(
        raw.alias("raw_record"),
        F.col("_reject_reason").alias("reject_reason"),
    )
    return good, rejects
