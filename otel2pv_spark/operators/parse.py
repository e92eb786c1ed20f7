"""Parse stage — the JQExtractor analog.

The reference fuses N named JQ queries into ONE program executed once
per document (JQExtractor/jqextractor/jqTransformer.go:304-327) and
routes each extracted value by its query key (jqTransformer.go:241-265).
Here the analog is: N named extraction rules compiled into ONE
projection over ``text`` — each rule becomes one output column, all
evaluated in a single whole-stage-codegen pass over the scan (Catalyst
collapses the adjacent projections, so like the reference there is
exactly one pass per row).

Two execution paths, chosen per rule set:

- **native** (default): ``F.regexp_extract`` per rule — stays JVM-side
  inside WholeStageCodegen; this is the 100 TB hot path.
- **pandas** (grok fallback): one Arrow-vectorized struct-returning
  pandas UDF compiling all rules with Python ``re`` — for rule features
  Java regex can't express (or user-supplied grok libraries). One UDF
  call computes ALL columns (the "fused program" property), never one
  UDF per rule.

Rows failing required extractions are routed to the rejects path — the
InvalidError → reject/DLQ semantics (Server/consumers.go:776-827,
Server/dataTypes.go:71-99).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..portable_sql import GROK_PATTERNS


@dataclass(frozen=True)
class ExtractionRule:
    """One named extraction — analog of one JQ query key
    (jqTransformer.go:116-143)."""

    name: str
    pattern: str  # regex with ONE capture group
    required: bool = False
    # value rewrites applied post-extraction (e.g. '-' sentinel → '')
    null_sentinels: tuple[str, ...] = field(default_factory=tuple)


def default_rules() -> list[ExtractionRule]:
    """The transcript grok rules (FIXTURES.md §1 text format)."""
    return [
        ExtractionRule("event_type", GROK_PATTERNS["event_type"], required=True),
        ExtractionRule("event_id", GROK_PATTERNS["event_id"], required=True),
        ExtractionRule("parent_event_id", GROK_PATTERNS["parent_event_id"], null_sentinels=("-",)),
        ExtractionRule("job_name", GROK_PATTERNS["job_name"]),
        ExtractionRule("application_name", GROK_PATTERNS["application_name"]),
        ExtractionRule("body", GROK_PATTERNS["body"]),
    ]


def _native_col(rule: ExtractionRule, text_col: str) -> Column:
    c = F.regexp_extract(F.col(text_col), rule.pattern, 1)
    for s in rule.null_sentinels:
        c = F.when(c == s, F.lit("")).otherwise(c)
    return c.alias(rule.name)


def _pandas_extractor(rules: list[ExtractionRule]):
    """Compile all rules into one Arrow-batched pandas UDF returning a
    struct — the vectorized grok path. ``pd.Series.str.extract`` is
    vectorized C under the hood; one UDF invocation per Arrow batch."""
    import re

    compiled = [(r.name, re.compile(r.pattern), r.null_sentinels) for r in rules]
    schema = T.StructType([T.StructField(r.name, T.StringType()) for r in rules])

    @F.pandas_udf(schema)
    def grok(text: pd.Series) -> pd.DataFrame:
        out = {}
        for name, rx, sentinels in compiled:
            col = text.str.extract(rx, expand=False)
            col = col.fillna("")
            for s in sentinels:
                col = col.mask(col == s, "")
            out[name] = col
        return pd.DataFrame(out)

    return grok


def parse(
    df: DataFrame,
    rules: list[ExtractionRule] | None = None,
    text_col: str = "text",
    use_pandas: bool = False,
) -> DataFrame:
    """Apply all extraction rules; adds one column per rule plus
    ``parse_ok`` (all required rules matched)."""
    rules = rules if rules is not None else default_rules()
    if use_pandas:
        grok = _pandas_extractor(rules)
        df = df.withColumn("_g", grok(F.col(text_col)))
        for r in rules:
            df = df.withColumn(r.name, F.col(f"_g.{r.name}"))
        df = df.drop("_g")
    else:
        for r in rules:
            df = df.withColumn(r.name, _native_col(r, text_col))
    ok = F.lit(True)
    for r in rules:
        if r.required:
            ok = ok & (F.col(r.name) != "")
    return df.withColumn("parse_ok", ok)


def split_rejects(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Valid rows vs rejects (+reason) — the DLQ fork. One predicate and
    its negation over the same cached plan; no shuffle."""
    good = parsed.filter(F.col("parse_ok"))
    bad = parsed.filter(~F.col("parse_ok")).withColumn(
        "reject_reason", F.lit("invalid_parse")
    )
    return good, bad
