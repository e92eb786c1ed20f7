"""Validation stage — the per-key JSON-Schema gate (P4).

The reference optionally compiles a JSON Schema per query key and
validates every extracted value before routing; failures become
``InvalidError`` → return-to-sender
(JQExtractor/jqextractor/jqTransformer.go:89-114,332-343,246-252;
validator interface Server/utils.go:73-83).

The Spark-native analog: a config-driven list of column constraints
compiled into ONE boolean predicate per rule, evaluated inside
whole-stage codegen (no UDF, no second pass). Violating rows pick up a
``validation_error`` reason (first failing rule, like a schema
validator reporting the first violation) and can be routed to the
rejects sink exactly like parse failures.

Constraint surface (mirrors what the reference's JSON-Schema configs in
deploy/ actually use — required/type/enum/pattern, e.g.
JQExtractor/deploy/config/jsonSchema1.json):

- ``required``      — non-null, non-empty string
- ``enum``          — value ∈ fixed set
- ``pattern``       — full-match regex
- ``castable``      — value casts to the given type (int/long/double/
                      timestamp), the "type" keyword analog
- ``min_length`` / ``max_length`` — string length bounds
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnRule:
    """One constraint on one column — analog of one JSON-Schema keyword
    applied to one extraction key."""

    column: str
    required: bool = False
    enum: tuple[str, ...] = ()
    pattern: str | None = None          # full-match (regexp anchored)
    castable: str | None = None         # e.g. "int", "timestamp"
    min_length: int | None = None
    max_length: int | None = None

    def predicate(self) -> Column:
        c = F.col(self.column)
        s = c.cast("string")  # emptiness/length checks work for any type
        ok = F.lit(True)
        if self.required:
            ok = ok & c.isNotNull() & (s != "")
        present = c.isNotNull() & (s != "")
        checks = F.lit(True)
        if self.enum:
            checks = checks & c.isin(list(self.enum))
        if self.pattern is not None:
            checks = checks & s.rlike(f"^(?:{self.pattern})$")
        if self.castable is not None:
            checks = checks & c.cast(self.castable).isNotNull()
        if self.min_length is not None:
            checks = checks & (F.length(s) >= self.min_length)
        if self.max_length is not None:
            checks = checks & (F.length(s) <= self.max_length)
        return ok & (~present | checks)

    def name(self) -> str:
        return f"invalid_{self.column}"


def validate(
    df: DataFrame,
    rules: list[ColumnRule],
    error_col: str = "validation_error",
) -> DataFrame:
    """Evaluate every rule in one codegen pass; ``error_col`` is the
    FIRST failing rule's name, null when the row is valid (one fused
    CASE expression — the single-program property of P1 applied to
    validation)."""
    err = F.lit(None).cast("string")
    for r in reversed(rules):
        err = F.when(~r.predicate(), F.lit(r.name())).otherwise(err)
    return df.withColumn(error_col, err)


def split_valid(
    df: DataFrame, error_col: str = "validation_error"
) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) fork — same shape as parse.split_rejects."""
    good = df.filter(F.col(error_col).isNull())
    bad = df.filter(F.col(error_col).isNotNull())
    return good, bad


def default_event_rules() -> list[ColumnRule]:
    """Validation for the parsed transcript event fields (the analog of
    the deploy JSON Schemas validating extracted span fields)."""
    return [
        ColumnRule("event_id", required=True, pattern=r"[A-Za-z0-9:_\-]+"),
        ColumnRule(
            "event_type", required=True,
            enum=("view", "click", "purchase", "error"),
        ),
        ColumnRule("parent_event_id", pattern=r"[A-Za-z0-9:_\-]+"),
        ColumnRule("job_name", max_length=64),
        ColumnRule("turn_idx", required=True, castable="int"),
    ]
