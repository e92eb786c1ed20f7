"""Enrich stage — broadcast-join metadata + sink routing.

The routing analog of MapSinkServer (Server/server.go:141-160): each row
gets a ``sink`` column; downstream the route stage fans out one write
per sink. Dimension tables are tiny → always broadcast (no shuffle;
verified in tests via the physical plan containing BroadcastHashJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    tool_meta: DataFrame,
    role_meta: DataFrame,
) -> DataFrame:
    """Left-join tool/role metadata; route: tool sink wins over role
    default sink (routing-key lookup, server.go:146-156)."""
    out = (
        df.join(F.broadcast(tool_meta), "tool", "left")
        .join(F.broadcast(role_meta), "role", "left")
        .withColumn(
            "sink",
            F.when(
                (F.col("tool") != "") & F.col("tool_sink").isNotNull(), F.col("tool_sink")
            ).otherwise(F.col("default_sink")),
        )
    )
    return out
