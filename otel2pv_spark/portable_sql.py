"""Dialect-portable SQL shared between Spark and the DuckDB oracle.

The driver's correctness gate compares our Spark DataFrames against
DuckDB running ANSI SQL over the same parquet tables. Everything here is
written in the common subset of Spark SQL and DuckDB SQL and is the
SINGLE source of truth for:

- the deterministic derivation of the ``transcripts`` table from the
  driver-generated ``events`` parquet (no external data, seed-free —
  pure column arithmetic, so both engines reproduce it bit-identically);
- the enrichment dimension tables (``tool_meta`` / ``role_meta``),
  the analog of the reference's per-producer routing config
  (Server/setupServers.go:224-249) and JSON-schema side config;
- the grok field-extraction regexes (the analog of the JQ queries that
  JQExtractor fuses into one program, jqTransformer.go:304-316).

Portability rules used: CAST(x AS STRING), ``||`` concat, lpad,
row_number() OVER, ``%`` on non-negative ints, floor(), regexp_extract
(returns '' on no match in BOTH engines), CASE WHEN, UNION ALL.
"""

from __future__ import annotations

# How many turns per conversation the derivation slices a user's event
# stream into. 12 → conversations of 12 turns (last one per user partial).
TURNS_PER_CONV = 12

# One in MALFORMED_MOD rows gets non-grok text → exercises the rejects
# path (InvalidError analog, Server/consumers.go:776-790).
MALFORMED_MOD = 97

# The transcripts derivation: events(event_id, ts, user_id, event_type,
# value, props) → transcripts(conv_id, turn_idx, role, text, tool, ts).
# Deterministic: row_number ties broken by unique event_id.
TRANSCRIPTS_CTE = f"""
_ev AS (
  SELECT event_id, ts, user_id, event_type, props,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS rn
  FROM events
),
_tr AS (
  SELECT
    'conv-' || lpad(CAST(user_id AS STRING), 4, '0') || '-'
            || lpad(CAST(CAST(floor(rn / {TURNS_PER_CONV}.0) AS INT) AS STRING), 6, '0') AS conv_id,
    CAST(rn % {TURNS_PER_CONV} AS INT) AS turn_idx,
    event_id, ts, user_id, event_type, props
  FROM _ev
),
transcripts AS (
  SELECT
    conv_id,
    turn_idx,
    CASE WHEN turn_idx % 3 = 0 THEN 'user'
         WHEN turn_idx % 3 = 1 THEN 'assistant'
         ELSE 'tool' END AS role,
    CASE
      WHEN event_id % {MALFORMED_MOD} = 0 THEN 'garbled ' || props
      ELSE 'event=' || event_type
        || ' id=' || conv_id || ':' || CAST(turn_idx AS STRING)
        || ' parent=' || CASE WHEN turn_idx = 0 THEN '-'
                              ELSE conv_id || ':' || CAST(turn_idx - 1 AS STRING) END
        || ' job=job-' || CAST(user_id % 5 AS STRING)
        || ' app=app-' || CAST(event_id % 3 AS STRING)
        || ' :: ' || props
    END AS text,
    CASE WHEN turn_idx % 3 = 2 THEN 'tool-' || CAST(event_id % 8 AS STRING)
         ELSE '' END AS tool,
    ts
  FROM _tr
)
"""

# Enrichment dims — the MapSinkServer routing config re-expressed as
# broadcast-join dimension tables (Server/server.go:141-160).
TOOL_META_ROWS = [
    ("tool-0", "search", "owner-a", "sink_search"),
    ("tool-1", "code", "owner-a", "sink_code"),
    ("tool-2", "browse", "owner-b", "sink_search"),
    ("tool-3", "code", "owner-b", "sink_code"),
    ("tool-4", "db", "owner-c", "sink_db"),
    ("tool-5", "db", "owner-c", "sink_db"),
    ("tool-6", "search", "owner-a", "sink_search"),
    ("tool-7", "misc", "owner-d", "sink_misc"),
]
ROLE_META_ROWS = [
    ("user", "human", "sink_user"),
    ("assistant", "model", "sink_assistant"),
    ("tool", "machine", "sink_tool"),
]


def _union_values(rows: list[tuple[str, ...]], cols: list[str]) -> str:
    sel = []
    for i, r in enumerate(rows):
        if i == 0:
            vals = ", ".join(f"'{v}' AS {c}" for v, c in zip(r, cols))
        else:
            vals = ", ".join(f"'{v}'" for v in r)
        sel.append(f"SELECT {vals}")
    return "\n  UNION ALL ".join(sel)


TOOL_META_CTE = "tool_meta AS (\n  " + _union_values(
    TOOL_META_ROWS, ["tool", "tool_category", "owner", "tool_sink"]
) + "\n)"
ROLE_META_CTE = "role_meta AS (\n  " + _union_values(
    ROLE_META_ROWS, ["role", "role_kind", "default_sink"]
) + "\n)"

# Versioned tool-config dimension for the as-of join (SCD-2 style: each
# tool has versions v1/v2/v3 becoming effective at staggered timestamps
# inside the events window, so turns before 2024-01-03 match nothing and
# v1→v2→v3 boundaries land mid-corpus). TIMESTAMP literals parse
# identically in Spark SQL (session TZ UTC) and DuckDB (naive).
TOOL_VERSION_ROWS: list[tuple[str, str, str, int]] = [
    (f"tool-{k}", f"2024-01-{day:02d} {hh:02d}:00:00", ver, base + k)
    for k in range(8)
    for day, hh, ver, base in (
        (3, k, "v1", 100),
        (11, 2 * k, "v2", 200),
        (21, 3 * k, "v3", 300),
    )
]

TOOL_VERSIONS_CTE = "tool_versions AS (\n  " + "\n  UNION ALL ".join(
    (
        f"SELECT '{t}' AS tool, TIMESTAMP '{vf}' AS valid_from, "
        f"'{v}' AS version, CAST({rev} AS BIGINT) AS config_rev"
        if i == 0
        else f"SELECT '{t}', TIMESTAMP '{vf}', '{v}', CAST({rev} AS BIGINT)"
    )
    for i, (t, vf, v, rev) in enumerate(TOOL_VERSION_ROWS)
) + "\n)"

# Maintenance-window interval dim for the overlap join: per tool, a
# short window, a long (day-crossing) window, and a third that OVERLAPS
# the long one so point-in-interval lookups can multi-match. Boundaries
# land mid-corpus (transcripts span 2024-01-01 .. 2024-01-30).
MAINT_ROWS: list[tuple[str, str, str, str, str]] = [
    row
    for k in range(8)
    for row in (
        (f"mw-{k}-a", f"tool-{k}", f"2024-01-05 {k:02d}:00:00",
         f"2024-01-05 {k + 6:02d}:00:00", "patch"),
        (f"mw-{k}-b", f"tool-{k}", f"2024-01-14 {2 * k:02d}:00:00",
         f"2024-01-{15 + k // 4:02d} {(2 * k + 5) % 24:02d}:00:00",
         "upgrade"),
        (f"mw-{k}-c", f"tool-{k}", f"2024-01-14 {(2 * k + 2) % 24:02d}:00:00",
         f"2024-01-15 {k:02d}:00:00", "audit"),
    )
]

MAINT_CTE = "maint AS (\n  " + "\n  UNION ALL ".join(
    (
        f"SELECT '{w}' AS window_id, '{t}' AS tool, "
        f"TIMESTAMP '{s}' AS start_ts, TIMESTAMP '{e}' AS end_ts, "
        f"'{r}' AS reason"
        if i == 0
        else f"SELECT '{w}', '{t}', TIMESTAMP '{s}', TIMESTAMP '{e}', '{r}'"
    )
    for i, (w, t, s, e, r) in enumerate(MAINT_ROWS)
) + "\n)"

# Grok extraction regexes — one per named "query key", the analog of the
# fused JQ program (jqTransformer.go:304-327). Portable RE2 ∩ Java-regex
# subset; group 1 is the captured value; '' (no match) == extraction miss.
GROK_PATTERNS: dict[str, str] = {
    "event_type": "event=([A-Za-z0-9_.-]+)",
    "event_id": " id=([A-Za-z0-9:_-]+)",
    "parent_event_id": " parent=([A-Za-z0-9:_-]+)",
    "job_name": " job=([A-Za-z0-9_-]+)",
    "application_name": " app=([A-Za-z0-9_-]+)",
    "body": " :: (.*)",
}

# SQL expression fragment applying all grok patterns to transcripts.text.
# parent '-' sentinel → '' (reference: absent parentId is empty string,
# groupandverify.go:53, sequencer.go:588).
PARSE_SELECT = """
  conv_id, turn_idx, role, tool, ts, text,
  regexp_extract(text, 'event=([A-Za-z0-9_.-]+)', 1)          AS event_type,
  regexp_extract(text, ' id=([A-Za-z0-9:_-]+)', 1)            AS event_id,
  CASE WHEN regexp_extract(text, ' parent=([A-Za-z0-9:_-]+)', 1) = '-' THEN ''
       ELSE regexp_extract(text, ' parent=([A-Za-z0-9:_-]+)', 1) END AS parent_event_id,
  regexp_extract(text, ' job=([A-Za-z0-9_-]+)', 1)            AS job_name,
  regexp_extract(text, ' app=([A-Za-z0-9_-]+)', 1)            AS application_name,
  regexp_extract(text, ' :: (.*)', 1)                         AS body,
  CASE WHEN regexp_extract(text, 'event=([A-Za-z0-9_.-]+)', 1) <> ''
        AND regexp_extract(text, ' id=([A-Za-z0-9:_-]+)', 1) <> ''
       THEN TRUE ELSE FALSE END                               AS parse_ok
"""

PARSED_CTE = f"parsed AS (\n  SELECT {PARSE_SELECT} FROM transcripts\n)"


def with_transcripts(
    body_sql: str, extra_ctes: list[str] | None = None, recursive: bool = False
) -> str:
    """Wrap ``body_sql`` with the transcripts (+optional dims/parse) CTEs."""
    ctes = [TRANSCRIPTS_CTE.strip().rstrip()]
    for c in extra_ctes or []:
        ctes.append(c.strip())
    kw = "WITH RECURSIVE " if recursive else "WITH "
    return kw + ",\n".join(ctes) + "\n" + body_sql


# ---------------------------------------------------------------------------
# Tree-node fixture: a deterministic binary tree per conversation over the
# parsed turns (node at position i has children 2i+1 / 2i+2 below the turn
# count), with seeded corruptions exercising the GroupAndVerify/Sequencer
# tree paths (file:line into /root/reference):
#   - user % 5 == 0  → node at position 3 dropped: its parent's forward
#     reference dangles and its children become extra roots
#     (placeholder pruning, groupandverify.go:855-859,913-917; missing-
#     child dummy, sequencer.go:519-529)
#   - user % 7 == 1  → node 5's parent_id points at node 0 instead of 2:
#     forward/backward balance broken both ways (groupandverify.go:555-671)
#   - user % 11 == 2 → exact duplicate of node 1 (dup kept, equal,
#     groupandverify.go:839-861 / sequencer.go:874-880)
#   - user % 11 == 3 → conflicting duplicate of node 1 (parent differs):
#     dup_mismatch / whole conversation unsequenceable (sequencer.go:572-587)
# Pure column arithmetic — Spark and DuckDB reproduce it bit-identically.
TREE_BASE_CTE = """tree_base AS (
  SELECT p.conv_id, p.turn_idx,
         count(*) OVER (PARTITION BY p.conv_id) AS n_turns,
         CAST(substr(p.conv_id, 6, 4) AS INT) AS user_num,
         p.conv_id || ':' || CAST(p.turn_idx AS STRING) AS node_id,
         p.role AS node_type,
         CAST(p.turn_idx + 1 AS BIGINT) AS ts_long
  FROM parsed p WHERE p.parse_ok
)"""

TREE_NODES_CTE = """tree_nodes AS (
  SELECT conv_id, node_id, node_type, ts_long,
    CASE WHEN turn_idx = 0 THEN ''
         WHEN user_num % 7 = 1 AND turn_idx = 5 THEN conv_id || ':0'
         ELSE conv_id || ':' || CAST(CAST(floor((turn_idx - 1) / 2.0) AS INT) AS STRING)
    END AS parent_id,
    CASE WHEN 2 * turn_idx + 1 < n_turns
         THEN conv_id || ':' || CAST(2 * turn_idx + 1 AS STRING) ELSE '' END AS child1,
    CASE WHEN 2 * turn_idx + 2 < n_turns
         THEN conv_id || ':' || CAST(2 * turn_idx + 2 AS STRING) ELSE '' END AS child2,
    CAST(turn_idx * 2 AS BIGINT) AS arrival_pos
  FROM tree_base
  WHERE NOT (user_num % 5 = 0 AND turn_idx = 3)
  UNION ALL
  SELECT conv_id, node_id, node_type, ts_long,
    conv_id || ':0' AS parent_id,
    CASE WHEN 3 < n_turns THEN conv_id || ':3' ELSE '' END AS child1,
    CASE WHEN 4 < n_turns THEN conv_id || ':4' ELSE '' END AS child2,
    CAST(turn_idx * 2 + 1 AS BIGINT) AS arrival_pos
  FROM tree_base WHERE user_num % 11 = 2 AND turn_idx = 1
  UNION ALL
  SELECT conv_id, node_id, node_type, ts_long,
    '' AS parent_id,
    CASE WHEN 3 < n_turns THEN conv_id || ':3' ELSE '' END AS child1,
    CASE WHEN 4 < n_turns THEN conv_id || ':4' ELSE '' END AS child2,
    CAST(turn_idx * 2 + 1 AS BIGINT) AS arrival_pos
  FROM tree_base WHERE user_num % 11 = 3 AND turn_idx = 1
)"""

TREE_CTES = [PARSED_CTE, TREE_BASE_CTE, TREE_NODES_CTE]
