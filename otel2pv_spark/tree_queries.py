"""Driver queries for the general-tree operators (G1-G3/G8, Q1-Q12).

Both sides consume the SAME deterministic tree-node fixture
(``portable_sql.TREE_CTES`` — binary tree per conversation with seeded
corruptions); the Spark side runs the real operators
(``operators.verify.verify_trees`` edge-join verification and
``operators.sequence_tree.sequence_tree`` applyInPandas DFS kernel),
while the oracle re-derives the answers independently in DuckDB SQL:
verification via UNION-ALL edge sets + full-outer join, DFS emission
via a recursive CTE whose path keys sort into post-order (child digits
sort below the ``~`` terminator, so every subtree precedes its parent
and siblings keep child_ids order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import datagen
from .operators import sequence_tree as tree_op
from .operators import verify as verify_op
from .portable_sql import TREE_CTES, with_transcripts


def tree_nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture as NODE_SCHEMA rows (child1/child2 → child_ids array)."""
    datagen.load_events(spark, sf_dir).createOrReplaceTempView("events")
    df = spark.sql(with_transcripts("SELECT * FROM tree_nodes", TREE_CTES))
    return df.select(
        "conv_id",
        "node_id",
        "parent_id",
        F.filter(F.array("child1", "child2"), lambda x: x != "").alias("child_ids"),
        "node_type",
        F.col("ts_long").alias("timestamp"),
        F.create_map(F.lit("event_id"), F.col("node_id")).alias("app_json"),
        "arrival_pos",
    )


def q_tree_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2/G3/G8 with the reference's FULL duplicate inequality — the
    deep compare spans nodeType/timestamp/appJSON too
    (groupandverify.go:816-826); the map payload is serialized with
    sorted entries for the distinct-agg."""
    nodes = tree_nodes_df(spark, sf_dir).withColumn(
        "_app_ser",
        F.to_json(F.map_from_entries(F.array_sort(F.map_entries("app_json")))),
    )
    per_conv, _ = verify_op.verify_trees(
        nodes,
        arrival_col="arrival_pos",
        payload_cols=("node_type", "timestamp", "_app_ser"),
    )
    return per_conv


def _pvs_types(spark: SparkSession) -> DataFrame:
    """parentVerifySet config (groupandverify.go:148-183): 'assistant'
    nodes' children are known only by backward links, expected 2."""
    return spark.createDataFrame(
        [("assistant", 2)], "node_type string, expected_children int"
    )


def q_tree_pvs_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 observable: per-pvs-parent distinct backward-children count vs
    its configured expectation (groupandverify.go:632-664)."""
    return verify_op.parent_verify_counts(
        tree_nodes_df(spark, sf_dir), _pvs_types(spark), arrival_col="arrival_pos"
    )


def q_tree_verify_pvs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 end-to-end: per-conv verification under a parentVerifySet
    config — pvs parents skip the forward-edge requirement but must hit
    their exact backward-children count."""
    per_conv, _ = verify_op.verify_trees(
        tree_nodes_df(spark, sf_dir),
        parent_verify_types=_pvs_types(spark),
        arrival_col="arrival_pos",
    )
    return per_conv


def q_tree_pvs_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 violation path: a pvs-typed node with NON-empty child_ids is
    an error in the reference (groupandverify.go:632-650)."""
    _, rejects = verify_op.verify_trees(
        tree_nodes_df(spark, sf_dir),
        parent_verify_types=_pvs_types(spark),
        arrival_col="arrival_pos",
    )
    return rejects


def q_tree_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tree_op.sequence_tree(tree_nodes_df(spark, sf_dir))
    return out.select(
        "conv_id", "emit_pos", "node_id", "prev", "is_duplicate", "sequenceable"
    )


def q_tree_sequence_idmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 outputAppFieldSequenceIdMap: prev-link values come from the
    payload's mapped field (sequencer.go:685-731) — here
    app_json['event_id'] = 'ev-<node_id>', so every non-null prev is the
    mapped value, not the node id."""
    nodes = tree_nodes_df(spark, sf_dir).withColumn(
        "app_json",
        F.create_map(F.lit("event_id"), F.concat(F.lit("ev-"), F.col("node_id"))),
    )
    out = tree_op.sequence_tree(
        nodes, tree_op.TreeSequencerConfig(seq_id_map_field="event_id")
    )
    return out.select(
        "conv_id", "emit_pos", "node_id", "prev", "is_duplicate", "sequenceable"
    )


def q_tree_sequence_bwall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 childrenByBackwardsLink ALL (sequencer.go:621-640): parents
    cited by ≥1 backward link get their child list REPLACED (built in
    arrival order, exchange-sorted by timestamp); parents nobody cites
    keep their original childIds; backward children of absent parents
    are re-rooted. emit_pos is intentionally NOT projected: chain ORDER
    across roots follows the kernel's dict-insertion root order
    (arrival-deterministic but not SQL-portable); prev links and flags
    are chain-local and fully checkable."""
    cfg = tree_op.TreeSequencerConfig(backwards_link_all=True)
    out = tree_op.sequence_tree(tree_nodes_df(spark, sf_dir), cfg)
    return out.select("conv_id", "node_id", "prev", "is_duplicate", "sequenceable")


def q_tree_sequence_bwtypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 childrenByBackwardsLink for listed nodeTypes only
    (sequencer.go:599-604,642-662): 'assistant' parents' child lists are
    rebuilt from backward links (empty when none), all other nodes keep
    their original child_ids."""
    cfg = tree_op.TreeSequencerConfig(
        backwards_link_node_types=frozenset({"assistant"})
    )
    out = tree_op.sequence_tree(tree_nodes_df(spark, sf_dir), cfg)
    return out.select("conv_id", "node_id", "prev", "is_duplicate", "sequenceable")


QUERIES = {
    "tree_verify": q_tree_verify,
    "tree_pvs_counts": q_tree_pvs_counts,
    "tree_verify_pvs": q_tree_verify_pvs,
    "tree_pvs_rejects": q_tree_pvs_rejects,
    "tree_sequence": q_tree_sequence,
    "tree_sequence_idmap": q_tree_sequence_idmap,
    "tree_sequence_bwall": q_tree_sequence_bwall,
    "tree_sequence_bwtypes": q_tree_sequence_bwtypes,
}


# ------------------------------------------------------------- oracles
_CANON_CTE = """canon AS (
  SELECT * FROM tree_nodes
  QUALIFY row_number() OVER (PARTITION BY conv_id, node_id ORDER BY arrival_pos) = 1
)"""


def _dupstats_cte(deep: bool) -> str:
    """dup accounting; ``deep`` adds node_type/ts to the inequality (the
    app_json payload is 1:1 with node_id in this fixture, so its
    serialization is constant per group and adds nothing here)."""
    key = "parent_id || '|' || child1 || '|' || child2"
    if deep:
        key += " || '|' || node_type || '|' || CAST(ts_long AS STRING)"
    return f"""dupstats AS (
  SELECT conv_id, count(*) AS n_nodes,
         -- CAST: untyped DuckDB sum() yields HUGEINT; Spark emits BIGINT
         CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_nodes,
         bool_or(ndist > 1) AS dup_mismatch
  FROM (
    SELECT conv_id, node_id, count(*) AS cnt,
           count(DISTINCT {key}) AS ndist
    FROM tree_nodes GROUP BY conv_id, node_id
  ) GROUP BY conv_id
)"""


_FWD_CTE = """fwd AS (
  SELECT conv_id, node_id AS parent, child1 AS child FROM canon WHERE child1 <> ''
  UNION ALL
  SELECT conv_id, node_id, child2 FROM canon WHERE child2 <> ''
)"""

_BWD_CTE = """bwd AS (
  SELECT conv_id, parent_id AS parent, node_id AS child FROM canon WHERE parent_id <> ''
)"""

_BAL_CTE = """bal AS (
  SELECT coalesce(f.conv_id, b.conv_id) AS conv_id,
         coalesce(f.parent, b.parent) AS parent,
         coalesce(f.child, b.child) AS child,
         f.parent IS NOT NULL AS fwd_ok, b.parent IS NOT NULL AS bwd_ok
  FROM fwd f FULL OUTER JOIN bwd b
    ON f.conv_id = b.conv_id AND f.parent = b.parent AND f.child = b.child
)"""

# per-parent distinct backward-children counts (shared by pvs oracles)
_BWD_COUNTS_CTE = """bwdcounts AS (
  SELECT conv_id, parent_id AS parent, count(DISTINCT node_id) AS n
  FROM canon WHERE parent_id <> '' GROUP BY conv_id, parent_id
)"""

_PVSP_CTE = """pvsp AS (
  SELECT conv_id, node_id AS parent FROM canon WHERE node_type = 'assistant'
)"""

ORACLES: dict[str, str] = {}

ORACLES["tree_verify"] = with_transcripts(
    """SELECT d.conv_id, d.n_nodes, d.n_dup_nodes,
       d.dup_mismatch, coalesce(e.edges_ok, TRUE) AS verified
FROM dupstats d LEFT JOIN edges e ON d.conv_id = e.conv_id""",
    TREE_CTES
    + [
        _CANON_CTE,
        _dupstats_cte(deep=True),
        _FWD_CTE,
        _BWD_CTE,
        _BAL_CTE,
        """edges AS (
  SELECT bal.conv_id,
         bool_and(bal.fwd_ok AND bal.bwd_ok AND r.node_id IS NOT NULL) AS edges_ok
  FROM bal LEFT JOIN canon r
    ON bal.conv_id = r.conv_id AND bal.parent = r.node_id
  GROUP BY bal.conv_id
)""",
    ],
)

ORACLES["tree_pvs_counts"] = with_transcripts(
    """SELECT c.conv_id, c.node_id AS parent,
       coalesce(k.n, 0) AS n_bwd_children,
       CAST(2 AS INT) AS expected_children,
       coalesce(k.n, 0) = 2 AS pvs_ok
FROM canon c
LEFT JOIN bwdcounts k ON k.conv_id = c.conv_id AND k.parent = c.node_id
WHERE c.node_type = 'assistant'""",
    TREE_CTES + [_CANON_CTE, _BWD_COUNTS_CTE],
)

ORACLES["tree_verify_pvs"] = with_transcripts(
    """SELECT d.conv_id, d.n_nodes, d.n_dup_nodes, d.dup_mismatch,
       (coalesce(e.edges_ok, TRUE) AND coalesce(p.pvs_ok, TRUE)) AS verified
FROM dupstats d
LEFT JOIN edges e ON d.conv_id = e.conv_id
LEFT JOIN pvsok p ON d.conv_id = p.conv_id""",
    TREE_CTES
    + [
        _CANON_CTE,
        _dupstats_cte(deep=False),
        _FWD_CTE,
        _BWD_CTE,
        _BAL_CTE,
        _PVSP_CTE,
        _BWD_COUNTS_CTE,
        """edges AS (
  SELECT bal.conv_id,
         bool_and(
           (CASE WHEN pv.parent IS NOT NULL THEN bal.bwd_ok
                 ELSE bal.fwd_ok AND bal.bwd_ok END)
           AND r.node_id IS NOT NULL) AS edges_ok
  FROM bal
  LEFT JOIN canon r ON bal.conv_id = r.conv_id AND bal.parent = r.node_id
  LEFT JOIN pvsp pv ON bal.conv_id = pv.conv_id AND bal.parent = pv.parent
  GROUP BY bal.conv_id
)""",
        """pvsok AS (
  SELECT pvsp.conv_id, bool_and(coalesce(k.n, 0) = 2) AS pvs_ok
  FROM pvsp
  LEFT JOIN bwdcounts k ON k.conv_id = pvsp.conv_id AND k.parent = pvsp.parent
  GROUP BY pvsp.conv_id
)""",
    ],
)

ORACLES["tree_pvs_rejects"] = with_transcripts(
    """SELECT conv_id, node_id,
       'parent_verify_set_nonempty_children' AS reject_reason
FROM canon
WHERE node_type = 'assistant' AND (child1 <> '' OR child2 <> '')""",
    TREE_CTES + [_CANON_CTE],
)

# Post-order DFS via path keys: root key = lpad(arrival), each child
# appends its child_ids index digit; ORDER BY path || '~' puts children
# (digit < '~') before their parent and chains in root-arrival order.
# Missing children stay in the walk as dummies (present = FALSE): they
# emit nothing but break the prev link of the next emitted node, and
# each chain's first emission has no prev (sequencer.go:519-529,
# 752-773). Duplicates re-attach after their canonical with the same
# prev; conversations with conflicting duplicates emit everything in
# arrival order with no prev (sequencer.go:788-799,874-880).
def _tree_sequence_oracle(prev_out: str) -> str:
    """Build the post-order-DFS oracle with a configurable prev-value
    projection (``prev`` = the emitted predecessor's node_id; the idmap
    variant maps it through the payload field)."""
    return with_transcripts(
        f"""SELECT conv_id,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY sort_key) - 1 AS INT)
         AS emit_pos,
       node_id, {prev_out} AS prev, is_duplicate, sequenceable
FROM final""",
        TREE_CTES
        + [
        _CANON_CTE,
        """kids AS (
  SELECT conv_id, node_id AS parent, child1 AS child, 0 AS idx FROM canon WHERE child1 <> ''
  UNION ALL
  SELECT conv_id, node_id, child2, 1 FROM canon WHERE child2 <> ''
)""",
        """unseq AS (
  SELECT conv_id, bool_or(ndist > 1) AS bad
  FROM (
    SELECT conv_id, node_id,
           count(DISTINCT parent_id || '|' || child1 || '|' || child2 || '|'
                 || node_type || '|' || CAST(ts_long AS STRING)) AS ndist
    FROM tree_nodes GROUP BY conv_id, node_id
  ) GROUP BY conv_id
)""",
        """roots AS (
  SELECT c.conv_id, c.node_id, c.arrival_pos FROM canon c
  LEFT JOIN (SELECT DISTINCT conv_id, child FROM kids) k
    ON c.conv_id = k.conv_id AND c.node_id = k.child
  WHERE k.child IS NULL
)""",
        """walk AS (
  SELECT r.conv_id, r.node_id AS node_ref,
         lpad(CAST(r.arrival_pos AS STRING), 8, '0') AS path, TRUE AS present
  FROM roots r
  UNION ALL
  SELECT w.conv_id, k.child, w.path || CAST(k.idx AS STRING),
         c.node_id IS NOT NULL
  FROM walk w
  JOIN kids k ON k.conv_id = w.conv_id AND k.parent = w.node_ref
  LEFT JOIN canon c ON c.conv_id = w.conv_id AND c.node_id = k.child
  WHERE w.present
)""",
        """ordered AS (
  SELECT conv_id, node_ref, present,
         row_number() OVER w AS pos,
         lag(node_ref) OVER w AS prev_ref,
         lag(present) OVER w AS prev_present,
         row_number() OVER (PARTITION BY conv_id, substr(path, 1, 8)
                            ORDER BY path || '~') AS chain_pos
  FROM walk
  WINDOW w AS (PARTITION BY conv_id ORDER BY path || '~')
)""",
        """dup_rows AS (
  SELECT conv_id, node_id, arrival_pos,
         row_number() OVER (PARTITION BY conv_id, node_id ORDER BY arrival_pos) AS rnk
  FROM tree_nodes
)""",
        """seq_all AS (
  SELECT d.conv_id, d.node_id,
         CASE WHEN o.chain_pos = 1 OR NOT o.prev_present THEN NULL
              ELSE o.prev_ref END AS prev,
         d.rnk > 1 AS is_duplicate,
         o.pos * 100 + d.rnk AS sort_key, TRUE AS sequenceable
  FROM ordered o
  JOIN unseq u ON o.conv_id = u.conv_id
  JOIN dup_rows d ON d.conv_id = o.conv_id AND d.node_id = o.node_ref
  WHERE o.present AND NOT u.bad
)""",
        """unseq_all AS (
  SELECT d.conv_id, d.node_id, CAST(NULL AS STRING) AS prev,
         d.rnk > 1 AS is_duplicate,
         c.arrival_pos * 100 + d.rnk AS sort_key, FALSE AS sequenceable
  FROM dup_rows d
  JOIN canon c ON c.conv_id = d.conv_id AND c.node_id = d.node_id
  JOIN unseq u ON u.conv_id = d.conv_id
  WHERE u.bad
)""",
            """final AS (SELECT * FROM seq_all UNION ALL SELECT * FROM unseq_all)""",
        ],
        recursive=True,
    )


ORACLES["tree_sequence"] = _tree_sequence_oracle("prev")
# idmap: every emitted predecessor's mapped payload value is
# 'ev-' || its node_id by construction of the driver-query fixture
ORACLES["tree_sequence_idmap"] = _tree_sequence_oracle(
    "CASE WHEN prev IS NOT NULL THEN 'ev-' || prev END"
)

# ---- backwards-link oracles (Q4/Q5). No emit_pos (see the queries'
# docstrings); chains re-derived from the REBUILT child lists. Fixture
# scope: no cycles, and ts is unique per (conv, parent) group so the
# reference's (unstable) exchange sort reduces to ORDER BY ts.
_UNSEQ_CTE = """unseq AS (
  SELECT conv_id, bool_or(ndist > 1) AS bad
  FROM (
    SELECT conv_id, node_id,
           count(DISTINCT parent_id || '|' || child1 || '|' || child2 || '|'
                 || node_type || '|' || CAST(ts_long AS STRING)) AS ndist
    FROM tree_nodes GROUP BY conv_id, node_id
  ) GROUP BY conv_id
)"""

_DUP_ROWS_CTE = """dup_rows AS (
  SELECT conv_id, node_id, arrival_pos,
         row_number() OVER (PARTITION BY conv_id, node_id ORDER BY arrival_pos) AS rnk
  FROM tree_nodes
)"""


def _bw_oracle(kids_cte: str, roots_cte: str) -> str:
    """Shared walk/emission skeleton over a rebuilt ``kids``/``roots``
    pair: recursive DFS path keys (child digit sorts below the '~'
    terminator → post-order), prev = lag within the conv's path order,
    nulled at each chain start; duplicates re-attach with their
    canonical's prev; conflicted conversations emit everything
    prev-null."""
    return with_transcripts(
        """SELECT conv_id, node_id, prev, is_duplicate, sequenceable FROM seq_all
UNION ALL
SELECT conv_id, node_id, prev, is_duplicate, sequenceable FROM unseq_all""",
        TREE_CTES
        + [
            _CANON_CTE,
            _UNSEQ_CTE,
            _DUP_ROWS_CTE,
            kids_cte,
            roots_cte,
            """walk AS (
  SELECT r.conv_id, r.node_id AS node_ref,
         lpad(CAST(r.arrival_pos AS STRING), 8, '0') AS path, TRUE AS present
  FROM roots r
  UNION ALL
  SELECT w.conv_id, k.child, w.path || CAST(k.idx AS STRING),
         c.node_id IS NOT NULL
  FROM walk w
  JOIN kids k ON k.conv_id = w.conv_id AND k.parent = w.node_ref
  LEFT JOIN canon c ON c.conv_id = w.conv_id AND c.node_id = k.child
  WHERE w.present
)""",
            """ordered AS (
  SELECT conv_id, node_ref, present,
         lag(node_ref) OVER w AS prev_ref,
         lag(present) OVER w AS prev_present,
         row_number() OVER (PARTITION BY conv_id, substr(path, 1, 8)
                            ORDER BY path || '~') AS chain_pos
  FROM walk
  WINDOW w AS (PARTITION BY conv_id ORDER BY path || '~')
)""",
            """seq_all AS (
  SELECT d.conv_id, d.node_id,
         CASE WHEN o.chain_pos = 1 OR NOT o.prev_present THEN NULL
              ELSE o.prev_ref END AS prev,
         d.rnk > 1 AS is_duplicate, TRUE AS sequenceable
  FROM ordered o
  JOIN unseq u ON o.conv_id = u.conv_id
  JOIN dup_rows d ON d.conv_id = o.conv_id AND d.node_id = o.node_ref
  WHERE o.present AND NOT u.bad
)""",
            """unseq_all AS (
  SELECT d.conv_id, d.node_id, CAST(NULL AS STRING) AS prev,
         d.rnk > 1 AS is_duplicate, FALSE AS sequenceable
  FROM dup_rows d JOIN unseq u ON u.conv_id = d.conv_id
  WHERE u.bad
)""",
        ],
        recursive=True,
    )


# Q4 ALL mode — faithful to sequencer.go:621-640: the rebuild iterates
# backwardsLinks, so ONLY parents cited by ≥1 backward child get their
# child list replaced (ts-sorted); a present parent nobody cites KEEPS
# its ORIGINAL childIds (which may reference missing nodes → dummies,
# and may re-visit a node also reachable via a backward link — the walk
# then emits it twice, exactly like the reference's DFS). Roots =
# (never forward-referenced originally AND not a backward child of a
# present parent) ∪ (backward children of absent parents, re-rooted
# unconditionally).
ORACLES["tree_sequence_bwall"] = _bw_oracle(
    """kids AS (
  SELECT c.conv_id, c.parent_id AS parent, c.node_id AS child,
         row_number() OVER (PARTITION BY c.conv_id, c.parent_id
                            ORDER BY c.ts_long) - 1 AS idx
  FROM canon c
  JOIN canon p ON p.conv_id = c.conv_id AND p.node_id = c.parent_id
  WHERE c.parent_id <> ''
  UNION ALL
  SELECT n.conv_id, n.node_id, n.child1, 0
  FROM canon n
  LEFT JOIN (SELECT DISTINCT conv_id, parent_id AS parent FROM canon
             WHERE parent_id <> '') b
    ON b.conv_id = n.conv_id AND b.parent = n.node_id
  WHERE b.parent IS NULL AND n.child1 <> ''
  UNION ALL
  SELECT n.conv_id, n.node_id, n.child2, 1
  FROM canon n
  LEFT JOIN (SELECT DISTINCT conv_id, parent_id AS parent FROM canon
             WHERE parent_id <> '') b
    ON b.conv_id = n.conv_id AND b.parent = n.node_id
  WHERE b.parent IS NULL AND n.child2 <> ''
)""",
    """roots AS (
  -- DISTINCT-over-UNION-ALL rather than UNION: inside WITH RECURSIVE,
  -- DuckDB treats a top-level UNION in any CTE as a recursive union
  -- and does NOT de-duplicate across the arms
  SELECT DISTINCT conv_id, node_id, arrival_pos FROM (
    SELECT c.conv_id, c.node_id, c.arrival_pos FROM canon c
    LEFT JOIN (
      SELECT DISTINCT conv_id, child FROM (
        SELECT conv_id, child1 AS child FROM canon WHERE child1 <> ''
        UNION ALL SELECT conv_id, child2 FROM canon WHERE child2 <> ''
      )
    ) f ON f.conv_id = c.conv_id AND f.child = c.node_id
    LEFT JOIN canon p ON p.conv_id = c.conv_id AND p.node_id = c.parent_id
                      AND c.parent_id <> ''
    WHERE f.child IS NULL AND p.node_id IS NULL
    UNION ALL
    SELECT c.conv_id, c.node_id, c.arrival_pos FROM canon c
    LEFT JOIN canon p ON p.conv_id = c.conv_id AND p.node_id = c.parent_id
    WHERE c.parent_id <> '' AND p.node_id IS NULL
  )
)""",
)

# Q5 nodeTypes mode: only 'assistant' parents rebuild from backward
# links; everyone else keeps original child_ids. Roots = nodes neither
# forward-referenced by any ORIGINAL child list nor backward-linked to
# a present assistant parent.
ORACLES["tree_sequence_bwtypes"] = _bw_oracle(
    """kids AS (
  SELECT p.conv_id, p.node_id AS parent, c.node_id AS child,
         row_number() OVER (PARTITION BY p.conv_id, p.node_id
                            ORDER BY c.ts_long) - 1 AS idx
  FROM canon p JOIN canon c ON c.conv_id = p.conv_id AND c.parent_id = p.node_id
  WHERE p.node_type = 'assistant'
  UNION ALL
  SELECT conv_id, node_id, child1, 0 FROM canon
  WHERE node_type <> 'assistant' AND child1 <> ''
  UNION ALL
  SELECT conv_id, node_id, child2, 1 FROM canon
  WHERE node_type <> 'assistant' AND child2 <> ''
)""",
    """roots AS (
  SELECT c.conv_id, c.node_id, c.arrival_pos FROM canon c
  LEFT JOIN (
    SELECT DISTINCT conv_id, child FROM (
      SELECT conv_id, child1 AS child FROM canon WHERE child1 <> ''
      UNION ALL SELECT conv_id, child2 FROM canon WHERE child2 <> ''
    )
  ) f ON f.conv_id = c.conv_id AND f.child = c.node_id
  LEFT JOIN canon ap ON ap.conv_id = c.conv_id AND ap.node_id = c.parent_id
                     AND ap.node_type = 'assistant' AND c.parent_id <> ''
  WHERE f.child IS NULL AND ap.node_id IS NULL
)""",
)
