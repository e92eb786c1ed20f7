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
    per_conv, _ = verify_op.verify_trees(
        tree_nodes_df(spark, sf_dir), arrival_col="arrival_pos"
    )
    return per_conv


def q_tree_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tree_op.sequence_tree(tree_nodes_df(spark, sf_dir))
    return out.select(
        "conv_id", "emit_pos", "node_id", "prev", "is_duplicate", "sequenceable"
    )


QUERIES = {
    "tree_verify": q_tree_verify,
    "tree_sequence": q_tree_sequence,
}


# ------------------------------------------------------------- oracles
_CANON_CTE = """canon AS (
  SELECT * FROM tree_nodes
  QUALIFY row_number() OVER (PARTITION BY conv_id, node_id ORDER BY arrival_pos) = 1
)"""

ORACLES: dict[str, str] = {}

ORACLES["tree_verify"] = with_transcripts(
    """SELECT d.conv_id, d.n_nodes, d.n_dup_nodes,
       d.dup_mismatch, coalesce(e.edges_ok, TRUE) AS verified
FROM dupstats d LEFT JOIN edges e ON d.conv_id = e.conv_id""",
    TREE_CTES
    + [
        _CANON_CTE,
        """dupstats AS (
  SELECT conv_id, count(*) AS n_nodes,
         -- CAST: untyped DuckDB sum() yields HUGEINT; Spark emits BIGINT
         CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_nodes,
         bool_or(ndist > 1) AS dup_mismatch
  FROM (
    SELECT conv_id, node_id, count(*) AS cnt,
           count(DISTINCT parent_id || '|' || child1 || '|' || child2) AS ndist
    FROM tree_nodes GROUP BY conv_id, node_id
  ) GROUP BY conv_id
)""",
        """fwd AS (
  SELECT conv_id, node_id AS parent, child1 AS child FROM canon WHERE child1 <> ''
  UNION ALL
  SELECT conv_id, node_id, child2 FROM canon WHERE child2 <> ''
)""",
        """bwd AS (
  SELECT conv_id, parent_id AS parent, node_id AS child FROM canon WHERE parent_id <> ''
)""",
        """bal AS (
  SELECT coalesce(f.conv_id, b.conv_id) AS conv_id,
         coalesce(f.parent, b.parent) AS parent,
         coalesce(f.child, b.child) AS child,
         f.parent IS NOT NULL AS fwd_ok, b.parent IS NOT NULL AS bwd_ok
  FROM fwd f FULL OUTER JOIN bwd b
    ON f.conv_id = b.conv_id AND f.parent = b.parent AND f.child = b.child
)""",
        """edges AS (
  SELECT bal.conv_id,
         bool_and(bal.fwd_ok AND bal.bwd_ok AND r.node_id IS NOT NULL) AS edges_ok
  FROM bal LEFT JOIN canon r
    ON bal.conv_id = r.conv_id AND bal.parent = r.node_id
  GROUP BY bal.conv_id
)""",
    ],
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
ORACLES["tree_sequence"] = with_transcripts(
    """SELECT conv_id,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY sort_key) - 1 AS INT)
         AS emit_pos,
       node_id, prev, is_duplicate, sequenceable
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
