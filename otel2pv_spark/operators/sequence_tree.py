"""General-tree sequencer — the applyInPandas DFS kernel (Q1-Q14).

For conversations whose turns form real trees (tool-call subtrees), the
window fast path in ``sequence.py`` can't express post-order DFS
emission, so this kernel reproduces the reference Sequencer's semantics
bit-for-bit, one pandas call per conversation group (no per-row Python
at the Spark level; Arrow moves each group once).

Reference semantics implemented (file:line into /root/reference/
Sequencer/sequencer/sequencer.go):

- node map build, duplicate collection + deep equality → unsequenceable
  on conflict (:558-587, equality :373-398); duplicates do NOT
  contribute links (:573-583 ``continue``).
- self-reference guards (:588-592, :610-614).
- roots = nodes never referenced in any canonical child_ids (:606-620);
  zero roots ⇒ unsequenceable (:663-666).
- childrenByBackwardsLink all/nodeTypes rebuild (:622-662): All mode
  overwrites child_ids per parent from backward links in arrival order
  (children of absent parents become roots); nodeTypes mode overwrites
  only listed types (empty list when no backward children).
- orderChildrenByTimestamp (:965-991): the reference's EXCHANGE sort
  (swap i,j when ts[i]>ts[j]) — deliberately replicated because it is
  NOT stable for equal keys, and bit-parity beats prettiness; missing
  child or timestamp==0 ⇒ InvalidError ⇒ whole conversation rejected.
- iterative stack DFS with dummy nodes for missing children; a dummy
  emits nothing and resets prev to nil (:491-538, reset :761-763).
- prev id = previous emitted node's app_json[seq_id_map_field] if
  configured (missing/empty ⇒ error ⇒ reject) else its node_id
  (:685-731).
- duplicates emitted immediately after their original with the same
  prev (:874-880).
- groupApplies: first emitted node matching any (identifying_field,
  value) config whose share field is a non-empty string donates that
  value to EVERY output row (:124-170, capture :863-871, apply
  :883-887) — including in unsequenceable mode.
- unsequenceable fallback: all nodes emitted with NO prev (:788-799).

Determinism refinements over the reference (which iterates Go maps):
roots and unsequenceable emission follow ARRIVAL order (arrival_pos),
giving a total deterministic order — the stricter contract SURVEY §2.8
commits to.

Scale note: one conversation = one pandas group; group size is bounded
by conversation length, not dataset size. Pathological conversations
(≫10^6 turns) should be pre-filtered to the window path or capped —
see plans/pipeline salting notes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame

NODE_SCHEMA = (
    "conv_id string, node_id string, parent_id string, child_ids array<string>, "
    "node_type string, timestamp long, app_json map<string,string>, arrival_pos long"
)

OUT_SCHEMA = (
    "conv_id string, emit_pos int, node_id string, prev string, "
    "is_duplicate boolean, sequenceable boolean, reject_reason string, "
    "app_json map<string,string>"
)


@dataclass
class TreeSequencerConfig:
    seq_id_map_field: str | None = None          # outputAppFieldSequenceIdMap
    backwards_link_all: bool = False             # ChildrenByBackwardsLink.All
    backwards_link_node_types: frozenset[str] = frozenset()
    # share_field -> [(identifying_field, identifying_value), ...]
    group_applies: dict[str, list[tuple[str, str]]] = field(default_factory=dict)


class _Invalid(Exception):
    pass


def _exchange_sort_children(child_ids: list[str], nodes: dict) -> list[str]:
    """orderChildrenByTimestamp (:965-991), exact algorithm."""
    if not child_ids:
        return child_ids
    ts = {}
    for cid in child_ids:
        n = nodes.get(cid)
        if n is None:
            raise _Invalid(f"order_children_missing_child:{cid}")
        if n["timestamp"] == 0:
            raise _Invalid(f"order_children_zero_timestamp:{cid}")
        ts[cid] = n["timestamp"]
    out = list(child_ids)
    for i in range(len(out)):
        for j in range(i + 1, len(out)):
            if ts[out[i]] > ts[out[j]]:
                out[i], out[j] = out[j], out[i]
    return out


def _build(rows: list[dict], cfg: TreeSequencerConfig):
    """convertToIncomingDataMapAndRootNodes (:558-668)."""
    nodes: dict[str, dict] = {}           # canonical, insertion-ordered
    dups: dict[str, list[dict]] = {}
    forward_ref: set[str] = set()
    roots: dict[str, None] = {}           # ordered set
    backwards: dict[str, list[str]] = {}
    unseq = False

    def eq(a: dict, b: dict) -> bool:
        return (
            a["parent_id"] == b["parent_id"]
            and list(a["child_ids"]) == list(b["child_ids"])
            and a["node_type"] == b["node_type"]
            and a["timestamp"] == b["timestamp"]
            and a["app_json"] == b["app_json"]
        )

    for r in rows:
        nid = r["node_id"]
        if nid in nodes:
            if not eq(nodes[nid], r):
                unseq = True
            dups.setdefault(nid, []).append(r)
            continue
        if r["parent_id"]:
            if nid == r["parent_id"]:
                unseq = True
            backwards.setdefault(r["parent_id"], []).append(nid)
        nodes[nid] = r
        if nid not in forward_ref:
            roots[nid] = None
        for cid in r["child_ids"]:
            if cid == nid:
                unseq = True
            forward_ref.add(cid)
            roots.pop(cid, None)

    if cfg.backwards_link_all:
        for pid, kids in backwards.items():
            parent = nodes.get(pid)
            if parent is None:
                for cid in kids:
                    if cid in nodes:
                        roots[cid] = None
                continue
            parent["child_ids"] = _exchange_sort_children(kids, nodes)
            for cid in kids:
                if cid in nodes:
                    roots.pop(cid, None)
    elif cfg.backwards_link_node_types:
        for nid, n in nodes.items():
            if n["node_type"] in cfg.backwards_link_node_types:
                kids = backwards.get(nid, [])
                n["child_ids"] = _exchange_sort_children(kids, nodes)
                for cid in kids:
                    if cid in nodes:
                        roots.pop(cid, None)

    if not roots:
        unseq = True
    return nodes, dups, list(roots), unseq


def _dfs(root: str, nodes: dict):
    """sequenceWithStack (:491-538): yields (node_id | None-for-dummy).

    Cycle-guard budget counts loop iterations, which scale with total
    child-id REFERENCES (each dangling/dummy child costs one), not just
    node count — sizing it on len(nodes) alone falsely rejected
    legitimate partial trees with many missing children as cycles."""
    refs = sum(len(n["child_ids"]) for n in nodes.values())
    budget = 2 * (len(nodes) + refs + 2)  # cycle guard (reference would hang)
    stack: list[list] = [[root, 0]]
    while stack:
        if budget <= 0:
            raise _Invalid("cycle_detected")
        budget -= 1
        top = stack[-1]
        kids = nodes[top[0]]["child_ids"] if top[0] in nodes else []
        if top[1] < len(kids):
            cid = kids[top[1]]
            top[1] += 1
            if cid in nodes:
                stack.append([cid, 0])
            else:
                yield None  # dummy: emits nothing, resets prev
            continue
        stack.pop()
        yield top[0]


def _prev_value(node: dict, cfg: TreeSequencerConfig) -> str:
    if cfg.seq_id_map_field:
        v = (node["app_json"] or {}).get(cfg.seq_id_map_field)
        if not isinstance(v, str) or v == "":
            raise _Invalid("seq_id_map_field_missing")
        return v
    return node["node_id"]


OUT_COLUMNS = [
    "conv_id", "emit_pos", "node_id", "prev",
    "is_duplicate", "sequenceable", "reject_reason", "app_json",
]


def _rows_of(pdf: pd.DataFrame) -> list[dict]:
    """Node dicts in the frame's CURRENT row order (callers pre-sort by
    arrival)."""
    return [
        {
            "node_id": nid or "",
            "parent_id": pid or "",
            "child_ids": list(kids) if kids is not None else [],
            "node_type": ntype or "",
            "timestamp": int(ts) if pd.notna(ts) else 0,
            "app_json": dict(app) if app is not None else {},
        }
        for nid, pid, kids, ntype, ts, app in zip(
            pdf["node_id"], pdf["parent_id"], pdf["child_ids"],
            pdf["node_type"], pdf["timestamp"], pdf["app_json"],
        )
    ]


def _sequence_conv(
    conv: str, rows: list[dict], cfg: TreeSequencerConfig
) -> list[tuple]:
    """Sequence ONE conversation; returns OUT_COLUMNS-ordered tuples
    (plain Python — the caller batches many conversations into one
    pandas DataFrame, so no per-conversation DataFrame cost)."""

    def reject(reason: str) -> list[tuple]:
        return [
            (conv, i, r["node_id"], None, False, False, reason, r["app_json"])
            for i, r in enumerate(rows)
        ]

    try:
        nodes, dups, roots, unseq = _build(rows, cfg)
    except _Invalid as e:
        return reject(str(e))

    out = []
    captured: dict[str, str] = {}

    def capture(app: dict):
        for share, configs in cfg.group_applies.items():
            if share in captured:
                continue
            for ident, val in configs:
                if app.get(ident) == val and isinstance(app.get(share), str) and app.get(share):
                    captured[share] = app[share]
                    break

    def emit(nid: str, prev: str | None):
        n = nodes[nid]
        capture(n["app_json"])
        out.append((nid, prev, False, n["app_json"]))
        for d in dups.get(nid, []):
            out.append((nid, prev, True, d["app_json"]))

    try:
        if unseq:
            for nid in nodes:
                emit(nid, None)
        else:
            for root in roots:
                prev: str | None = None
                for nid in _dfs(root, nodes):
                    if nid is None:
                        prev = None
                        continue
                    emit(nid, prev)
                    prev = _prev_value(nodes[nid], cfg)
    except _Invalid as e:
        return reject(str(e))

    return [
        (
            conv, i, nid, prev, dup, not unseq, None,
            {**app, **captured} if captured else app,
        )
        for i, (nid, prev, dup, app) in enumerate(out)
    ]


def _sequence_group(pdf: pd.DataFrame, cfg: TreeSequencerConfig) -> pd.DataFrame:
    conv = pdf["conv_id"].iloc[0]
    pdf = pdf.sort_values("arrival_pos", kind="stable")
    return pd.DataFrame(_sequence_conv(conv, _rows_of(pdf), cfg), columns=OUT_COLUMNS)


def _sequence_bucket(pdf: pd.DataFrame, cfg: TreeSequencerConfig) -> pd.DataFrame:
    """Kernel over a BUCKET of conversations: one pandas call handles
    every conversation hashing into the bucket, amortizing the
    per-group Python/Arrow invocation cost across thousands of
    conversations. ONE sort + ONE output DataFrame per bucket (the
    per-conversation work is plain-tuple Python); semantics identical
    to per-conv grouping."""
    pdf = pdf.sort_values(["conv_id", "arrival_pos"], kind="stable")
    recs: list[tuple] = []
    for conv, sub in pdf.groupby("conv_id", sort=False):
        recs.extend(_sequence_conv(conv, _rows_of(sub), cfg))
    return pd.DataFrame(recs, columns=OUT_COLUMNS)


def sequence_tree(
    df: DataFrame,
    cfg: TreeSequencerConfig | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Group by conv_id → DFS-sequence each conversation tree.

    Input columns per NODE_SCHEMA (arrival_pos supplies the reference's
    message-arrival order). One shuffle on conv_id; each group crosses
    the Arrow boundary exactly once.

    ``buckets``: when set, conversations are hashed into ``buckets``
    groups and each Arrow batch carries a whole bucket (the kernel
    loops conversations inside pandas) — at billions of small
    conversations, per-group invocation overhead dominates otherwise.
    The shuffle key stays conv_id-derived so a conversation never
    splits. Leave None for exact per-conv grouping (golden tests)."""
    from pyspark.sql import functions as F

    cfg = cfg or TreeSequencerConfig()
    if buckets:
        bucketed = df.withColumn(
            "_bkt", F.pmod(F.xxhash64("conv_id"), F.lit(buckets))
        )
        return bucketed.groupBy("_bkt").applyInPandas(
            lambda pdf: _sequence_bucket(pdf.drop(columns=["_bkt"]), cfg),
            schema=OUT_SCHEMA,
        )
    return df.groupBy("conv_id").applyInPandas(
        lambda pdf: _sequence_group(pdf, cfg), schema=OUT_SCHEMA
    )
