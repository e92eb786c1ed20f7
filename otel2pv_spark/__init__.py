"""otel2pv_spark — a PySpark-native re-engine of xtuml/otel2pv.

A brand-new parse → enrich → verify → sequence → route → aggregate
pipeline over transcript tables (conv_id, turn_idx, role, text, tool, ts),
re-expressing the reference's JQExtractor / GroupAndVerify / Sequencer
semantics (see SURVEY.md for file:line citations into /root/reference)
as idiomatic Spark DataFrame plans, plus the training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
a 100 TB corpus job needs.

Design rules (enforced throughout):
- DataFrame/SQL only; no RDDs; no per-row Python UDFs.
- Pandas/Arrow UDFs only where built-ins can't express the semantics
  (the grok parse fallback and the general-tree DFS sequencer kernel).
- Every shuffle is on purpose: conv_id is the one partitioning key of
  the pipeline; dims are broadcast; skew is handled by salting/AQE.
"""

__version__ = "0.1.0"
