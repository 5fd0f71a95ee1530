"""claude_code_memory_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Durafen/Claude-code-memory.

The reference (read-only at /root/reference) is a semantic code-memory
system: scan → parse → chunk → embed (dense + BM25 sparse) → vector store →
semantic/keyword/hybrid top-k search, maintained incrementally and via a
filesystem-watcher streaming path.

This package re-expresses every one of those operators Spark-first:

- ``functions/``   pure Column-expression helpers (hashing, vector math, text)
- ``operators/``   relational + vector operators (top-k, RRF, dedup, ANN, …)
- ``sources/``     scans and parsers (project files, python AST, chat JSONL)
- ``embeddings/``  embedder UDFs (deterministic hash embedder, BM25 fit/transform)
- ``plans/``       multi-statement choreography (incremental merge pipeline)
- ``streaming/``   Structured Streaming paths (debounce, incremental foreachBatch)
- ``queries/``     the driver-facing query catalog with DuckDB oracle SQL

Design rules (see SURVEY.md §7): DataFrame/SQL only — no RDDs; Catalyst
does pushdown/pruning/join-selection; Python appears solely in
Arrow-batched ``mapInPandas`` stages (parsing, embedding); everything else
is whole-stage-codegen'd column expressions.
"""

__version__ = "0.1.0"
