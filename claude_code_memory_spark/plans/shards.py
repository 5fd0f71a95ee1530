"""Training-shard export: deliver a curated corpus as size-balanced,
deterministically-assigned shard files plus a manifest.

The last step of every training-data pipeline: downstream loaders want
N files of roughly equal row/token weight, a stable doc → shard mapping
(re-exports after an append must not reshuffle old docs between shards),
and a manifest recording per-shard row/token totals for the data loader
to plan epochs. Assignment is a content-hash bucket — partitioning-
independent and reproducible, the same determinism contract as
`operators/sampling.deterministic_split`.

Scale notes: one hash-partitioned shuffle to co-locate each shard's
rows, writers stream each shard as one parquet dir; the manifest
aggregate is shard-count rows. No collect of corpus data — the manifest
is the only driver-side materialization.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shards(
    docs: DataFrame,
    n_shards: int,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a deterministic ``shard`` column: content-hash bucket of the
    id — stable under any partitioning, append, or re-run."""
    return docs.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit("shard-salt")), n_shards)
        .cast("int"),
    )


def export_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> list[dict]:
    """Write ``docs`` as ``n_shards`` parquet shard directories under
    ``path`` (``shard=K/``) plus a ``manifest.json`` with per-shard row
    and token totals. Returns the manifest entries.

    Layout is `partitionBy(shard)` — ONE shuffle keyed by the shard
    bucket, each shard readable independently (`path/shard=K`). Token
    totals use a caller-supplied count column when present, else the
    len//4 approximation every loader can reproduce."""
    sharded = assign_shards(docs, n_shards, id_col=id_col)
    tokens = (
        F.col(token_col)
        if token_col
        else (F.length("text") / 4).cast("long")
    )
    sharded.withColumn("__tokens", tokens).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)
    stats = (
        sharded.withColumn("__tokens", tokens)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("__tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = [
        {"shard": r["shard"], "n_rows": r["n_rows"], "n_tokens": r["n_tokens"]}
        for r in stats
    ]
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump({"n_shards": n_shards, "shards": manifest}, fh, indent=1)
    return manifest
