"""Training-shard export (plans/shards.py): deterministic assignment,
balanced sizes, stable mapping under appends, readable manifest."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.plans.shards import assign_shards, export_shards


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_assignment_deterministic_and_partition_invariant(docs):
    a1 = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 8).collect()}
    a2 = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs.repartition(13), 8).collect()
    }
    assert a1 == a2
    assert set(a1.values()) <= set(range(8))


def test_append_does_not_move_existing_docs(spark, docs):
    before = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 8).collect()}
    extra = spark.createDataFrame(
        [(99990 + i, f"new doc {i}", "en", "web", 10) for i in range(5)],
        docs.schema,
    )
    after = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs.unionByName(extra), 8).collect()
    }
    for doc_id, shard in before.items():
        assert after[doc_id] == shard


def test_export_writes_shards_and_manifest(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = export_shards(docs, path, 8)
    total = docs.count()
    assert sum(m["n_rows"] for m in manifest) == total
    # hash bucketing balances within a loose factor at 500+ rows
    sizes = [m["n_rows"] for m in manifest if m["n_rows"]]
    assert max(sizes) <= 3 * min(sizes)
    # every shard readable independently; manifest agrees with the files
    on_disk = json.load(open(f"{path}/manifest.json"))
    assert on_disk["n_shards"] == 8
    for m in on_disk["shards"][:2]:
        got = spark.read.parquet(f"{path}/shard={m['shard']}").count()
        assert got == m["n_rows"]
    # token totals match the recorded approximation
    expect = docs.agg(
        F.sum((F.length("text") / 4).cast("long")).cast("long")
    ).first()[0]
    assert sum(m["n_tokens"] for m in manifest) == expect
