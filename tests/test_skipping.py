"""File-level data skipping (plans/skipping.py): per-snapshot footer
stats manifests + predicate-driven file pruning on TableStore reads."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.plans.incremental import TableStore
from claude_code_memory_spark.plans.skipping import (
    STATS_FILE,
    load_file_stats,
    prune_files,
    pruned_read_stats,
)


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "store"))


def _clustered(spark, n=10_000, files=8):
    # range-clustered on k so part files carry disjoint k ranges — the
    # layout data skipping is designed for (io.write_clustered at scale)
    return (
        spark.range(0, n)
        .selectExpr("id AS k", "id % 100 AS v", "concat('u', id % 50) AS name")
        .repartitionByRange(files, "k")
    )


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_stats_manifest_written_and_loadable(spark, store):
    store.write("t", _clustered(spark))
    meta = store._manifest("t")
    snap_dir = os.path.join(store.root, "t", meta["snapshots"][0])
    assert os.path.exists(os.path.join(snap_dir, STATS_FILE))
    manifest = load_file_stats(snap_dir)
    assert len(manifest["files"]) == 8
    for entry in manifest["files"].values():
        assert entry["cols"]["k"]["min"] <= entry["cols"]["k"]["max"]
        assert "name" in entry["cols"]  # string stats too


def test_pruned_read_equals_filtered_read_and_skips_files(spark, store):
    store.write("t", _clustered(spark))
    preds = [("k", ">=", 2_000), ("k", "<", 3_000)]
    df, kept, total = pruned_read_stats(store, "t", preds)
    expected = store.read("t").filter((F.col("k") >= 2000) & (F.col("k") < 3000))
    assert _norm(df) == _norm(expected)
    assert total == 8
    # a 10% range over 8 range-clustered files touches 1-2 of them
    assert kept <= 2, (kept, total)
    # the scan's file list is the pruned list, not the full dir
    assert len(df.inputFiles()) == kept


def test_point_lookup_prunes_to_one_file(spark, store):
    store.write("t", _clustered(spark))
    df, kept, total = pruned_read_stats(store, "t", [("k", "=", 7_777)])
    assert kept == 1 and total == 8
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["v"] == 77


def test_string_predicates_prune(spark, store):
    df = (
        spark.range(0, 1_000)
        .selectExpr("concat('doc-', lpad(id, 6, '0')) AS doc", "id AS v")
        .repartitionByRange(4, "doc")
    )
    store.write("t", df)
    out, kept, total = pruned_read_stats(
        store, "t", [("doc", ">=", "doc-000990")]
    )
    assert total == 4 and kept == 1
    assert out.count() == 10


def test_append_keeps_per_snapshot_manifests(spark, store):
    store.write("t", _clustered(spark, n=4_000, files=4))
    store.append(
        "t",
        spark.range(4_000, 8_000)
        .selectExpr("id AS k", "id % 100 AS v", "concat('u', id % 50) AS name")
        .repartitionByRange(4, "k"),
    )
    df, kept, total = pruned_read_stats(store, "t", [("k", ">=", 6_000)])
    assert total == 8
    assert kept <= 2  # prunes the entire first snapshot + half the second
    assert df.count() == 2_000
    assert _norm(df) == _norm(store.read("t").filter("k >= 6000"))


def test_everything_pruned_yields_empty_with_schema(spark, store):
    store.write("t", _clustered(spark, n=100, files=2))
    df, kept, total = pruned_read_stats(store, "t", [("k", ">", 10_000)])
    assert kept == 0 and df.count() == 0
    assert set(df.columns) == {"k", "v", "name"}


def test_missing_manifest_falls_back_to_full_scan(spark, store):
    store.write("t", _clustered(spark, n=1_000, files=4))
    meta = store._manifest("t")
    snap_dir = os.path.join(store.root, "t", meta["snapshots"][0])
    os.remove(os.path.join(snap_dir, STATS_FILE))
    df, kept, total = pruned_read_stats(store, "t", [("k", "=", 5)])
    assert kept == total == 4  # honest: no stats, no skipping
    assert df.count() == 1


def test_unsupported_predicates_keep_files():
    manifest = {
        "files": {
            "a.parquet": {"rows": 10, "cols": {"k": {"min": 0, "max": 9, "nulls": 0}}},
            "b.parquet": {"rows": 10, "cols": {"k": {"min": 10, "max": 19, "nulls": 0}}},
        }
    }
    kept, total = prune_files(manifest, [("k", "=", 15)])
    assert kept == ["b.parquet"] and total == 2
    # unknown column / op: conservative keep-all
    assert prune_files(manifest, [("zz", "=", 1)])[0] == ["a.parquet", "b.parquet"]
    assert prune_files(manifest, [("k", "!=", 1)])[0] == ["a.parquet", "b.parquet"]
    # cross-type comparison: keep
    assert prune_files(manifest, [("k", "=", "x")])[0] == ["a.parquet", "b.parquet"]


def test_engine_store_writes_still_work(spark, store):
    """Partitioned writes (chunk_type dirs) get manifests with relative
    paths inside partition subdirs and prune on non-partition columns."""
    df = spark.range(0, 2_000).selectExpr(
        "id AS point_id",
        "CASE WHEN id % 2 = 0 THEN 'metadata' ELSE 'implementation' END AS chunk_type",
    ).repartitionByRange(4, "point_id")
    store.write("chunks", df, partition_by=["chunk_type"])
    out, kept, total = pruned_read_stats(
        store, "chunks", [("point_id", "<", 100)]
    )
    assert total >= 2 and kept < total
    assert out.count() == 100
    # partition column recovered from the dir names, not NULLed out
    types = {r["chunk_type"] for r in out.select("chunk_type").distinct().collect()}
    assert types == {"metadata", "implementation"}


@pytest.mark.slow
def test_engine_optimize_makes_get_implementation_file_skip(spark, tmp_path, temp_repo):
    """End-to-end serving path: after optimize() clusters chunks by
    entity_name, a get_implementation point lookup reads fewer files
    than the table has, and returns the same rows as before."""
    from claude_code_memory_spark.api import CodeMemoryEngine

    eng = CodeMemoryEngine(spark, str(tmp_path / "store"))
    eng.index(str(temp_repo))
    before = _norm(eng.get_implementation("helper").select("entity_name", "content"))
    assert before  # fixture defines helper()
    eng.optimize(target_files=4)
    after = _norm(eng.get_implementation("helper").select("entity_name", "content"))
    assert after == before
    df, kept, total = pruned_read_stats(
        eng.store, "chunks", [("entity_name", "=", "helper")]
    )
    assert total >= 4 and kept < total, (kept, total)


def test_in_predicate_prunes(spark, store):
    store.write("t", _clustered(spark))  # 8 files, k ranges of 1250
    df, kept, total = pruned_read_stats(
        store, "t", [("k", "in", [5, 9_999])]
    )
    assert total == 8 and kept == 2  # first and last file only
    assert {r["k"] for r in df.collect()} == {5, 9_999}


def test_optimize_zorder_prunes_both_dimensions(spark, store):
    """After optimize(zorder_by=(x, y)), file skipping works on an
    x-only predicate, a y-only predicate, AND the 2-D box — range
    clustering can only ever serve one of the three."""
    import random

    rng = random.Random(3)
    rows = [
        (rng.randrange(0, 1_000), rng.randrange(0, 1_000), i)
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "x long, y long, payload long")
    store.write("t", df.repartition(8))  # unclustered baseline
    store.optimize("t", zorder_by=("x", "y"), target_files=16)
    for preds in (
        [("x", "<", 150)],
        [("y", ">=", 870)],
        [("x", "<", 250), ("y", "<", 250)],
    ):
        out, kept, total = pruned_read_stats(store, "t", preds)
        assert total == 16, (preds, total)
        assert kept <= total // 2, (preds, kept, total)
        expected = store.read("t")
        from claude_code_memory_spark.plans.skipping import _predicate_column

        for p in preds:
            expected = expected.filter(_predicate_column(p))
        assert out.count() == expected.count()


def test_mixed_manifest_snapshots_no_basepath_leak(spark, store):
    """snapA has a manifest (file-list read sets basePath), snapB lost
    its manifest (full-dir fallback) — the basePath option must not
    leak from A's reader into B's."""
    store.write("t", _clustered(spark, n=1_000, files=4))
    store.append(
        "t",
        spark.range(1_000, 2_000)
        .selectExpr("id AS k", "id % 100 AS v", "concat('u', id % 50) AS name")
        .repartitionByRange(4, "k"),
    )
    meta = store._manifest("t")
    snap_b = os.path.join(store.root, "t", meta["snapshots"][1])
    os.remove(os.path.join(snap_b, STATS_FILE))
    df, kept, total = pruned_read_stats(store, "t", [("k", "<", 250)])
    assert total == 8 and kept == 4 + 1  # all of B (no stats) + 1 of A
    assert df.count() == 250


def test_distributed_footer_collection_over_16_files(spark, store):
    """>16 part files takes the mapInPandas path (footer reads on
    executors); manifest contents must match the driver path's shape."""
    store.write("t", _clustered(spark, n=5_000, files=24))
    meta = store._manifest("t")
    snap_dir = os.path.join(store.root, "t", meta["snapshots"][0])
    manifest = load_file_stats(snap_dir)
    assert len(manifest["files"]) == 24
    ks = [e["cols"]["k"] for e in manifest["files"].values()]
    assert all(e["min"] <= e["max"] for e in ks)
    # ranges tile the keyspace: global min/max recovered from the manifest
    assert min(e["min"] for e in ks) == 0
    assert max(e["max"] for e in ks) == 4_999
    df, kept, total = pruned_read_stats(store, "t", [("k", "=", 4_321)])
    assert total == 24 and kept == 1 and df.count() == 1


def test_optimize_then_vacuum_keeps_pruning(spark, store):
    """optimize → vacuum(1): old snapshots gone, the clustered snapshot's
    manifest still prunes, data intact."""
    store.write("t", _clustered(spark, n=2_000, files=4))
    store.append(
        "t",
        spark.range(2_000, 4_000)
        .selectExpr("id AS k", "id % 100 AS v", "concat('u', id % 50) AS name"),
    )
    store.optimize("t", cluster_by=["k"], target_files=8)
    store.vacuum()
    df, kept, total = pruned_read_stats(store, "t", [("k", "=", 3_500)])
    assert total == 8 and kept == 1
    assert df.count() == 1
    assert store.read("t").count() == 4_000


def test_pruned_read_missing_table_is_none(store):
    from claude_code_memory_spark.plans.skipping import pruned_read

    assert pruned_read(store, "nope", [("k", "=", 1)]) is None
