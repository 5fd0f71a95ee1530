"""TableStore.append: appends must be O(new rows) — a new manifest
snapshot, prior snapshot dirs byte-for-byte untouched (the Delta-append
emulation; round 1 appended by rewriting the whole table)."""

import glob
import os

from claude_code_memory_spark.plans.incremental import TableStore


def _files_with_mtime(root):
    out = {}
    for p in glob.glob(os.path.join(root, "**"), recursive=True):
        if os.path.isfile(p):
            out[p] = os.path.getmtime(p)
    return out


def test_append_leaves_prior_snapshots_untouched(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s"))
    df1 = spark.range(5).selectExpr("id", "id * 2 AS v")
    store.write("t", df1)
    before = _files_with_mtime(str(tmp_path / "s" / "t"))
    assert before

    df2 = spark.range(5, 8).selectExpr("id", "id * 2 AS v")
    store.append("t", df2)

    after = _files_with_mtime(str(tmp_path / "s" / "t"))
    for p, mt in before.items():
        if p.endswith("_current") or p.endswith(".tmp"):
            continue
        assert p in after and after[p] == mt, f"prior snapshot file rewritten: {p}"

    got = sorted(r.id for r in store.read("t").collect())
    assert got == list(range(8))
    assert len(store._manifest("t")["snapshots"]) == 2


def test_append_partitioned_and_vacuum_keeps_manifest(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s"))
    df1 = spark.range(4).selectExpr("id", "CAST(id % 2 AS STRING) AS part")
    store.write("t", df1, ["part"])
    store.append("t", spark.range(4, 6).selectExpr("id", "'0' AS part"), ["part"])
    store.vacuum()  # must keep BOTH manifest snapshots
    assert store.read("t").count() == 6
    # partition pruning still works per snapshot dir
    assert store.read("t").filter("part = '0'").count() == 4


def test_append_auto_compacts(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(TableStore, "MAX_SNAPSHOTS", 4)
    store = TableStore(spark, str(tmp_path / "s"))
    store.write("t", spark.range(2).selectExpr("id"))
    for i in range(5):
        store.append("t", spark.range(10 + i, 11 + i).selectExpr("id"))
    # never exceeds the cap, data intact
    assert len(store._manifest("t")["snapshots"]) < 4
    assert store.read("t").count() == 7


def test_single_snapshot_pointer_backcompat(spark, tmp_path):
    import json

    store = TableStore(spark, str(tmp_path / "s"))
    store.write("t", spark.range(3).selectExpr("id"))
    # rewrite pointer in the round-1 single-snapshot format
    ptr = store._pointer("t")
    meta = json.load(open(ptr))
    legacy = {"snapshot": meta["snapshots"][0], "schema": meta["schema"]}
    json.dump(legacy, open(ptr, "w"))
    assert store.read("t").count() == 3
    store.append("t", spark.range(3, 5).selectExpr("id"))
    assert store.read("t").count() == 5
