"""ANN-backed engine search (api._ann_index + search(ann=True)): the
materialized IVF serving layout, its invalidation, and the full-probe
exactness guarantee."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.api import CodeMemoryEngine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = CodeMemoryEngine(spark, str(tmp_path_factory.mktemp("ann_store")))
    # a corpus comfortably larger than the cell count
    for i in range(40):
        e.add_memory(
            f"memory_{i}",
            f"note number {i} about topic {'spark' if i % 2 else 'duckdb'} "
            f"and detail {i * 7}",
        )
    return e


def _ids(df):
    return [r["point_id"] for r in df.select("point_id").collect()]


def test_full_probe_equals_brute(eng):
    """nprobe == n_centroids scans every cell → exactly the brute-force
    result (same scores, same tie-breaks)."""
    brute = eng.search("spark topic", mode="semantic", k=5)
    annful = eng.search("spark topic", mode="semantic", k=5, ann=True, nprobe=16)
    b = [(r["point_id"], r["score"]) for r in brute.collect()]
    a = [(r["point_id"], r["score"]) for r in annful.collect()]
    assert a == b


def test_partial_probe_returns_k_and_is_subset_quality(eng):
    got = eng.search("spark topic", mode="semantic", k=5, ann=True, nprobe=4)
    rows = got.collect()
    assert len(rows) == 5
    assert all(rows[i]["score"] >= rows[i + 1]["score"] for i in range(4))


def test_index_is_materialized_partitioned_and_cached(eng):
    eng.search("x", mode="semantic", k=3, ann=True)
    adir = os.path.join(eng.store.root, "annindex")
    dirs = [d for d in os.listdir(adir) if os.path.isdir(os.path.join(adir, d))]
    assert len(dirs) == 1
    cells = [
        d
        for d in os.listdir(os.path.join(adir, dirs[0]))
        if d.startswith("ivf_cluster=")
    ]
    assert len(cells) > 1  # probe = directory pruning
    # cache hit: same manifest → same object
    df1, _ = eng._ann_index()
    df2, _ = eng._ann_index()
    assert df1 is df2


def test_write_invalidates_and_gc_runs(eng):
    adir = os.path.join(eng.store.root, "annindex")
    before = {d for d in os.listdir(adir)}
    eng.add_memory("fresh_memory", "a brand new note about gc")
    eng.search("gc note", mode="semantic", k=3, ann=True)
    after = {d for d in os.listdir(adir)}
    assert after != before  # new fingerprint
    assert len([d for d in after if not d.endswith(".json")]) == 1  # old GC'd
    # and the fresh row is findable through the rebuilt index
    full = eng.search("brand new note about gc", mode="semantic", k=40, ann=True, nprobe=16)
    names = {r["entity_name"] for r in full.collect()}
    assert "fresh_memory" in names


def test_filtered_search_falls_back(eng):
    """Payload filters bypass the ANN layout (it carries no payload
    columns) — results equal the brute filtered path."""
    brute = eng.search("spark", mode="semantic", k=5, chunk_type="metadata")
    via_ann_flag = eng.search(
        "spark", mode="semantic", k=5, chunk_type="metadata", ann=True
    )
    assert [(r["point_id"], r["score"]) for r in brute.collect()] == [
        (r["point_id"], r["score"]) for r in via_ann_flag.collect()
    ]
