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


def test_append_maintains_index_incrementally(eng):
    """A pure append refreshes the index with a DELTA dir — new vectors
    assigned against the SAVED centroids, O(new rows) — instead of a
    full retrain, and the refreshed index still satisfies the
    full-probe-equals-brute exactness guarantee."""
    import json

    adir = os.path.join(eng.store.root, "annindex")
    eng._ann_index()  # ensure built
    before_centers = json.load(open(os.path.join(adir, "state-ivf16.json")))[
        "centers"
    ]
    eng.add_memory("fresh_memory", "a brand new note about gc")
    eng.search("gc note", mode="semantic", k=3, ann=True)
    state = json.load(open(os.path.join(adir, "state-ivf16.json")))
    assert len(state["dirs"]) == 2
    assert any("-delta-" in d for d in state["dirs"])
    # centroids fixed on append (standard IVF maintenance)
    assert state["centers"] == before_centers
    # superseded artifacts GC'd: only referenced dirs + the state file
    on_disk = {d for d in os.listdir(adir) if not d.endswith(".json")}
    assert on_disk == set(state["dirs"])
    # the fresh row is findable, and exactness holds through the delta
    full = eng.search(
        "brand new note about gc", mode="semantic", k=41, ann=True, nprobe=16
    )
    names = {r["entity_name"] for r in full.collect()}
    assert "fresh_memory" in names
    brute = eng.search("gc note", mode="semantic", k=5)
    annful = eng.search("gc note", mode="semantic", k=5, ann=True, nprobe=16)
    assert [(r["point_id"], r["score"]) for r in brute.collect()] == [
        (r["point_id"], r["score"]) for r in annful.collect()
    ]


def test_delta_cap_triggers_full_rebuild(eng):
    """Accumulated delta dirs at ANN_MAX_DELTA_DIRS → the next refresh
    retrains and rewrites (the OPTIMIZE move), collapsing to one dir
    that covers everything."""
    import json

    adir = os.path.join(eng.store.root, "annindex")
    # previous test left dirs = [full, delta]; cap 2 means no more deltas
    eng.ANN_MAX_DELTA_DIRS = 2  # instance override
    eng.add_memory("cap_memory_a", "a capped delta note")
    eng._ann_index()
    state = json.load(open(os.path.join(adir, "state-ivf16.json")))
    assert len(state["dirs"]) == 1
    assert "-full-" in state["dirs"][0]
    del eng.ANN_MAX_DELTA_DIRS  # restore class default for later tests
    full = eng.search(
        "capped delta note", mode="semantic", k=42, ann=True, nprobe=16
    )
    assert "cap_memory_a" in {r["entity_name"] for r in full.collect()}


def test_sibling_centroid_indexes_coexist(eng):
    """GC is scoped per n_centroids (advice r7): committing one index's
    state must not delete a sibling index's state file or partitioned
    dirs — otherwise serving two cell counts against one store rebuilds
    both on every refresh."""
    import json

    adir = os.path.join(eng.store.root, "annindex")
    eng._ann_index(16)
    eng._ann_index(8)  # sibling build commits → must not GC ivf16 dirs
    s16 = json.load(open(os.path.join(adir, "state-ivf16.json")))
    s8 = json.load(open(os.path.join(adir, "state-ivf8.json")))
    on_disk = {d for d in os.listdir(adir) if not d.endswith(".json")}
    assert set(s16["dirs"]) <= on_disk and set(s8["dirs"]) <= on_disk
    # an append refreshing BOTH indexes leaves both states serving
    eng.add_memory("sibling_memory", "a note for sibling index isolation")
    eng._ann_index(16)
    eng._ann_index(8)
    s16 = json.load(open(os.path.join(adir, "state-ivf16.json")))
    s8 = json.load(open(os.path.join(adir, "state-ivf8.json")))
    on_disk = {d for d in os.listdir(adir) if not d.endswith(".json")}
    assert set(s16["dirs"]) <= on_disk and set(s8["dirs"]) <= on_disk
    assert on_disk == set(s16["dirs"]) | set(s8["dirs"])  # GC still runs per-N


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
