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


@pytest.mark.slow
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


@pytest.mark.slow
def test_append_maintains_index_incrementally(eng):
    """A pure append refreshes the index with a ROLLING delta dir — new
    vectors assigned against the SAVED centroids and folded together
    with the previous delta, so the index is always at most base+delta
    (verdict r8 item 4: probe read-amp stays bounded) — and the
    refreshed index still satisfies full-probe-equals-brute."""
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
    # a SECOND append folds into the same single delta slot: still 2
    # dirs, a NEW delta dir name, both appended rows inside it
    old_delta = next(d for d in state["dirs"] if "-delta-" in d)
    eng.add_memory("fresh_memory_2", "another incremental note about gc")
    eng.search("gc note", mode="semantic", k=3, ann=True)
    state = json.load(open(os.path.join(adir, "state-ivf16.json")))
    assert len(state["dirs"]) == 2
    new_delta = next(d for d in state["dirs"] if "-delta-" in d)
    assert new_delta != old_delta
    assert state["delta_rows"] >= 2
    on_disk = {d for d in os.listdir(adir) if not d.endswith(".json")}
    assert on_disk == set(state["dirs"])  # the old delta dir was GC'd
    # the fresh rows are findable, and exactness holds through the delta
    full = eng.search(
        "brand new note about gc", mode="semantic", k=42, ann=True, nprobe=16
    )
    names = {r["entity_name"] for r in full.collect()}
    assert "fresh_memory" in names and "fresh_memory_2" in names
    brute = eng.search("gc note", mode="semantic", k=5)
    annful = eng.search("gc note", mode="semantic", k=5, ann=True, nprobe=16)
    assert [(r["point_id"], r["score"]) for r in brute.collect()] == [
        (r["point_id"], r["score"]) for r in annful.collect()
    ]


def test_delta_fraction_triggers_full_rebuild(eng):
    """A cumulative delta past ANN_DELTA_REBUILD_FRACTION of the base →
    the next refresh retrains and rewrites (the OPTIMIZE move),
    collapsing to one dir that covers everything."""
    import json

    adir = os.path.join(eng.store.root, "annindex")
    # previous test left base+delta; a tiny fraction forces the rebuild
    eng.ANN_DELTA_REBUILD_FRACTION = 0.0  # instance override
    eng.add_memory("cap_memory_a", "a capped delta note")
    eng._ann_index()
    state = json.load(open(os.path.join(adir, "state-ivf16.json")))
    assert len(state["dirs"]) == 1
    assert "-full-" in state["dirs"][0]
    assert state["delta_rows"] == 0
    del eng.ANN_DELTA_REBUILD_FRACTION  # restore class default
    full = eng.search(
        "capped delta note", mode="semantic", k=43, ann=True, nprobe=16
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


def test_retired_centroid_prefix_swept(eng):
    """Advice r8: a retired n_centroids (config change) must not strand
    artifacts forever. A sibling whose state file is older than the
    retention window is swept wholesale by the next commit; a fresh
    sibling survives (the r7 per-N protection)."""
    import json

    adir = os.path.join(eng.store.root, "annindex")
    eng._ann_index(16)
    eng._ann_index(8)
    old_state = os.path.join(adir, "state-ivf8.json")
    assert os.path.exists(old_state)
    # age the ivf8 state past the retention window (mtime-based liveness)
    stale = os.path.getmtime(old_state) - eng.ANN_STATE_RETENTION_SEC - 60
    os.utime(old_state, (stale, stale))
    # force a fresh ivf16 commit: append + refresh
    eng.add_memory("retire_trigger", "a note that forces an index refresh")
    eng._ann_index(16)
    left = set(os.listdir(adir))
    assert not any(d.startswith("ivf8-") or d == "state-ivf8.json" for d in left), (
        f"retired ivf8 artifacts not swept: {sorted(left)}"
    )
    s16 = json.load(open(os.path.join(adir, "state-ivf16.json")))
    on_disk = {d for d in left if not d.endswith(".json")}
    assert set(s16["dirs"]) <= on_disk  # live index untouched
    # a subsequent ivf8 request simply rebuilds from scratch
    eng._ann_index(8)
    assert os.path.exists(old_state)


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
