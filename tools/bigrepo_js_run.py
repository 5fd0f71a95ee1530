"""JS/TS at-scale indexing evidence (verdict r11 item 3).

The Python arm found its 95k-row id-misalignment bug only at 31k-file
scale; the JS/TS arm (50/50 fidelity, co-equal surface in the reference
— analysis/javascript_parser.py) had never been run past test-fixture
size. This builds a node_modules-sized corpus from N COPIES of the
machine's real npm node_modules tree (~1k real-world JS files per copy,
minified bundles and all — each copy is an independent import subgraph,
so resolution behavior is realistic while file count scales linearly),
indexes it end-to-end TWICE into fresh stores, and records:

- stage wall clock + process-CPU + external-CPU share (same hygiene as
  bigrepo_run.py since r12 — raw wall clock on this machine swings 3×);
- entity/relation/resolved counts;
- an order-insensitive relation-multiset hash diffed ACROSS the two
  runs — the determinism check the verdict asked for;
- the no-op reindex and a hybrid search against the big index.

Writes `bigrepo_js_evidence.json` at the repo root (ridden by bench.py's
extras like the other evidence files).

Usage: python tools/bigrepo_js_run.py [n_copies] [src_tree]
Run on an IDLE machine (memory: bench-needs-idle-machine); the loaded
flags in the artifact tell you if it wasn't.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from claude_code_memory_spark.session import get_spark  # noqa: E402

SRC_DEFAULT = "/usr/lib/node_modules"


def build_corpus(n_copies: int, src: str) -> str:
    """corpus_dir with n_copies independent copies of the src tree.
    Deterministic (pure copy); cached across runs by content marker.

    Nested ``node_modules`` directories are renamed ``_nm`` during the
    copy: the scanner's DEFAULT_EXCLUDES prunes the literal name (right
    for indexing a user project, wrong for a corpus that IS vendored
    code), and the rename is resolution-faithful — cross-package JS
    imports are bare specifiers (``require('semver')``) that the
    resolver treats as external under either directory name."""
    corpus = os.path.join(tempfile.gettempdir(), f"js_corpus_v2_{n_copies}x")
    marker = os.path.join(corpus, ".complete")
    if os.path.exists(marker):
        return corpus
    shutil.rmtree(corpus, ignore_errors=True)
    os.makedirs(corpus)
    for i in range(n_copies):
        dst = os.path.join(corpus, f"copy{i:02d}")
        shutil.copytree(src, dst)
        for root, dirs, _names in os.walk(dst, topdown=False):
            for d in dirs:
                if d == "node_modules":
                    os.rename(os.path.join(root, d), os.path.join(root, "_nm"))
    with open(marker, "w") as fh:
        fh.write(src)
    return corpus


def relation_fingerprint(eng) -> tuple[int, int, str]:
    """(n_relations, n_resolved, order-insensitive multiset hash) of the
    engine's stored relations table — the determinism probe. xxhash64
    per row, summed: any row-level difference between runs moves it."""
    from pyspark.sql import functions as F

    rel = eng.store.read("relations")
    agg = rel.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("import_type") == "resolved", 1).otherwise(0)).alias("nres"),
        # decimal(38,0) accumulator: summing raw longs overflows ANSI
        # arithmetic after ~2^32 rows-worth of hash magnitude
        F.sum(
            F.xxhash64(
                "from_entity", "to_entity", "relation_type", "import_type", "file_path"
            ).cast("decimal(38,0)")
        ).cast("string").alias("h"),
    ).collect()[0]
    return int(agg["n"]), int(agg["nres"]), agg["h"]


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else SRC_DEFAULT

    from claude_code_memory_spark.api import CodeMemoryEngine
    from claude_code_memory_spark.cpuacct import StageAccountant

    corpus = build_corpus(n_copies, src)
    n_js = sum(
        1
        for root, _dirs, names in os.walk(corpus)
        for f in names
        if f.endswith((".js", ".ts", ".jsx", ".tsx", ".mjs", ".cjs"))
    )
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = -1.0

    spark = get_spark("bigrepo_js_run")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "corpus": corpus,
        "n_copies": n_copies,
        "js_ts_files_on_disk": n_js,
        "load1_at_start": load1,
    }
    stores = [tempfile.mkdtemp(prefix="bigjs_store_") for _ in range(2)]
    try:
        acct = StageAccountant()
        # -- run 1: profiled full index + noop + search --
        eng = CodeMemoryEngine(spark, stores[0])
        acct.begin()
        t0 = time.time()
        counters = eng.index(corpus, profile=True)
        out["full_index_sec"] = round(time.time() - t0, 2)
        acct.end("full_index", time.time() - t0)
        out["stage_sec"] = counters.get("stage_sec")
        out["stage_cpu"] = counters.get("stage_cpu")
        out["files_changed"] = counters.get("files_changed")
        out["entities"] = counters.get("entities")
        out["relations"] = counters.get("relations")
        out["chunks"] = counters.get("chunks")
        t0 = time.time()
        noop = eng.index(corpus)
        out["noop_reindex_sec"] = round(time.time() - t0, 2)
        acct.end("noop_reindex", time.time() - t0)
        out["noop_files_changed"] = noop.get("files_changed")
        t0 = time.time()
        hits = eng.search("parse json config", mode="hybrid", k=10).collect()
        out["hybrid_search_sec"] = round(time.time() - t0, 3)
        acct.end("hybrid_search", time.time() - t0)
        out["hybrid_search_rows"] = len(hits)
        n1, nres1, h1 = relation_fingerprint(eng)
        out["resolved_relations"] = nres1

        # -- run 2: fresh store, unprofiled — the determinism twin --
        eng2 = CodeMemoryEngine(spark, stores[1])
        t0 = time.time()
        eng2.index(corpus)
        out["full_index_sec_run2"] = round(time.time() - t0, 2)
        acct.end("full_index_run2", time.time() - t0)
        n2, nres2, h2 = relation_fingerprint(eng2)
        out["determinism"] = {
            "relations": [n1, n2],
            "resolved": [nres1, nres2],
            "multiset_hash_equal": h1 == h2,
        }
        out["run_cpu"] = acct.stages
    finally:
        for s in stores:
            shutil.rmtree(s, ignore_errors=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bigrepo_js_evidence.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    print("wrote bigrepo_js_evidence.json")
    spark.stop()


if __name__ == "__main__":
    main()
