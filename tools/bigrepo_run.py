"""Big-repo indexing evidence: run the full CodeMemoryEngine pipeline
over a LARGE real codebase (default: the installed pyspark package,
~500 Python files; pass any directory — site-packages itself is the
12k-file stress variant) and record wall time, per-stage split, row
counts, and the no-op incremental pass.

The per-round reindex benchmarks index this engine's own ~80-file repo;
this run is the scale evidence that the parse (mapInPandas), resolve
(entity-scale join pipeline), and merge-write stages hold on a corpus
one to two orders of magnitude bigger — real code, not synthetic.

Writes `bigrepo_evidence.json` at the repo root; bench.py folds it into
its extras (like sf1_evidence.json) so the measurement rides the driver
artifact.

Usage: python tools/bigrepo_run.py [target_dir] [out_name]
(out_name defaults to bigrepo_evidence.json; the 12k-file site-packages
stress run writes bigrepo_stress_evidence.json so both ride the bench
artifact.) Run on an IDLE machine (memory: bench-needs-idle-machine).
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


def main() -> None:
    if len(sys.argv) > 1:
        target = sys.argv[1]
    else:
        import pyspark

        target = os.path.dirname(os.path.abspath(pyspark.__file__))
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = -1.0

    from claude_code_memory_spark.api import CodeMemoryEngine

    spark = get_spark("bigrepo_run")
    spark.sparkContext.setLogLevel("ERROR")
    store = tempfile.mkdtemp(prefix="bigrepo_store_")
    out: dict = {
        "target": target,
        "load1_at_start": load1,
    }
    try:
        from claude_code_memory_spark.cpuacct import StageAccountant

        # same load hygiene as bench.py's sections (verdict r11 item 2):
        # stage_sec is wall clock on a machine whose idle runs swing 3×,
        # so every stage also carries process-CPU seconds (the figure
        # targets are set in) and the external-CPU share that flags the
        # wall clock as suspect
        acct = StageAccountant()
        eng = CodeMemoryEngine(spark, store)
        acct.begin()
        t0 = time.time()
        counters = eng.index(target, profile=True)
        out["full_index_sec"] = round(time.time() - t0, 2)
        acct.end("full_index", time.time() - t0)
        out["stage_sec"] = counters.get("stage_sec")
        out["stage_cpu"] = counters.get("stage_cpu")
        out["files_changed"] = counters.get("files_changed")
        out["entities"] = counters.get("entities")
        out["relations"] = counters.get("relations")
        out["chunks"] = counters.get("chunks")
        t0 = time.time()
        noop = eng.index(target)
        out["noop_reindex_sec"] = round(time.time() - t0, 2)
        acct.end("noop_reindex", time.time() - t0)
        out["noop_files_changed"] = noop.get("files_changed")

        # forced 1-file incremental (r12): drop one file_state row so
        # exactly one unchanged file re-indexes. Two things are under
        # test: the merge-on-read commit cost (time ∝ batch, not corpus)
        # and the RESOLUTION INVARIANT — re-indexing an unchanged file
        # must leave the relations multiset bit-identical (the oracle
        # any future resolve-scoping optimization must keep green).
        from pyspark.sql import functions as F

        def rel_fingerprint():
            agg = (
                eng.store.read("relations")
                .select(
                    F.xxhash64(
                        "from_entity",
                        "to_entity",
                        "relation_type",
                        "import_type",
                        "file_path",
                    )
                    .cast("decimal(38,0)")
                    .alias("h")
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("h").cast("string").alias("hs"),
                )
                .collect()[0]
            )
            return int(agg["n"]), agg["hs"]
        fs = eng.store.read("file_state")
        victim = fs.orderBy("relative_path").limit(1).collect()[0]["relative_path"]
        before = rel_fingerprint()
        eng.store.write("file_state", fs.filter(F.col("relative_path") != victim))
        t0 = time.time()
        one = eng.index(target)
        out["one_file_reindex_sec"] = round(time.time() - t0, 2)
        acct.end("one_file_reindex", time.time() - t0)
        after = rel_fingerprint()
        out["one_file_reindex"] = {
            "victim": victim,
            "files_changed": one.get("files_changed"),
            "relations_before": before[0],
            "relations_after": after[0],
            "relations_multiset_equal": before == after,
        }
        # a search against the big index — the serving path at this scale
        t0 = time.time()
        hits = eng.search("read parquet schema", mode="hybrid", k=10).collect()
        out["hybrid_search_sec"] = round(time.time() - t0, 3)
        acct.end("hybrid_search", time.time() - t0)
        out["hybrid_search_rows"] = len(hits)
        out["run_cpu"] = acct.stages
    finally:
        shutil.rmtree(store, ignore_errors=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_name = sys.argv[2] if len(sys.argv) > 2 else "bigrepo_evidence.json"
    with open(os.path.join(here, out_name), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {out_name}")
    spark.stop()


if __name__ == "__main__":
    main()
