"""One-file incremental reindex profile — the resolve-scoping target
metric (verdict r12 'next round' item 1). Full-indexes the target, then
drops one file_state row (same victim rule as bigrepo_run.py, or pass
one as argv[2]) and re-indexes that single file with profile=True +
CCMS_RESOLVE_PROFILE=1, printing the stage split, the per-pin resolve
profile, and the relations-multiset oracle.

Usage: python tools/onefile_profile.py [target_dir] [victim_rel_path]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ["CCMS_RESOLVE_PROFILE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from claude_code_memory_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) > 1:
        target = sys.argv[1]
    else:
        import pyspark

        target = os.path.dirname(os.path.abspath(pyspark.__file__))

    from pyspark.sql import functions as F

    from claude_code_memory_spark.api import CodeMemoryEngine
    from claude_code_memory_spark.operators import resolve as rmod

    spark = get_spark("onefile_profile")
    spark.sparkContext.setLogLevel("ERROR")
    store = tempfile.mkdtemp(prefix="onefile_store_")
    out: dict = {"target": target}
    try:
        eng = CodeMemoryEngine(spark, store)
        t0 = time.time()
        eng.index(target)
        out["full_index_sec"] = round(time.time() - t0, 2)

        def rel_fingerprint():
            agg = (
                eng.store.read("relations")
                .select(
                    F.xxhash64(
                        "from_entity", "to_entity", "relation_type",
                        "import_type", "file_path",
                    ).cast("decimal(38,0)").alias("h")
                )
                .agg(F.count(F.lit(1)).alias("n"), F.sum("h").cast("string").alias("hs"))
                .collect()[0]
            )
            return int(agg["n"]), agg["hs"]

        fs = eng.store.read("file_state")
        if len(sys.argv) > 2:
            victim = sys.argv[2]
        else:
            victim = fs.orderBy("relative_path").limit(1).collect()[0]["relative_path"]
        before = rel_fingerprint()
        eng.store.write("file_state", fs.filter(F.col("relative_path") != victim))
        t0 = time.time()
        one = eng.index(target, profile=True)
        out["one_file_reindex_sec"] = round(time.time() - t0, 2)
        after = rel_fingerprint()
        out["victim"] = victim
        out["files_changed"] = one.get("files_changed")
        out["stage_sec"] = one.get("stage_sec")
        out["stage_cpu"] = one.get("stage_cpu")
        out["relations_multiset_equal"] = before == after
        pins = rmod.PIN_PROFILE
        out["pin_profile"] = sorted(
            [[lbl, sec] for lbl, sec in pins], key=lambda x: -x[1]
        )
        out["pin_total_sec"] = round(sum(s for _, s in pins), 2)
        out["scope_info"] = dict(rmod.LAST_SCOPE_INFO)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
