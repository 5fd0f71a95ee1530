"""Broadcast-gate small-batch A/B (advice r11 #3).

The r11 gate hints all ~42 lookup joins whenever the STORED
entities+bindings parquet is in [4 MB, 64 MB] — including a 1-file
incremental batch, where the ~100-200 ms-per-join broadcast build cost
was never measured (the SMJ-vs-broadcast crossover came from
full-index-sized fact sides). This measures exactly that case:

1. full-index the pyspark corpus (~865 files; stored lookup parquet
   lands a little above the 4 MB gate floor);
2. touch ONE file and re-index, alternating the gate on/off across
   ``reps`` paired trials (monkeypatching _BC_LOOKUP_MIN_BYTES to
   force each arm), interleaved A/B so machine drift hits both arms;
3. report per-arm medians (wall + process-CPU) and the stored bytes.

Writes `bc_gate_ab.json` at the repo root. Run on an IDLE machine.

Usage: python tools/bc_gate_ab.py [target_dir] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from claude_code_memory_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) > 1:
        target_src = sys.argv[1]
    else:
        import pyspark

        target_src = os.path.dirname(os.path.abspath(pyspark.__file__))
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from claude_code_memory_spark import api as apimod
    from claude_code_memory_spark.api import CodeMemoryEngine
    from claude_code_memory_spark.cpuacct import cpu_totals

    # private copy of the corpus so the touch-edit never dirties the
    # installed package
    work = tempfile.mkdtemp(prefix="bcab_corpus_")
    target = os.path.join(work, "corpus")
    shutil.copytree(target_src, target)
    # the touched file: something mid-sized and import-rich
    victim = None
    for root, _d, names in os.walk(target):
        for n in sorted(names):
            if n.endswith(".py") and 2_000 < os.path.getsize(os.path.join(root, n)) < 50_000:
                victim = os.path.join(root, n)
                break
        if victim:
            break
    assert victim, "no touchable .py file found"

    spark = get_spark("bc_gate_ab")
    spark.sparkContext.setLogLevel("ERROR")
    store = tempfile.mkdtemp(prefix="bcab_store_")
    out: dict = {"target": target_src, "victim": os.path.relpath(victim, target)}
    orig_min = apimod._BC_LOOKUP_MIN_BYTES
    try:
        eng = CodeMemoryEngine(spark, store)
        t0 = time.time()
        eng.index(target)
        out["full_index_sec"] = round(time.time() - t0, 2)
        out["stored_lookup_bytes"] = sum(
            eng.store.table_bytes(t) for t in ("entities", "bindings")
        )

        trials: dict[str, list[dict]] = {"hinted": [], "smj": []}
        for rep in range(reps):
            # alternate which arm goes first so drift is shared
            arms = ["hinted", "smj"] if rep % 2 == 0 else ["smj", "hinted"]
            for arm in arms:
                # force the gate: min=0 → stored bytes always >= min
                # (hinted); min=huge → small batch never hints (smj)
                apimod._BC_LOOKUP_MIN_BYTES = 0 if arm == "hinted" else 1 << 60
                with open(victim, "a") as fh:
                    fh.write(f"\n# bcab touch {rep} {arm}\n")
                c0 = cpu_totals()
                t0 = time.time()
                counters = eng.index(target)
                wall = time.time() - t0
                c1 = cpu_totals()
                trials[arm].append(
                    {
                        "wall_sec": round(wall, 2),
                        "process_cpu_sec": round((c1[1] - c0[1]) / 100, 2),
                        "external_cpu_share": round(
                            max((c1[0] - c0[0]) - (c1[1] - c0[1]), 0)
                            / ((os.cpu_count() or 1) * max(wall, 1e-9) * 100),
                            3,
                        ),
                        "files_changed": counters.get("files_changed"),
                    }
                )
        out["trials"] = trials
        out["median_wall"] = {
            a: round(statistics.median(t["wall_sec"] for t in ts), 2)
            for a, ts in trials.items()
        }
        out["median_cpu"] = {
            a: round(statistics.median(t["process_cpu_sec"] for t in ts), 2)
            for a, ts in trials.items()
        }
    finally:
        apimod._BC_LOOKUP_MIN_BYTES = orig_min
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bc_gate_ab.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    print("wrote bc_gate_ab.json")
    spark.stop()


if __name__ == "__main__":
    main()
