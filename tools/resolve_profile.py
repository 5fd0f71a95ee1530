"""Per-pin resolve-stage profile on a real corpus (round-10 tooling:
the round-9 verdict's 'pin profile' was hand-instrumented; this makes
it reproducible). Indexes the target with CCMS_RESOLVE_PROFILE=1 and
prints each _pin's label + wall seconds, the stage split, and the total.

Usage: python tools/resolve_profile.py [target_dir]
(default: the installed pyspark package — the 865-file corpus)
"""

from __future__ import annotations

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

    from claude_code_memory_spark.api import CodeMemoryEngine
    from claude_code_memory_spark.operators import resolve as rmod

    spark = get_spark("resolve_profile")
    spark.sparkContext.setLogLevel("ERROR")
    store = tempfile.mkdtemp(prefix="rprof_store_")
    try:
        eng = CodeMemoryEngine(spark, store)
        t0 = time.time()
        counters = eng.index(target, profile=True)
        total = time.time() - t0
    finally:
        shutil.rmtree(store, ignore_errors=True)
    print(f"\ntarget: {target}")
    print(f"entities={counters.get('entities')} relations={counters.get('relations')}")
    print("stage_sec:", counters.get("stage_sec"))
    print("stage_cpu:", counters.get("stage_cpu"))
    print(f"full_index_sec: {total:.2f}")
    pins = rmod.PIN_PROFILE
    print(f"\npin profile ({len(pins)} pins, {sum(s for _, s in pins):.2f}s total):")
    for label, sec in sorted(pins, key=lambda x: -x[1]):
        print(f"  {label:20s} {sec:8.3f}s")
    term = sum(s for lbl, s in pins if lbl.startswith("term_"))
    print(f"\nterminal section (term_* pins, r12): {term:.2f}s")


if __name__ == "__main__":
    main()
