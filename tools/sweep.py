"""Full-catalog timed sweep (round 12 evidence tool).

One fresh collect() per catalog query at the given SF, recording wall
seconds and the process-tree CPU seconds consumed during the query
(utilization = cpu/wall/nproc). Outliers found here should be
re-measured warm before drawing conclusions (cold numbers include
codegen compile).

Usage: python tools/sweep.py [sf_dir] [--out plans/r12/sweep.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def _proc_tree_cpu() -> float:
    """CPU seconds (user+sys) of this process and all descendants,
    including reaped children (utime/stime + cutime/cstime)."""
    try:
        with open("/proc/self/stat") as f:
            parts = f.read().split()
        hz = os.sysconf("SC_CLK_TCK")
        own = (int(parts[13]) + int(parts[14]) + int(parts[15]) + int(parts[16])) / hz
    except OSError:
        return 0.0
    # live descendants (the JVM is a child, not reaped)
    total = own
    try:
        pids = [p for p in os.listdir("/proc") if p.isdigit()]
        me = str(os.getpid())
        children = {me}
        # two passes are enough for pid->ppid chains of depth 2 (python -> java)
        for _ in range(3):
            for p in pids:
                try:
                    with open(f"/proc/{p}/stat") as f:
                        sp = f.read().split()
                    if sp[3] in children:
                        children.add(p)
                except OSError:
                    continue
        for p in children - {me}:
            try:
                with open(f"/proc/{p}/stat") as f:
                    sp = f.read().split()
                total += (int(sp[13]) + int(sp[14])) / hz
            except OSError:
                continue
    except OSError:
        pass
    return total


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if args and not args[0].startswith("--"):
        sf_dir = args.pop(0)
    out = "plans/r12/sweep.json"
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]

    from claude_code_memory_spark.queries import REGISTRY
    from claude_code_memory_spark.session import get_spark

    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    nproc = os.cpu_count() or 1

    results = {}
    for name, entry in REGISTRY.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        c0, t0 = _proc_tree_cpu(), time.time()
        try:
            n = len(entry.fn(spark, sf_dir).collect())
            err = None
        except Exception as exc:  # record, keep sweeping
            n, err = -1, str(exc)[:200]
        wall = time.time() - t0
        cpu = _proc_tree_cpu() - c0
        results[name] = {
            "wall_sec": round(wall, 3),
            "cpu_sec": round(cpu, 1),
            "util_cores": round(cpu / wall, 1) if wall > 0 else 0.0,
            "rows": n,
            **({"err": err} if err else {}),
        }
        print(json.dumps({name: results[name]}), flush=True)

    total = round(sum(r["wall_sec"] for r in results.values()), 1)
    doc = {"sf_dir": sf_dir, "nproc": nproc, "total_wall_sec": total, "queries": results}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
    print(f"TOTAL {total}s over {len(results)} queries -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
