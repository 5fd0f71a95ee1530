"""Per-query optimization profiler (round 12).

For each named query (default: the headline set), this captures:
- ``plans/r12/<name>_<tag>.txt`` — ``explain("formatted")`` output;
- fresh-plan wall time (build DataFrame + collect, median of N) — the
  driver-bench methodology;
- exec-only wall time (re-collect the same DataFrame, plan reused) —
  the number that extrapolates to cluster scale (guide §1);
- noop-sink wall time (df.write.format("noop"), fresh plan) — computes
  every column, excludes driver-side result pickling (guide §1.4);
- plan counters (exchanges, joins, codegen spans) via planaudit.

Usage: python tools/qprof.py [sf_dir] [--tag before] [--runs 3] [q ...]
Prints one JSON line per query and a totals line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from tools.planaudit import audit_plan  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if args and not args[0].startswith("--"):
        sf_dir = args.pop(0)
    tag = "before"
    runs = 3
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    only = args

    from claude_code_memory_spark.queries import REGISTRY
    from claude_code_memory_spark.session import get_spark

    spark = get_spark("qprof")
    spark.sparkContext.setLogLevel("ERROR")
    names = only or [n for n, e in REGISTRY.items() if e.headline]

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    # warm-up: every profiled query once at the smallest SF (codegen cache)
    warm_dir = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else sf_dir
    for n in names:
        try:
            REGISTRY[n].fn(spark, warm_dir).collect()
        except Exception:  # noqa: BLE001
            pass
    spark.catalog.clearCache()
    # untimed full pass at the measured scale (page cache + listing)
    for n in names:
        try:
            REGISTRY[n].fn(spark, sf_dir).collect()
        except Exception:  # noqa: BLE001
            pass
    spark.catalog.clearCache()

    results = {}
    for n in names:
        fn = REGISTRY[n].fn
        row: dict = {}
        try:
            df = fn(spark, sf_dir)
            formatted = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{n}_{tag}.txt"), "w") as fh:
                fh.write(formatted)
            row["audit"] = audit_plan(
                df._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as exc:  # noqa: BLE001
            row["plan_error"] = f"{type(exc).__name__}: {str(exc)[:150]}"
        # fresh-plan timing (driver methodology)
        fresh = []
        try:
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).collect()
                fresh.append(time.time() - t0)
            row["fresh"] = round(sorted(fresh)[len(fresh) // 2], 3)
            row["fresh_min"] = round(min(fresh), 3)
        except Exception as exc:  # noqa: BLE001
            row["fresh_error"] = f"{type(exc).__name__}: {str(exc)[:150]}"
            results[n] = row
            print(json.dumps({n: row}))
            continue
        # exec-only (plan reuse)
        try:
            df = fn(spark, sf_dir)
            df.collect()
            es = []
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.time()
                df.collect()
                es.append(time.time() - t0)
            row["exec_only"] = round(sorted(es)[len(es) // 2], 3)
        except Exception as exc:  # noqa: BLE001
            row["exec_error"] = f"{type(exc).__name__}: {str(exc)[:150]}"
        # noop sink, fresh plan
        try:
            ns = []
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ns.append(time.time() - t0)
            row["noop_fresh"] = round(sorted(ns)[len(ns) // 2], 3)
        except Exception as exc:  # noqa: BLE001
            row["noop_error"] = f"{type(exc).__name__}: {str(exc)[:150]}"
        results[n] = row
        print(json.dumps({n: row}))

    tot = {
        "total_fresh": round(sum(r.get("fresh", 0) for r in results.values()), 3),
        "total_exec_only": round(sum(r.get("exec_only", 0) for r in results.values()), 3),
        "n": len(results),
        "tag": tag,
        "sf_dir": sf_dir,
    }
    print(json.dumps(tot))
    out_path = os.path.join(plans_dir, f"qprof_{tag}.json")
    with open(out_path, "w") as fh:
        json.dump({"queries": results, **tot}, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
