"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf": float}.

Timing is per-query wall clock around the collecting action (plan build +
execution), after a warm-up action so JVM/codegen startup isn't charged to
the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from claude_code_memory_spark.queries import REGISTRY
    from claude_code_memory_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch the biggest table once (JVM + codegen + file listing)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    headline = {name: e.fn for name, e in REGISTRY.items() if e.headline}
    timings: dict[str, float] = {}
    for name, fn in headline.items():
        t0 = time.time()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
