"""sf1 scale-evidence run (verdict r8 item 6): execute the 13 headline
queries plus the heaviest oracle queries at the 10x dataset produced by
tools/gen_sf1.py, record wall times and AQE/spill observations, and
write `sf1_evidence.json` at the repo root. bench.py folds that file
into its extras as `sf1_evidence` so the measurement rides the driver
artifact without the driver needing the 10x dataset present.

Usage: python tools/sf1run.py [sf1_dir]   (default /tmp/sf1_evidence)
Run on an IDLE machine (memory: bench-needs-idle-machine).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from claude_code_memory_spark.session import get_spark  # noqa: E402

HEAVY_ORACLES = [
    # the 10 heaviest non-headline oracle queries by r8 selfcheck time
    "dedup_cross_substring",
    "dedup_minhash_delta",
    "tokenizer_bpe_pair_counts",
    "text_pmi_cooccurrence",
    "lm_bigram_doc_scores",
    "pack_training_sequences",
    "scd2_user_state_intervals",
    "window_rank_ntile",
    "dedup_embedding_neardup",
    "knn_join_queries",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_evidence"
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"{sf_dir} missing — run tools/gen_sf1.py first")
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = -1.0
    from claude_code_memory_spark.queries import REGISTRY

    spark = get_spark("sf1run")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n, e in REGISTRY.items() if e.headline] + [
        n for n in HEAVY_ORACLES if n in REGISTRY
    ]
    out: dict = {
        "sf": 1.0,
        "generator": "tools/gen_sf1.py (sf0.1 x10, keys shifted)",
        "load1_at_start": load1,
        "queries": {},
        "errors": {},
    }
    for name in names:
        fn = REGISTRY[name].fn
        try:
            fn(spark, sf_dir).collect()  # warm: codegen + page cache
            spark.catalog.clearCache()
            t0 = time.time()
            n = len(fn(spark, sf_dir).collect())
            out["queries"][name] = {
                "sec": round(time.time() - t0, 3),
                "rows": n,
            }
            print(f"{name}: {out['queries'][name]['sec']}s, {n} rows")
        except Exception as exc:  # noqa: BLE001
            out["errors"][name] = (
                f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
            )
            print(f"{name}: ERROR {out['errors'][name]}")
    if not out["errors"]:
        del out["errors"]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "sf1_evidence.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote sf1_evidence.json")
    spark.stop()


if __name__ == "__main__":
    main()
