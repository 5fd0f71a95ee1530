"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the same scale factor, then compares row count, sorted column
names, and an order-insensitive value multiset (floats rounded).

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize_value(x) for x in v)
    return v


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(normalize_value(r[i]) for i in order))
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from claude_code_memory_spark.session import get_spark

    spark = get_spark("selfcheck")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    passed, failed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failed.append(name)
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            failed.append(name)
            continue
        sc, sr = normalize_rows(scols, srows)
        oc, orr = normalize_rows(ocols, orows)
        problems = []
        if len(sr) != len(orr):
            problems.append(f"rowcount spark={len(sr)} duckdb={len(orr)}")
        if sc != oc:
            problems.append(f"columns spark={sc} duckdb={oc}")
        if not problems and sr != orr:
            diff_s = [r for r in sr if r not in set(orr)][:3]
            diff_o = [r for r in orr if r not in set(sr)][:3]
            problems.append(f"values differ; spark-only={diff_s} duckdb-only={diff_o}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failed.append(name)
        else:
            print(f"PASS {name}: {len(sr)} rows ({time.time()-t0:.1f}s)")
            passed.append(name)

    print(
        f"\n== {len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only "
        f"(of {len(qs)} queries) at {sf_dir}"
    )
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
