"""Generate an sf1-scale dataset (10x sf0.1) for the scale-evidence run
(verdict r8 item 6) WITHOUT touching /root/testdata: each table is the
sf0.1 parquet replicated 10x with primary/foreign keys shifted per copy,
so join fan-outs and group cardinalities scale the way a real sf1 would
(10x lineitem/orders/customer/documents/events; nation/region stay the
25/5 dimension tables, exactly like TPC-H).

With ``--skew`` (verdict r9 item 4), the replicated data additionally
gets HOT KEYS — the uniform x10 clone scales cardinalities but not
skew, so the salted-join/AQE-skew machinery never fires on data that
needs it. Deterministically (hash-of-row mod 10, no RNG):
  - ~10% of lineitem rows point at ONE l_orderkey (a celebrity order —
    hits the l_orderkey fact-fact join that join_salted_status_revenue
    salts, and q18-style per-order aggregation);
  - a DIFFERENT ~10% of lineitem rows point at ONE l_suppkey (hot
    supplier — hits the q9-family supplier joins);
  - ~10% of events rows belong to ONE user_id (celebrity user — hits
    the as-of join, sessionization, and per-user windows).
The hot values are existing keys from copy 0, so every FK edge stays
valid.

Usage: python tools/gen_sf1.py [out_dir] [--skew]
(default out_dir /tmp/sf1_evidence; with --skew use e.g. /tmp/sf1_skew)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from claude_code_memory_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

# per-table key columns to shift by copy_index * (max+1): keeps every
# FK edge intact within a copy and disjoint across copies
SHIFT = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "partsupp": ["ps_partkey", "ps_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dimensions replicate 1x (stay small, like TPC-H)
    "nation": None,
    "region": None,
}


# (table, hot column, row-identity columns for the deterministic mod-10
# pick, seed literal making the two lineitem picks independent)
SKEW_RULES = {
    "lineitem": [
        ("l_orderkey", ["l_orderkey", "l_partkey", "l_suppkey"], 1),
        ("l_suppkey", ["l_orderkey", "l_partkey", "l_suppkey"], 2),
    ],
    "events": [("user_id", ["event_id"], 3)],
}


def _apply_skew(df, table):
    rules = SKEW_RULES.get(table, [])
    if not rules:
        return df
    # pick flags computed from the ORIGINAL row identity first, so the
    # second lineitem rule's selection is independent of the first
    # rule's override
    for col, idcols, seed in rules:
        df = df.withColumn(
            f"__pick_{col}",
            F.pmod(F.hash(F.lit(seed), *[F.col(c) for c in idcols]), F.lit(10)) == 0,
        )
    hot_keys = {}
    for col, _idcols, _seed in rules:
        hot = df.agg(F.min(col)).collect()[0][0]
        df = df.withColumn(
            col, F.when(F.col(f"__pick_{col}"), F.lit(hot)).otherwise(F.col(col))
        )
        hot_keys[col] = int(hot)
    df = df.drop(*[f"__pick_{col}" for col, _i, _s in rules])
    print(f"{table}: hot keys {hot_keys} (~10% of rows each)")
    return df


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew = "--skew" in sys.argv
    out = args[0] if args else "/tmp/sf1_evidence"
    spark = get_spark("gen_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    for table in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        src = os.path.join(SRC, f"{table}.parquet")
        df = spark.read.parquet(src)
        keys = SHIFT.get(table)
        keys = [k for k in (keys or []) if k in df.columns]
        if not keys:
            df.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
            print(f"{table}: copied 1x")
            continue
        maxes = df.agg(*[F.max(k).alias(k) for k in keys]).collect()[0]
        copies = []
        for i in range(COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * (int(maxes[k]) + 1)))
            copies.append(c)
        allc = copies[0]
        for c in copies[1:]:
            allc = allc.unionByName(c)
        if skew:
            allc = _apply_skew(allc, table)
        allc.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {COPIES}x, keys shifted: {keys}" + (" +skew" if skew and table in SKEW_RULES else ""))
    spark.stop()


if __name__ == "__main__":
    main()
