"""Generate an sf1-scale dataset (10x sf0.1) for the scale-evidence run
(verdict r8 item 6) WITHOUT touching /root/testdata: each table is the
sf0.1 parquet replicated 10x with primary/foreign keys shifted per copy,
so join fan-outs and group cardinalities scale the way a real sf1 would
(10x lineitem/orders/customer/documents/events; nation/region stay the
25/5 dimension tables, exactly like TPC-H).

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/sf1_evidence)
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


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_evidence"
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
        allc.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {COPIES}x, keys shifted: {keys}")
    spark.stop()


if __name__ == "__main__":
    main()
