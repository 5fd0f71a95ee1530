"""Oracle output-type linter: catches the HUGEINT class of driver hash
failures before a query ever reaches the driver window.

The driver compares Spark results against DuckDB oracles *via pandas*.
DuckDB materializes HUGEINT (the result type of ``sum(<integer>)``) to
pandas as float64, so a value-identical result hashes ``4.0`` against
Spark's ``4`` and the row goes red even though every value matches —
this exact artifact caused the only red driver rows in rounds 1-4.

This tool runs every registered oracle through DuckDB at a small scale
factor and fails if any *output* column's DuckDB type is HUGEINT (or
UHUGEINT): the fix is always a one-line ``CAST(... AS BIGINT)`` in the
oracle SQL (the Spark side already emits int64).

Usage: python tools/dtypecheck.py [sf_dir] [query_name ...]
Exit 0 = clean, 1 = at least one offending column.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

BAD_TYPES = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad = []
    errs = []
    checked = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        checked += 1
        try:
            rel = con.sql(sql)
            offending = [
                f"{col}:{typ}"
                for col, typ in zip(rel.columns, [str(t) for t in rel.types])
                if str(typ).upper() in BAD_TYPES
            ]
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            errs.append((name, f"{type(exc).__name__}: {exc}"))
            continue
        if offending:
            bad.append((name, offending))

    for name, cols in bad:
        print(f"HUGEINT {name}: {', '.join(cols)}  -> CAST(... AS BIGINT) in the oracle")
    for name, err in errs:
        print(f"ERROR   {name}: {err}")
    print(f"dtypecheck: {checked} oracles, {len(bad)} with HUGEINT outputs, {len(errs)} errors")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
