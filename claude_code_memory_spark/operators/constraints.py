"""Declarative data-quality constraints compiled to a minimal number of
passes (the deequ/dbt-test surface, Spark-first).

All row-local rules (not_null, accepted_values, range, regex) fold into
ONE conditional-aggregation scan — adding a rule costs one counter, not
one pass. Uniqueness costs one aggregate on its key; referential
integrity one anti-join counted. The report is a tiny (rule, n_violations)
frame a pipeline can gate on.

Reference parity: the reference validates payloads procedurally at
ingest (indexer state checks); this is the corpus-scale formulation —
at 100 TB, validation MUST ride the same scan as everything else.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint: ``violation`` is a boolean Column that is
    TRUE for rows violating the rule (row-local rules only)."""

    name: str
    violation: Column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_values({col})",
        ~F.col(col).isin(values) | F.col(col).isNull(),
    )


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"in_range({col})",
        (F.col(col) < lo) | (F.col(col) > hi) | F.col(col).isNull(),
    )


def matches(col: str, pattern: str) -> Check:
    return Check(
        f"matches({col})", ~F.col(col).rlike(pattern) | F.col(col).isNull()
    )


def constraint_report(
    df: DataFrame,
    checks: list[Check],
    *,
    unique: list[str] | None = None,
    references: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """(rule, n_violations) for every constraint.

    - ``checks``: row-local rules — ONE scan, one counter per rule
      (conditional aggregation; fully codegen'd, no shuffle beyond the
      single-row final aggregate).
    - ``unique``: column set that must be unique — one aggregate on the
      key; violations = rows beyond the first of each duplicated key.
    - ``references``: (fk_col, parent_df, pk_col) — orphaned foreign
      keys, counted via a left-anti join (broadcast when the parent is
      small, shuffled otherwise — Catalyst/AQE's call).
    """
    aggs = [
        F.sum(c.violation.cast("long")).alias(c.name) for c in checks
    ]
    parts: list[DataFrame] = []
    if aggs:
        row = df.agg(*aggs)
        stacked = row.selectExpr(
            "stack({n}, {pairs}) AS (rule, n_violations)".format(
                n=len(checks),
                pairs=", ".join(f"'{c.name}', `{c.name}`" for c in checks),
            )
        )
        parts.append(stacked)
    if unique:
        dup = (
            df.groupBy(*unique)
            .agg(F.count("*").alias("__n"))
            .agg(
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
            .select(
                F.lit(f"unique({', '.join(unique)})").alias("rule"), "n_violations"
            )
        )
        parts.append(dup)
    if references:
        fk, parent, pk = references
        orphans = (
            df.select(F.col(fk))
            .filter(F.col(fk).isNotNull())
            .join(parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti")
            .agg(F.count("*").alias("n_violations"))
            .select(F.lit(f"references({fk})").alias("rule"), "n_violations")
        )
        parts.append(orphans)
    if not parts:
        raise ValueError("no constraints given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
