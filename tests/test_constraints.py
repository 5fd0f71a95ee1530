"""Constraint engine (operators/constraints.py): violation counts on a
frame with PLANTED defects, plan shape of the row-local pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from claude_code_memory_spark.operators import constraints as C


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "O", 10.0, 100),
        (2, "F", -5.0, 100),     # in_range violation
        (3, "X", 20.0, 101),     # accepted_values violation
        (4, None, 30.0, 999),    # not_null(status) + orphaned fk
        (4, "O", 40.0, 100),     # duplicate id
        (5, "P", None, None),    # in_range (null) violation; null fk ignored
    ]
    return spark.createDataFrame(rows, "id long, status string, price double, cust long")


@pytest.fixture(scope="module")
def parents(spark):
    return spark.createDataFrame([(100,), (101,)], "cust_id long")


def _report(df, parents):
    return {
        r["rule"]: r["n_violations"]
        for r in C.constraint_report(
            df,
            [
                C.not_null("status"),
                C.accepted_values("status", ["O", "F", "P"]),
                C.in_range("price", 0, 100),
            ],
            unique=["id"],
            references=("cust", parents, "cust_id"),
        ).collect()
    }


def test_planted_violations_counted_exactly(dirty, parents):
    got = _report(dirty, parents)
    assert got == {
        "not_null(status)": 1,
        "accepted_values(status)": 2,  # 'X' and NULL
        "in_range(price)": 2,          # -5.0 and NULL
        "unique(id)": 1,               # one row beyond the first id=4
        "references(cust)": 1,         # cust=999; NULL fk not an orphan
    }


def test_clean_frame_reports_all_zero(spark, parents):
    clean = spark.createDataFrame(
        [(1, "O", 10.0, 100), (2, "F", 20.0, 101)],
        "id long, status string, price double, cust long",
    )
    got = _report(clean, parents)
    assert set(got.values()) == {0}


def test_row_local_rules_are_one_scan(dirty):
    """All row-local rules must fold into a single aggregate over a
    single scan — no joins, no extra exchanges beyond the one-row agg."""
    rep = C.constraint_report(
        dirty,
        [
            C.not_null("status"),
            C.accepted_values("status", ["O", "F", "P"]),
            C.in_range("price", 0, 100),
        ],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") + plan.count("Relation") == 1
    assert "Join" not in plan


def test_no_constraints_raises(dirty):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        C.constraint_report(dirty, [])


@pytest.mark.slow
def test_engine_validate_and_profile(spark, tmp_path):
    """The engine's own store passes its integrity constraints after an
    index pass, and the profiler summarizes store tables in one scan."""
    from claude_code_memory_spark.api import CodeMemoryEngine

    eng = CodeMemoryEngine(spark, str(tmp_path / "vstore"))
    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / "m.py").write_text("def f():\n    return 1\n\n\ndef g():\n    return f()\n")
    eng.index(str(proj))

    report = {r["rule"]: r["n_violations"] for r in eng.validate().collect()}
    assert set(report.values()) == {0}, report
    assert "unique(point_id)" in report and "references(point_id)" in report

    prof = {r["column"]: r for r in eng.profile("chunks").collect()}
    assert prof["point_id"]["n_nulls"] == 0
    assert prof["chunk_type"]["approx_distinct"] >= 2  # metadata + relation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no such table"):
        eng.profile("nope")


def test_validate_on_empty_store_is_empty(spark, tmp_path):
    from claude_code_memory_spark.api import CodeMemoryEngine

    eng = CodeMemoryEngine(spark, str(tmp_path / "empty"))
    assert eng.validate().count() == 0
