"""Fixture-schema canary: every catalog query must at least ANALYZE against
the shipped testdata, whatever physical encoding the fixtures carry.

Round 2 lost 6 driver rows and the whole bench to a single
AnalysisException (events.ts shipped as µs TIMESTAMP while the engine
assumed ns-as-LONG). Analysis errors are cheap to detect — touching
``.schema`` runs the analyzer without executing a job — so this turns a
lost driver round into a seconds-long pytest failure.
"""

from __future__ import annotations

import pytest

from claude_code_memory_spark.queries import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_catalog_query_analyzes(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_catalog_query_never_cartesian(spark, sf_dir, name):
    """Catalog-wide plan lint: no CartesianProduct anywhere. Cross joins
    are only ever BroadcastNestedLoopJoin against broadcast 1-row/
    centroid-sized frames (those print as BNLJ, not CartesianProduct);
    a CartesianProduct node means a join lost its equality key or its
    broadcast side outgrew the threshold — either is a scale bug."""
    plan = (
        REGISTRY[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, name
