"""Driver-facing query catalog: every implemented operator from
SURVEY.md §2 has a named entry here, most with a DuckDB oracle.

Importing this package populates ``REGISTRY``.
"""

from claude_code_memory_spark.queries.base import REGISTRY, oracle_sql_map, query_map  # noqa: F401
from claude_code_memory_spark.queries import (  # noqa: F401,E402
    dedupq,
    pipelineq,
    relational,
    relational2,
    relational3,
    relational4,
    search,
    sessionsq,
    textopsq,
)
