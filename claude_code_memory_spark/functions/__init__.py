"""Pure Column-expression helpers — zero UDFs, fully codegen'd."""

from claude_code_memory_spark.functions.hashing import (  # noqa: F401
    content_hash,
    md5_8,
    point_id,
)
from claude_code_memory_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    vector_lit,
)
