"""Central registry of driver-checkable queries.

Each operator module exposes ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLE_SQL`` (name → DuckDB SQL); this module merges
them.  Names present in ``QUERIES`` but not ``ORACLE_SQL`` get the
driver's weaker rows-only check (non-SQL-expressible ML/streaming ops).
"""

from __future__ import annotations

from pu4spark_spark.operators import pu_queries

_MODULES = [pu_queries]

from pu4spark_spark.operators import (  # noqa: E402
    asof,
    curation,
    dedup,
    multimodal,
    pipeline,
    relational,
    similarity,
    text,
)
from pu4spark_spark.sources import formats as fmt_sources  # noqa: E402
from pu4spark_spark.streaming import events as streaming_events  # noqa: E402
from pu4spark_spark.streaming import stateful as streaming_stateful  # noqa: E402

_MODULES += [
    relational,
    asof,
    curation,
    dedup,
    similarity,
    text,
    multimodal,
    pipeline,
    fmt_sources,
    streaming_events,
    streaming_stateful,
]

QUERIES = {}
ORACLE_SQL = {}
for _m in _MODULES:
    for _k in _m.QUERIES:
        if _k in QUERIES:
            raise ValueError(f"duplicate query name {_k!r}")
    QUERIES.update(_m.QUERIES)
    ORACLE_SQL.update(getattr(_m, "ORACLE_SQL", {}))

missing = set(ORACLE_SQL) - set(QUERIES)
if missing:
    raise ValueError(f"oracle_sql without queries: {missing}")
