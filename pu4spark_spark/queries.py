"""Central registry of driver-checkable queries.

Each operator module exposes ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLE_SQL`` (name → DuckDB SQL); this module merges
them.  Names present in ``QUERIES`` but not ``ORACLE_SQL`` get the
driver's weaker rows-only check (non-SQL-expressible ML/streaming ops).
"""

from __future__ import annotations

from pu4spark_spark.operators import pu_queries

_MODULES = [pu_queries]

# widened as operator modules land (relational, dedup, similarity, text,
# multimodal) — keep imports explicit so a broken module fails loudly
for _name in ("relational", "dedup", "similarity", "text", "multimodal"):
    try:
        _mod = __import__(f"pu4spark_spark.operators.{_name}", fromlist=[_name])
    except ImportError:
        continue
    _MODULES.append(_mod)

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
