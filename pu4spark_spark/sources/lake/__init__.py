"""``sources/lake`` — the mini-lake: a Delta-style table protocol
over JSONL shards, built on the PySpark 4 Python DataSource API.  See
:mod:`pu4spark_spark.sources.pydatasource` (the compatibility shim)
for the module map."""

from pu4spark_spark.sources.lake import (  # noqa: F401
    cdf,
    dml,
    maintenance,
    protocol,
    queries,
    queries_stream,
    source,
    streaming,
)
