"""Arrow-batched pandas UDFs defined via TYPE-HINT inference.

This module deliberately has NO ``from __future__ import annotations``:
that import stringifies signature hints module-wide, which
``pandas_udf``'s Series→Series / Series→scalar inference cannot read —
the workaround elsewhere was the legacy ``PandasUDFType`` functionType
argument, deprecated since Spark 3.0 (SPARK-28264) and warned about on
every use.  Defining the UDFs here keeps the rest of the codebase on
postponed annotations while staying on the supported API.

Each UDF is built by a FACTORY, not at module import: ``pandas_udf``
resolves the active SparkContext at decoration time, so module-level
definitions would make importing this file before session creation an
error (and would pin the UDF to a stopped session across restarts).
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def parquet_footer_rows():
    """Scalar UDF: exact per-file row count from the parquet FOOTER —
    one footer read per file, never a row scan (the O(files)
    layout-audit cost model; see ``sources/formats.py:
    audit_file_listing``)."""

    @pandas_udf("bigint")
    def footer_rows(paths: pd.Series) -> pd.Series:
        import pyarrow.parquet as pq

        def nrows(p):
            if p.startswith("file:"):
                p = p[5:]
            return pq.ParquetFile(p).metadata.num_rows

        return paths.map(nrows)

    return footer_rows


def grouped_median():
    """GROUPED_AGG median: numpy's even-count median (mean of the two
    middle values) is the same IEEE operation DuckDB's ``median``
    performs, so results hash-match the oracle."""

    @pandas_udf("double")
    def median_udf(v: pd.Series) -> float:
        return float(v.median())

    return median_udf


def grouped_count():
    """GROUPED_AGG count — Spark disallows mixing a group-agg pandas
    UDF with native aggregates in one ``agg()``, so the count rides as
    a second pandas aggregate beside :func:`grouped_median`."""

    @pandas_udf("long")
    def count_udf(v: pd.Series) -> int:
        return len(v)

    return count_udf
