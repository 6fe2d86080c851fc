from pu4spark_spark.sources.sinks import write_bucketed_table, write_parquet
from pu4spark_spark.sources.tables import TABLES, load_table, load_tables

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "write_bucketed_table",
    "write_parquet",
]
