"""Loaders for the driver's synthetic star schema + documents/embeddings.

One parquet file per table (TESTDATA.md).  Reads are plain
``spark.read.parquet`` so Catalyst column pruning and predicate pushdown
reach the scan (verify with ``.explain``: ``PushedFilters`` / ``ReadSchema``).

At 100 TB these would be partitioned/bucketed tables; the loader keeps the
same names so the suite is storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nano-precision parquet timestamp read as LONG (see session.py);
        # truncate to microseconds — the same truncation DuckDB applies when
        # casting TIMESTAMP_NS to TIMESTAMP
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
