"""Corpus sinks: how curated training data leaves the engine.

The reference's only sink is an in-memory (Geo)DataFrame
(``_frame.py:8-57``); at 100 TB the sink IS the product — a partitioned,
size-bounded parquet layout that the training loader reads shard by
shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write a curated corpus as partitioned parquet.

    - ``partition_by`` (e.g. ``['lang']``) becomes directory partitions,
      so a per-language training run prunes at the LISTING level — no
      footer is even opened for other languages.
    - ``maxRecordsPerFile`` bounds shard size so the training loader gets
      uniform units regardless of upstream partition skew (the writer
      splits oversized tasks; it never merges, so pair it with AQE
      coalescing which is on in session.py).
    - parquet dictionary+RLE encoding replaces the reference's global
      string table (SURVEY §1.5) at rest.
    """
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read back a corpus written by ``write_corpus``; partition columns
    come back as regular columns (Spark partition discovery)."""
    return spark.read.parquet(path)
