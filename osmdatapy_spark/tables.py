"""Loaders for the driver's synthetic star schema + documents/embeddings.

One parquet file per table (TESTDATA.md).  Reads are plain
``spark.read.parquet`` so Catalyst column pruning and predicate pushdown
reach the scan (verify with ``.explain``: ``PushedFilters`` / ``ReadSchema``).

At 100 TB these would be partitioned/bucketed tables; the loader keeps the
same names so the suite is storage-agnostic.
"""

from __future__ import annotations

import threading

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

# Table-HANDLE memo: ``spark.read.parquet`` costs ~0.12 s of driver time
# per call (py4j round trips + a footer/schema read), and every query
# construction re-pays it per table — ~0.2-0.4 s per bench pass on
# multi-table queries.  A DataFrame is an immutable logical-plan handle
# (schema + file index), NOT data: reusing it across queries changes no
# plan and caches no results — every action still scans the parquet
# inputs (same discipline as the geometry/similarity expression memos).
# Keyed by the live SparkSession OBJECT (held in the value, so its id
# can never be reused while the entry exists); entries of stopped
# sessions are pruned on the next miss.
_TABLE_MEMO: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}
_TABLE_MEMO_LOCK = threading.Lock()


def _memo_get(key: tuple[int, str, str]) -> DataFrame | None:
    with _TABLE_MEMO_LOCK:
        hit = _TABLE_MEMO.get(key)
        return hit[1] if hit is not None else None


def _memo_put(key: tuple[int, str, str], spark: SparkSession, df: DataFrame) -> None:
    with _TABLE_MEMO_LOCK:
        for k, (s, _) in list(_TABLE_MEMO.items()):
            try:
                stopped = s._sc._jsc is None or s._sc._jsc.sc().isStopped()
            except Exception:
                stopped = True
            if stopped:
                del _TABLE_MEMO[k]
        _TABLE_MEMO[key] = (spark, df)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    cached = _memo_get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nano-precision parquet timestamp read as LONG (see session.py);
        # truncate to microseconds — the same truncation DuckDB applies when
        # casting TIMESTAMP_NS to TIMESTAMP
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _memo_put(key, spark, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so the engine's second entry
    point — plain ``spark.sql(...)`` — works against the same data the
    DataFrame API sees.  Views go through ``load_table``, so physical
    quirks (nano-timestamp events) are normalized identically."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Give a CPU-bound per-row kernel cluster-wide parallelism.

    Parquet scans split only at row-group boundaries, so a small file
    yields a handful of tasks no matter how many cores exist — a
    hash-per-k-gram kernel then serializes on 2 of 32 cores (measured 8x
    wall-clock loss on the sf0.1 documents table).  When the scan's
    partition count is below ``min_factor * defaultParallelism``,
    round-robin repartition to the default parallelism; otherwise return
    the input unchanged.  At 100 TB every table has thousands of row
    groups, the guard never fires, and no shuffle is added — this is a
    small-extract affordance, not a plan fixture.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df
