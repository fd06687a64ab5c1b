"""Shared helpers for suite queries — cross-engine determinism utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from osmdatapy_spark.session import tune_session
from osmdatapy_spark.tables import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


def TS(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table load for CPU-bound per-row kernels (hashing, shingling,
    vector math): `spread` re-distributes a coarse small-file scan across
    all cores; a no-op at real scale (see tables.spread)."""
    from osmdatapy_spark.tables import spread

    return spread(T(spark, sf_dir, name))


def dec(c: str | Column, prec: int = 18, scale: int = 4) -> Column:
    """Exact-decimal view of a float column.

    The synthetic data is decimal-exact at <=4 places (verified), so
    aggregating in DECIMAL is exact and order-independent — the only way a
    parallel Spark sum and a single-threaded DuckDB sum can be
    bit-identical after CAST to DOUBLE.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({prec},{scale})")


def dsum(c: str | Column, prec: int = 18, scale: int = 4) -> Column:
    """Order-independent exact sum of a float column, as DOUBLE."""
    return F.sum(dec(c, prec, scale)).cast("double")
