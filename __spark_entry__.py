"""Driver contract for the spark-graft builder (PySpark target).

Exposes the osmdatapy_spark query suite: ``entry`` runs the flagship
pricing-summary query at sf0.001; ``queries``/``oracle_sql`` expose the
full operator inventory (SURVEY.md §2 + north-star extensions) with
DuckDB oracles.  Implementation lives in ``osmdatapy_spark/suite/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from osmdatapy_spark.suite import QUERY_REGISTRY, ordered_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_REGISTRY["rel_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Family-interleaved order (osm/llm/rel/stream showcase heads first) so
    any prefix sample of this dict spans the whole engine, not one family.
    """
    return {name: qd.fn for name, qd in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    return {name: qd.oracle for name, qd in ordered_registry().items() if qd.oracle is not None}
