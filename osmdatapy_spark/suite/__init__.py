"""Registered query suite — the driver-facing operator inventory.

Every operator claimed in SURVEY.md §2 has (at least) one entry here:
a PySpark implementation ``fn(spark, sf_dir) -> DataFrame`` and, where
ANSI-SQL-expressible, a DuckDB oracle string producing the identical
result (same column names, same values).  ``__spark_entry__.py`` exposes
this registry to the driver.
"""

from osmdatapy_spark.suite.registry import QUERY_REGISTRY, QueryDef, register

# Importing the modules populates the registry.
from osmdatapy_spark.suite import core  # noqa: F401,E402
from osmdatapy_spark.suite import osm  # noqa: F401,E402
from osmdatapy_spark.suite import llm  # noqa: F401,E402
from osmdatapy_spark.suite import ext  # noqa: F401,E402
from osmdatapy_spark.suite import curation  # noqa: F401,E402
from osmdatapy_spark.suite import geo  # noqa: F401,E402
from osmdatapy_spark.suite import analytics  # noqa: F401,E402

__all__ = ["QUERY_REGISTRY", "QueryDef", "register"]
