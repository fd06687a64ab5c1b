"""Query registry: name -> (spark implementation, optional DuckDB oracle).

Cross-engine determinism rules every entry follows (so the driver's
row-count + schema + order-insensitive value-hash comparison passes):

- Float aggregation is done in DECIMAL (exact, order-independent), then
  CAST to DOUBLE for the final column — bit-identical across engines and
  immune to summation order, which matters because Spark sums per
  partition in nondeterministic order.
- Every computed column is aliased identically in Spark and SQL.
- "first/last/top-k" style picks use a *total* order (unique tiebreaker
  column) — never engine-dependent row order.
- String formatting of numbers uses C-style printf (`format_string` /
  `printf`), never locale- or engine-specific rendering.

Historical note on the one permanent red row in the cumulative driver
record: ``rel_approx_sketches`` (CORRECTNESS_r03) was UNREGISTERED in
round 4 and does not exist here — engine-internal HLL++/t-digest sketch
states admit no cross-engine value oracle (COVERAGE.md §2.11).  Its
capabilities are covered by the fully-oracled deterministic
sketch-register queries ``rel_hll_registers``, ``rel_cms_heavy_hitters``
and ``rel_bloom_filter``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


QUERY_REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        # a silent dict overwrite shadows the earlier query — round 3
        # shipped a dead osm_bearing_histogram in suite/geo.py this way
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERY_REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, bench=bench, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
