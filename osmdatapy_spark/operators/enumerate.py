"""Global dense enumeration — the scalable form of ``ROW_NUMBER() OVER
(ORDER BY key)`` and the engine half of ``osmium renumber`` (dense-id
rewrite, a real OSM maintenance tool the reference lacks).

A partition-less window is the classic global-sort scale killer: Spark
moves the WHOLE dataset through one task.  The two-pass shape here keeps
every step distributed and deterministic:

1. bucket boundaries from ``approxQuantile`` over the key (bounded
   driver data, the ``sinks.write_clustered`` discipline) become a
   LITERAL bucket-assignment expression — a pure function of the key, so
   every pass over the DataFrame agrees on bucket membership with no
   frozen partitioning to carry around;
2. one partial-aggregated count per bucket (≤ n rows to the driver)
   cumulates into bucket START OFFSETS, broadcast back as a literal map;
3. rank = offset[bucket] + row_number() within the bucket's window —
   the shuffle is by bucket (balanced by construction), never global.

Keys must be unique (osmids within an element kind are); ties would get
an arbitrary order within equal keys.  Determinism: buckets and offsets
are pure functions of the data, so the assigned ids are bit-identical
under any partitioning — pinned by the partitioning-invariance suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def dense_ids(
    df: DataFrame,
    key_col: str,
    out_col: str = "new_id",
    start: int = 1,
    n_buckets: int = 32,
) -> DataFrame:
    """Append ``out_col`` = the key's 1-based dense global position in
    ascending ``key_col`` order (``start`` offsets the numbering)."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.approxQuantile(key_col, qs, 0.001)))
    if bounds:
        arr = F.array(*[lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(arr, lambda x: x < col(key_col).cast("double")))
    else:
        bucket = lit(0)
    with_b = df.withColumn("_bkt", bucket)
    counts = {
        r["_bkt"]: r["c"]
        for r in with_b.groupBy("_bkt").agg(F.count("*").alias("c")).collect()
    }
    offsets = {}
    acc = start
    for b in range(len(bounds) + 1):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off_map = F.create_map(
        *[lit(v) for b in sorted(offsets) for v in (b, offsets[b])]
    )
    w = Window.partitionBy("_bkt").orderBy(key_col)
    return with_b.withColumn(
        out_col,
        (F.element_at(off_map, col("_bkt")) + F.row_number().over(w) - 1).cast("long"),
    ).drop("_bkt")
