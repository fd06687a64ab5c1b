"""Similarity search over embedding columns (north-star scope).

Baseline: brute-force cosine top-k — probe set broadcast against the
corpus, dot products as `zip_with` + `aggregate` folds (JVM-side,
sequential fold order ⇒ deterministic doubles).  Scale path: LSH bucketing
(random-hyperplane signs → band join, reusing dedup.lsh machinery) or IVF
(k-means coarse quantizer as a groupBy assignment, probe only nearest
cells).  At 100 TB the corpus side stays partitioned; only probes move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: float×float products are exactly
    representable in double, and the left-to-right fold fixes the summation
    order — the oracle's list_sum walks the same order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    decimals: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per probe by cosine.

    Ranking uses the ROUNDED cosine plus the neighbor id as tiebreaker so
    the order is total and engine-portable.  The probe side is broadcast —
    the corpus never shuffles; cost is one pass over the corpus per batch
    of probes (batch probes together at scale)."""
    c = corpus.select(col(id_col).alias("nbr_id"), as_double(col(vec_col)).alias("cvec"))
    p = probes.select(col(id_col).alias("probe_id"), as_double(col(vec_col)).alias("pvec"))
    scored = c.join(broadcast(p), col("probe_id") != col("nbr_id")).select(
        "probe_id",
        "nbr_id",
        F.round(cosine(col("pvec"), col("cvec")), decimals).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(col("cos").desc(), col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(col("rank") <= k)
        .select("probe_id", "nbr_id", "cos", "rank")
    )


def sign_grid_cell(vec: Column, n_dims: int = 4) -> Column:
    """Coarse-quantizer cell id from the sign pattern of the first
    ``n_dims`` components — the IVF idea with a data-independent
    quantizer, fully portable across engines.  2^n_dims cells; probes
    search only their own cell (optionally neighbors for recall)."""
    cell = lit(0)
    for i in range(n_dims):
        cell = cell + F.when(F.element_at(vec, i + 1) > 0, lit(1 << i)).otherwise(lit(0))
    return cell.cast("int")


def grid_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_dims: int = 4,
    decimals: int = 4,
) -> DataFrame:
    """ANN top-k restricted to the probe's grid cell: the scale path next
    to ``brute_force_topk``.  The corpus is scanned once and shuffled by
    cell (16 buckets here; a production IVF uses k-means cells);
    candidate scoring touches ~1/cells of the corpus per probe."""
    c = corpus.select(
        col(id_col).alias("nbr_id"),
        as_double(col(vec_col)).alias("cvec"),
        sign_grid_cell(col(vec_col), n_dims).alias("cell"),
    )
    p = probes.select(
        col(id_col).alias("probe_id"),
        as_double(col(vec_col)).alias("pvec"),
        sign_grid_cell(col(vec_col), n_dims).alias("cell"),
    )
    scored = c.join(broadcast(p), "cell").filter(col("probe_id") != col("nbr_id")).select(
        "probe_id",
        "nbr_id",
        F.round(cosine(col("pvec"), col("cvec")), decimals).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(col("cos").desc(), col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(col("rank") <= k)
        .select("probe_id", "nbr_id", "cos", "rank")
    )


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of dot products with fixed
    pseudo-random planes → integer bucket.  Planes are generated
    deterministically from the seed via a hash-based formula (no RNG state),
    so executors regenerate them locally — nothing is shipped."""
    dim_idx = F.sequence(lit(0), F.size(col(vec_col)) - 1)
    bucket = lit(0)
    for p in range(n_planes):
        # plane component j = fractional hash in [-0.5, 0.5)
        comp = lambda j: (F.pmod(F.xxhash64(lit(seed), lit(p), j), lit(1000)) / 1000.0 - 0.5)  # noqa: E731
        proj = F.aggregate(
            F.zip_with(as_double(col(vec_col)), F.transform(dim_idx, comp), lambda x, y: x * y),
            lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    return vectors.select(col(id_col), bucket.cast("int").alias("bucket"))
