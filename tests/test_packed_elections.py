"""Boundary pins for the packed numeric election keys (r13 verdict ask #7
/ advice #1).

Three query paths replace a non-hash-aggregable ``min/max(struct(...))``
election with a packed numeric key so the aggregation hash-aggregates:

- ``llm_url_dedup`` (suite/curation.py):  max(n_chars·10¹² − doc_id)
- ``llm_dedup_pipeline`` (suite/llm.py):  max(nt·10¹² − doc_id)
- ``exact_substring_dedup`` (functions/curation.py):
  min(DECIMAL(32,0) id·10¹⁰ + p)

Each packing is order-isomorphic to its struct key ONLY under documented
domain bounds (doc_id < 10¹², nonneg ids, p < 2³¹, nt·10¹² within
BIGINT).  These tests plant the extreme corners of those domains and
assert the packed election elects exactly what the struct election
elects — the executable form of the comments at the three sites.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.functions import col

T12 = 1_000_000_000_000
MAX_DOC_ID = T12 - 1          # the documented doc_id < 10^12 bound
MAX_NT = 9_000_000            # nt·10^12 ≈ 9.0e18 < 2^63−1 ≈ 9.22e18
MAX_P = (1 << 31) - 1         # char position inside a Spark string


def _packed_max_vs_struct(spark, rows, n_col):
    """rows: (key, n, doc_id).  Returns (packed winners, struct winners)
    per key for the (n DESC, doc_id ASC) election both ways."""
    df = spark.createDataFrame(rows, f"k string, {n_col} long, doc_id long")
    packed = (
        df.groupBy("k")
        .agg(F.max(col(n_col) * T12 - col("doc_id")).alias("m"))
        .select("k", ((F.lit(T12) - col("m") % T12) % T12).alias("doc_id"))
    )
    struct = (
        df.groupBy("k")
        .agg(F.max(F.struct(col(n_col), (-col("doc_id")).alias("neg"))).alias("s"))
        .select("k", (-col("s.neg")).alias("doc_id"))
    )
    p = {r["k"]: r["doc_id"] for r in packed.collect()}
    s = {r["k"]: r["doc_id"] for r in struct.collect()}
    return p, s


def test_url_dedup_packing_at_doc_id_boundary(spark):
    """doc_id at the 10¹²−1 boundary and 0, n_chars at max realistic and
    tied — packed winner == struct winner for every group."""
    rows = [
        # tie on n: lowest doc_id must win, including the boundary id
        ("a", 100, MAX_DOC_ID), ("a", 100, MAX_DOC_ID - 1), ("a", 100, 0),
        # boundary id wins when its n is strictly larger
        ("b", 101, MAX_DOC_ID), ("b", 100, 0),
        # max-n election across disjoint packed ranges
        ("c", MAX_NT, MAX_DOC_ID), ("c", MAX_NT - 1, 0),
        # single member at both corners
        ("d", 1, MAX_DOC_ID),
        ("e", MAX_NT, 0),
    ]
    p, s = _packed_max_vs_struct(spark, rows, "n_chars")
    assert p == s == {"a": 0, "b": MAX_DOC_ID, "c": MAX_DOC_ID, "d": MAX_DOC_ID, "e": 0}


def test_dedup_pipeline_packing_at_nt_and_id_boundary(spark):
    """The llm_dedup_pipeline election (nt DESC, doc_id ASC) at the same
    corners — identical packing, separate site."""
    rows = [
        ("x", MAX_NT, MAX_DOC_ID), ("x", MAX_NT, 7), ("x", 0, 0),
        ("y", 0, MAX_DOC_ID), ("y", 0, MAX_DOC_ID - 1),
    ]
    p, s = _packed_max_vs_struct(spark, rows, "nt")
    assert p == s == {"x": 7, "y": MAX_DOC_ID - 1}


def test_packed_key_no_bigint_overflow_at_bounds(spark):
    """nt·10¹² − doc_id at the max documented nt stays inside BIGINT —
    the expression must not wrap (ANSI would error; pre-ANSI would
    silently elect garbage)."""
    df = spark.createDataFrame([(MAX_NT, 0)], "nt long, doc_id long")
    m = df.select((col("nt") * T12 - col("doc_id")).alias("m")).first()["m"]
    assert m == MAX_NT * T12
    assert m < (1 << 63) - 1


def test_substring_dedup_decimal_packing_at_p_boundary(spark):
    """The exact_substring_dedup (id, p) → DECIMAL(32,0) id·10¹⁰ + p
    packing: strict monotonicity in (id, p) lexicographic order at the
    corners — id at 10¹²−1, p at 2³¹−1 — and exact div/% unpack."""
    rows = [
        ("g1", MAX_DOC_ID, MAX_P), ("g1", MAX_DOC_ID, 0), ("g1", 5, MAX_P),
        ("g2", 0, MAX_P), ("g2", 0, 1),
        ("g3", MAX_DOC_ID, 12345),
    ]
    df = spark.createDataFrame(rows, "g string, id long, p long")
    pk = F.expr(
        "CAST(id AS DECIMAL(19,0)) * CAST(10000000000 AS DECIMAL(11,0))"
        " + CAST(p AS DECIMAL(11,0))"
    )
    packed = (
        df.groupBy("g")
        .agg(F.min(pk).alias("k"))
        .select(
            "g",
            F.expr("CAST(k div 10000000000 AS BIGINT)").alias("id"),
            F.expr("CAST(k % 10000000000 AS BIGINT)").alias("p"),
        )
    )
    struct = (
        df.groupBy("g")
        .agg(F.min(F.struct("id", "p")).alias("s"))
        .select("g", col("s.id").alias("id"), col("s.p").alias("p"))
    )
    p_res = {r["g"]: (r["id"], r["p"]) for r in packed.collect()}
    s_res = {r["g"]: (r["id"], r["p"]) for r in struct.collect()}
    assert p_res == s_res == {
        "g1": (5, MAX_P),
        "g2": (0, 1),
        "g3": (MAX_DOC_ID, 12345),
    }
