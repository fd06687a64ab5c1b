"""Skew-stress harness (round-10 verdict ask #7): every bench query runs
on uniform synthetic data, so the suite's skew-resilience claims —
map-side partial aggregation (llm_paragraph_dedup), WindowGroupLimit
top-k (llm_domain_cap), explicit two-phase salting (rel_skew_salted_agg)
— are exercised here on a DELIBERATELY skewed fixture next to a uniform
control of identical row count and identical total bytes-of-work.

Fixtures (deterministic, hash-derived, cached in /tmp):
  documents  600k docs.  uniform: 1000 equal domains, every paragraph
             globally unique.  skewed: ONE domain holds 50% of all docs
             (Zipf head) AND those same docs share one identical
             boilerplate paragraph (a 300k-copy hot fingerprint).
  lineitem   4M rows.  uniform: 3 equal return flags.  skewed: one flag
             holds 96% of rows.

For each (query, fixture) run: wall-clock (noop sink) plus the
heaviest-by-executorRunTime stage's TASK-TIME DISTRIBUTION from the
Spark REST API (min/median/p95/max) — the straggler evidence a wall
number alone hides.  A skew-safe plan shows skewed/uniform wall ≈ 1 and
max-task ≈ median-task; a hot-key pathology shows up as one task owning
the stage.

Usage: python tools/skew_check.py   → one JSON line + a markdown table
(paste into SCALE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F  # noqa: E402
from pyspark.sql.functions import col, lit  # noqa: E402

from osmdatapy_spark.suite import QUERY_REGISTRY  # noqa: E402

N_DOCS = 600_000
N_LINES = 4_000_000


def _fixture_dir(kind: str) -> str:
    import tempfile

    return os.path.join(tempfile.gettempdir(), f"osmdatapy_skew_{kind}_v1")


def _token_blob(prefix_expr, n_tokens: int, salt: int):
    """n_tokens whitespace-separated tokens, hash-derived from a per-row
    prefix expression — unique-ish vocabulary, no rand() (reruns and both
    fixtures are bit-identical)."""
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(lit(1), lit(n_tokens)),
            lambda j: F.concat(
                lit("w"),
                F.pmod(F.xxhash64(prefix_expr, j, lit(salt)), lit(9_999_991)).cast("string"),
            ),
        ),
    )


def build_documents(spark: SparkSession, skewed: bool) -> str:
    d = _fixture_dir("docs_skew" if skewed else "docs_uniform")
    marker = os.path.join(d, "_done")
    if os.path.exists(marker):
        return d
    ids = spark.range(1, N_DOCS + 1).select(col("id").alias("doc_id"))
    if skewed:
        source = F.when(F.pmod(col("doc_id"), 2) == 0, lit("bigdomain")).otherwise(
            F.concat(lit("dom"), F.pmod(col("doc_id"), 999).cast("string"))
        )
        # every even doc opens with the SAME 20-token paragraph — the
        # 300k-copy hot fingerprint key paragraph_dedup must collapse
        # map-side; odd docs get a unique first paragraph
        para1 = F.when(
            F.pmod(col("doc_id"), 2) == 0, _token_blob(lit(0), 20, 7)
        ).otherwise(_token_blob(col("doc_id"), 20, 7))
    else:
        source = F.concat(lit("dom"), F.pmod(col("doc_id"), 1000).cast("string"))
        para1 = _token_blob(col("doc_id"), 20, 7)
    text = F.concat_ws(" ", para1, _token_blob(col("doc_id"), 40, 13))
    docs = ids.select(
        "doc_id", text.alias("text"), lit("en").alias("lang"), source.alias("source")
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    open(marker, "w").close()
    return d


def build_lineitem(spark: SparkSession, skewed: bool) -> str:
    d = _fixture_dir("li_skew" if skewed else "li_uniform")
    marker = os.path.join(d, "_done")
    if os.path.exists(marker):
        return d
    ids = spark.range(1, N_LINES + 1)
    if skewed:
        flag = (
            F.when(F.pmod(col("id"), 50) == 0, lit("A"))
            .when(F.pmod(col("id"), 50) == 1, lit("R"))
            .otherwise(lit("N"))
        )
    else:
        flag = F.element_at(
            F.array(lit("A"), lit("N"), lit("R")), (F.pmod(col("id"), 3) + 1).cast("int")
        )
    li = ids.select(
        col("id").alias("l_orderkey"),
        F.pmod(col("id"), 7).cast("int").alias("l_linenumber"),
        F.pmod(col("id") * 31, 100_000).alias("l_partkey"),
        flag.alias("l_returnflag"),
        (F.pmod(col("id"), 10_000) * 0.01 + 1.0).alias("l_extendedprice"),
    )
    li.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    open(marker, "w").close()
    return d


def _rest(sc, path: str):
    base, app = sc.uiWebUrl, sc.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def run_instrumented(spark: SparkSession, name: str, sf_dir: str) -> dict:
    """Wall-clock + heaviest-stage task-time quantiles for one query run."""
    sc = spark.sparkContext
    before = {s["stageId"] for s in _rest(sc, "/stages")}
    t0 = time.time()
    QUERY_REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.catalog.clearCache()
    # the REST status store is fed by the ASYNC listener bus — the final
    # stage may not be COMPLETE yet when the action returns; poll briefly
    # instead of losing a minutes-long harness run to an empty list
    stages: list = []
    for _ in range(20):
        stages = [
            s
            for s in _rest(sc, "/stages?status=COMPLETE")
            if s["stageId"] not in before and s.get("numCompleteTasks", 0) > 0
        ]
        if stages:
            break
        time.sleep(0.5)
    if not stages:
        return {"wall_sec": round(wall, 2), "stage_tasks": 0,
                "task_ms": {"min": 0, "med": 0, "p95": 0, "max": 0}}
    heaviest = max(stages, key=lambda s: s.get("executorRunTime", 0))
    attempt = heaviest.get("attemptId", 0)  # a retried stage 404s attempt 0
    qs = _rest(
        sc,
        f"/stages/{heaviest['stageId']}/{attempt}/taskSummary?quantiles=0.0,0.5,0.95,1.0",
    )["executorRunTime"]
    return {
        "wall_sec": round(wall, 2),
        "stage_tasks": heaviest["numCompleteTasks"],
        "task_ms": {
            "min": round(qs[0]),
            "med": round(qs[1]),
            "p95": round(qs[2]),
            "max": round(qs[3]),
        },
    }


def main() -> None:
    # this harness reads task-time quantiles off the REST status API, so
    # opt in to the UI (get_spark's env override) BEFORE the session builds
    os.environ["SPARK_GRAFT_UI"] = "true"
    from osmdatapy_spark.session import get_spark

    spark = get_spark("osmdatapy-skew-check")
    # getOrCreate REUSES a pre-existing session, in which case the env
    # opt-in above never reached the builder and every _rest() call would
    # crash opaquely on uiWebUrl=None — fail up front, naming the cause
    if spark.sparkContext.uiWebUrl is None:
        raise SystemExit(
            "skew_check needs the Spark UI REST API, but this session has "
            "spark.ui.enabled=false — a SparkSession already existed before "
            "the SPARK_GRAFT_UI=true opt-in could apply (getOrCreate reuses "
            "it).  Run skew_check in a fresh process."
        )
    spark.sparkContext.setLogLevel("ERROR")

    fixtures = {
        "documents": (build_documents(spark, False), build_documents(spark, True)),
        "lineitem": (build_lineitem(spark, False), build_lineitem(spark, True)),
    }
    plan = [
        ("rel_skew_salted_agg", "lineitem"),
        ("llm_domain_cap", "documents"),
        ("llm_paragraph_dedup", "documents"),
    ]
    # one warm pass absorbs JIT so uniform-vs-skewed is engine, not JDK
    for name, fam in plan:
        run_instrumented(spark, name, fixtures[fam][0])

    out: dict = {}
    rows = []
    for name, fam in plan:
        uni = run_instrumented(spark, name, fixtures[fam][0])
        skw = run_instrumented(spark, name, fixtures[fam][1])
        ratio = round(skw["wall_sec"] / max(uni["wall_sec"], 1e-9), 2)
        straggle = round(skw["task_ms"]["max"] / max(skw["task_ms"]["med"], 1), 1)
        out[name] = {"uniform": uni, "skewed": skw, "wall_ratio": ratio,
                     "skewed_max_over_med_task": straggle}
        rows.append(
            f"| {name} | {uni['wall_sec']}s | {skw['wall_sec']}s | {ratio}x "
            f"| {uni['task_ms']['med']}/{uni['task_ms']['max']} "
            f"| {skw['task_ms']['med']}/{skw['task_ms']['max']} | {straggle}x |"
        )
    print(json.dumps(out))
    print()
    print("| query | uniform wall | skewed wall | wall ratio | uni med/max task ms | skew med/max task ms | skew max/med |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
