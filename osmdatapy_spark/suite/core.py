"""Core relational operator suite — scans, filters, joins, aggregates,
windows, sorts, set ops (SURVEY.md §2.1-§2.6).

Each query exercises one operator family from the reference's inventory,
re-expressed on the driver's synthetic tables so the DuckDB oracle can
verify it.  Reference citations are per-operator in the docstrings.

Scale notes (100 TB mindset), applied throughout:
- FIXED-cardinality dimension joins (`nation` 25 rows, `region` 5 rows)
  are explicitly `broadcast()` — no shuffle of the fact table;
- every relation whose cardinality GROWS with sf (customer, supplier,
  part, orders, lineitem, events, documents, embeddings, and any
  per-user/per-key aggregate of them) joins UNHINTED: a forced hint
  overrides Catalyst's size check and is a driver OOM at 100×, while
  AQE still broadcasts at small sf and degrades gracefully to SMJ at
  large (round 4 removed the audit's forced fact broadcasts; round 5
  removed the last dim hints on customer/supplier/part and pinned the
  class in tests/test_plans.py::test_no_forced_broadcast_on_scaling_tables);
  at scale fact-fact joins would be co-bucketed on the join key to
  eliminate the exchange entirely;
- aggregations are expressed as single groupBy so Spark plans
  partial (map-side) + final aggregation — never collect-then-reduce;
- windows partition on high-cardinality keys (user_id, orderkey) so the
  shuffle is well-distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from osmdatapy_spark.suite._util import T, dec, dsum
from osmdatapy_spark.suite.registry import register

# ---------------------------------------------------------------------------
# Scans / filters / projections (S-family, P-family)
# ---------------------------------------------------------------------------


@register(
    "rel_scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity >= 45
    """,
    doc="Projection + pushed filter (ref predicate pushdown, primitives.py:26-27). "
    "`.explain` must show PushedFilters on the parquet scan and a 4-column ReadSchema.",
)
def rel_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "lineitem")
        .filter((col("l_shipdate") >= lit("2000-01-01").cast("timestamp")) & (col("l_quantity") >= 45))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "rel_idset_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (1, 7, 42, 100, 555, 1001, 4999)
    """,
    doc="Id-set lookup (ref P5: node_ids/way_ids, osmquery.py:117-136). Small sets "
    "compile to an IN-list pushed to the scan; large sets become a broadcast semi-join.",
)
def rel_idset_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = [1, 7, 42, 100, 555, 1001, 4999]
    return (
        T(spark, sf_dir, "orders")
        .filter(col("o_orderkey").isin(ids))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Aggregations (A-family)
# ---------------------------------------------------------------------------


@register(
    "rel_pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(8,4))) * (1 + CAST(l_tax AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    doc="Flagship TPC-H-Q1-style scan+agg (ref A-family; groupBy aggregations "
    "_frame.py:298-303 generalized). Partial agg map-side; 6 groups → tiny shuffle.",
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp"))
    disc_price = dec("l_extendedprice", 12, 4) * (lit(1) - dec("l_discount", 8, 4))
    charge = disc_price * (lit(1) + dec("l_tax", 8, 4))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
        (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
        (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "rel_agg_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
    doc="Exact distinct-count + min/max per group (ref A2/A5 value_counts + "
    "distinct, _geometry.py:76-82, osmdata.py:144). Distinct agg = two-phase "
    "shuffle; min/max are order-independent so safe on DOUBLE.",
)
def rel_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "rel_pivot_returnflag",
    oracle="""
    SELECT l_linestatus,
      CAST(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_A,
      CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_N,
      CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_R
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Pivot / unstack to wide columns (ref A2 unstack _frame.py:241-243; tag "
    "pivot _frame.py:59-68). Pivot on an EXPLICIT value list — never on unbounded "
    "keys at scale (SURVEY §7 hard-point 3); compiles to one pass of conditional aggs.",
)
def rel_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )
    return out.select(
        "l_linestatus",
        col("A").alias("qty_A"),
        col("N").alias("qty_N"),
        col("R").alias("qty_R"),
    )


@register(
    "rel_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="Distinct (ref A5, osmdata.py:144). Hash-aggregate with map-side partial dedup.",
)
def rel_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "rel_dropdup_keep_first",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity FROM (
      SELECT l_orderkey, l_partkey, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
      FROM lineitem) WHERE rn = 1
    """,
    doc="Deterministic dropDuplicates (ref A6, _frame.py:126). Plain dropDuplicates "
    "keeps an arbitrary row; a total order via row_number makes it reproducible — "
    "required for any engine whose scans are parallel.",
)
def rel_dropdup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_quantity")
    return (
        T(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@register(
    "rel_collect_sorted",
    oracle="""
    SELECT p_brand, array_to_string(list_sort(list(p_partkey)), ',') AS partkeys
    FROM part GROUP BY p_brand
    """,
    doc="Collect-to-list per group (ref A7 collect_by_indices, _geometry.py:68-106). "
    "Sorted before join so the result is order-canonical; at scale bound group size "
    "or use slice() to cap memory per key.",
)
def rel_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("p_partkey")), lambda x: x.cast("string")), ","
            ).alias("partkeys")
        )
    )


# ---------------------------------------------------------------------------
# Joins (J-family)
# ---------------------------------------------------------------------------


@register(
    "rel_join_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    bench=True,
    doc="Fact-fact + dimension joins (ref J1/J4 pandas merges, _frame.py:33-40, "
    "osmdata.py:81-84). nation is broadcast (25 rows, fixed cardinality); customer "
    "SCALES with sf (≈lineitem/40 — billions of rows at 100 TB) so its join is "
    "unhinted and AQE picks broadcast only when runtime stats say it fits; "
    "lineitem⋈orders shuffles on orderkey — at 100 TB both sides co-bucketed on it.",
)
def rel_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", 12, 4) * (lit(1) - dec("l_discount", 8, 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, col("o_custkey") == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 4).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


@register(
    "rel_semi_join",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 49)
    """,
    doc="Left-semi join (ref J2 semi-reduction, osmdata.py:194-197). Semi joins "
    "never duplicate the probe side and broadcast when small.",
)
def rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = T(spark, sf_dir, "part")
    li = T(spark, sf_dir, "lineitem").filter(col("l_quantity") > 49)
    return part.join(li, part.p_partkey == li.l_partkey, "left_semi").select("p_partkey", "p_name")


@register(
    "rel_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_totalprice > 300000)
    """,
    doc="Left-anti join (ref J3 isin-negation, _frame.py:27-28). The reference "
    "materializes an id set; anti-join streams instead — no driver-side set at scale.",
)
def rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    big = T(spark, sf_dir, "orders").filter(col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "rel_left_join_coalesce",
    oracle="""
    SELECT c_custkey, COALESCE(o.cnt, 0) AS n_orders
    FROM customer LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o.o_custkey
    """,
    doc="Left outer join + null-fill (ref J5/J6 left merges + upsert, "
    "_frame.py:126-133,45-52). Aggregate-before-join shrinks the build side — "
    "same rewrite the reference does by querying only needed way ids.",
)
def rel_left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    per_cust = T(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey", F.coalesce(col("cnt"), lit(0)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# Windows (W-family) / sorts / limits / set ops (O-family)
# ---------------------------------------------------------------------------


@register(
    "rel_window_lag_delta",
    oracle="""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)
    SELECT event_id, user_id,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM ev
    """,
    doc="lag/lead boundary detection (ref W1, _frame.py:254-256,279-281). Unique "
    "(ts,event_id) tiebreak makes the frame total-ordered → deterministic.",
)
def rel_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return T(spark, sf_dir, "events").select(
        "event_id", "user_id", (col("value") - F.lag("value").over(w)).alias("delta")
    )


@register(
    "rel_window_running_sum",
    oracle="""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM ev
    """,
    doc="Running sum / segment numbering (ref W2 cumsum, _geometry.py:109-117, "
    "_frame.py:290). Exact-decimal window sum: engines disagree on float "
    "accumulation trees (DuckDB uses segment trees), decimals are order-free.",
)
def rel_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(dec("value", 18, 6)).over(w).cast("double").alias("running_value"),
    )


@register(
    "rel_window_dup_mask",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           (COUNT(*) OVER (PARTITION BY l_partkey) > 1) AS is_shared
    FROM lineitem
    """,
    doc="Duplicated-mask (ref W3, _frame.py:277 — topology split points). "
    "count-over-partition instead of a two-pass duplicated() scan.",
)
def rel_window_dup_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("l_partkey")
    return T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", (F.count("*").over(w) > 1).alias("is_shared")
    )


@register(
    "rel_first_last_per_group",
    oracle="""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)
    SELECT DISTINCT user_id,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value)  OVER w AS last_val
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Per-group first/last (ref A1 end_values, _frame.py:298-303 — way "
    "endpoints). Full-frame window + distinct; with array-typed refs this is just "
    "element_at(refs, ±1) with no shuffle at all.",
)
def rel_first_last_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        T(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(w).alias("last_val"),
        )
        .distinct()
    )


@register(
    "rel_cumcount",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS BIGINT) AS pos
    FROM lineitem
    """,
    doc="cumcount within group (ref A3, _frame.py:246-249). With array refs this is "
    "posexplode — zero shuffle; shown here in window form.",
)
def rel_cumcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", (F.row_number().over(w) - 1).cast("long").alias("pos")
    )


@register(
    "rel_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    doc="Top-k (absent in reference — §2.11 — but required for parity-plus). "
    "orderBy+limit compiles to TakeOrderedAndProject: per-partition heaps, no "
    "global sort. Unique o_orderkey tiebreak ⇒ deterministic.",
)
def rel_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc(), col("o_orderkey"))
        .limit(25)
    )


@register(
    "rel_union_branches",
    oracle="""
    SELECT o_orderkey, 'high_value' AS src FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="Union of filtered branches (ref O3 concat, _frame.py:96,171,231). "
    "unionByName keeps it schema-safe; no shuffle — branch scans stay pipelined.",
)
def rel_union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    high = orders.filter(col("o_totalprice") > 400000).select("o_orderkey", lit("high_value").alias("src"))
    urgent = orders.filter(col("o_orderpriority") == "1-URGENT").select("o_orderkey", lit("urgent").alias("src"))
    return high.unionByName(urgent)


@register(
    "rel_daily_counts",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Date-bucketed aggregation (absent in reference — timestamps pass through "
    "raw, primitives.py:150-171; required for the events table). Day truncation "
    "is a pure projection → partial agg still map-side.",
)
def rel_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"), col("event_type"))
        .agg(F.count("*").alias("n"), F.sum(dec("value", 18, 6)).cast("double").alias("total_value"))
    )


@register(
    "rel_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="JSON expansion (ref F3 expand_json, datasource.py:153-182). "
    "get_json_object stays JVM-side; full parse would use from_json with an "
    "explicit schema — never schema_of_json per-row at scale.",
)
def rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


@register(
    "rel_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.75) AS q75,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact linear-interpolated quantiles per group (beyond-reference "
    "OLAP: the reference has no percentile anywhere, SURVEY §2.11). Exact "
    "percentile sorts within the aggregation — at 100 TB swap to "
    "approx_percentile (t-digest sketch, partial-aggregated) when an "
    "epsilon-bound answer is acceptable; verified bit-identical vs "
    "quantile_cont on identical doubles.",
)
def rel_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("q25"),
            F.percentile("l_quantity", 0.5).alias("median_qty"),
            F.percentile("l_quantity", 0.75).alias("q75"),
            F.percentile("l_extendedprice", 0.9).alias("p90_price"),
        )
    )


@register(
    "rel_histogram",
    oracle="""
    SELECT CAST(LEAST(FLOOR(l_quantity / 5), 9) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM lineitem GROUP BY 1
    """,
    doc="Fixed-width histogram: clamped floor bucketing + count "
    "(beyond-reference OLAP). Integer bucket keys aggregate partial "
    "map-side; the DECIMAL sum keeps the price column order-independent "
    "across engines.",
)
def rel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy(F.least(F.floor(col("l_quantity") / 5), F.lit(9)).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("total_price"),
        )
    )


@register(
    "rel_hierarchy_rollup",
    oracle="""
    WITH ex AS (
      SELECT o_orderkey, o_totalprice,
             UNNEST(generate_series(0, 9)) AS i
      FROM orders
    ),
    a AS (
      SELECT o_orderkey // CAST(pow(10, i) AS BIGINT) AS node_id, o_totalprice
      FROM ex
    )
    SELECT node_id, COUNT(*) AS n_desc,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM a WHERE node_id > 0 GROUP BY 1
    """,
    doc="Hierarchical rollup: every order aggregates into ALL its ancestors "
    "in a decimal-digit tree (parent = id div 10) — the arbitrary-depth "
    "generalization of the reference's depth-1 relation expansion TODO "
    "(osmdata.py:192). Known-depth hierarchies expand declaratively "
    "(explode over ancestor levels, one shuffle on the ancestor key) — no "
    "driver loop; unknown-depth graphs use the iterative-join shape "
    "(functions/dedup.py:connected_components).",
)
def rel_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    anc = o.select(
        F.explode(
            F.expr("transform(sequence(0, 9), i -> o_orderkey div CAST(pow(10, i) AS BIGINT))")
        ).alias("node_id"),
        col("o_totalprice"),
    ).filter(col("node_id") > 0)
    return anc.groupBy("node_id").agg(
        F.count("*").alias("n_desc"),
        F.sum(dec("o_totalprice", 18, 4)).cast("double").alias("total_price"),
    )


@register(
    "rel_cube_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (beyond-reference: the reference has no grouping "
    "sets, SURVEY §2.11): all 2^2 rollup combinations in ONE pass — Spark "
    "expands the grouping sets before the partial aggregation, so the "
    "shuffle still carries only per-group partials.",
)
def rel_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
    )


@register(
    "rel_skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Salted two-phase aggregation over a 3-value hot key: phase 1 "
    "groups by (key, salt=pmod(xxhash64(unique cols),16)) so no single "
    "reducer owns a hot key's whole partition; phase 2 merges the 16 "
    "partials per key. DECIMAL sums reassociate exactly, so the result is "
    "bit-identical to the direct groupBy (the oracle) — the pattern AQE "
    "skew handling can't apply to aggregations, written out explicitly.",
)
def rel_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "__salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber", "l_partkey"), lit(16))
    )
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.count("*").alias("pn"),
        F.sum(dec("l_extendedprice", 18, 4)).alias("psum"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").cast("double").alias("total_price"),
    )


def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB substitutes for exact distinct
    and quantiles: approx_count_distinct (HyperLogLog++, one partial-agg
    shuffle of fixed-size sketches regardless of cardinality) and
    approx_percentile (t-digest).  Exact counterparts: rel_agg_stats,
    rel_quantiles; deterministic sketch-register faces with exact oracles:
    rel_hll_registers, rel_cms_heavy_hitters, rel_bloom_filter.

    Deliberately NOT a registered query: HLL++/t-digest internals differ
    across engines, so no cross-engine value oracle can exist — its
    accuracy contract (HLL within rsd bounds, t-digest median within 1%)
    is pinned by tests/test_suite_contract.py::test_approx_sketches_accuracy
    instead of a weaker rows-only driver check (round-3 ask #5)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            F.approx_percentile("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order multi-dimensional clustering layout
# ---------------------------------------------------------------------------


def _z_interleave(a, b, bits: int = 8):
    """16-bit Morton code: bit i of ``a`` lands at 2i+1, of ``b`` at 2i —
    pure integer Column algebra, bit-identical everywhere."""
    z = lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(lit(1)), 2 * i)
        )
    return z


@register(
    "rel_zorder_layout",
    oracle="""
    WITH z AS (
      SELECT (o_custkey % 256) AS a, (o_orderkey % 256) AS b,
             (((o_custkey % 256) >> 0) & 1) * 2 + (((o_orderkey % 256) >> 0) & 1)
           + ((((o_custkey % 256) >> 1) & 1) * 2 + (((o_orderkey % 256) >> 1) & 1)) * 4
           + ((((o_custkey % 256) >> 2) & 1) * 2 + (((o_orderkey % 256) >> 2) & 1)) * 16
           + ((((o_custkey % 256) >> 3) & 1) * 2 + (((o_orderkey % 256) >> 3) & 1)) * 64
           + ((((o_custkey % 256) >> 4) & 1) * 2 + (((o_orderkey % 256) >> 4) & 1)) * 256
           + ((((o_custkey % 256) >> 5) & 1) * 2 + (((o_orderkey % 256) >> 5) & 1)) * 1024
           + ((((o_custkey % 256) >> 6) & 1) * 2 + (((o_orderkey % 256) >> 6) & 1)) * 4096
           + ((((o_custkey % 256) >> 7) & 1) * 2 + (((o_orderkey % 256) >> 7) & 1)) * 16384
             AS zval
      FROM orders
    )
    SELECT CAST(zval >> 12 AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(a) AS BIGINT) AS a_min, CAST(max(a) AS BIGINT) AS a_max,
           CAST(min(b) AS BIGINT) AS b_min, CAST(max(b) AS BIGINT) AS b_max
    FROM z GROUP BY 1
    """,
    doc="Z-order (Morton) clustering layout — the Delta/Iceberg OPTIMIZE "
    "ZORDER primitive as pure Column algebra: interleave the bits of two "
    "key columns, range-bucket by the code, and report per-bucket min/max "
    "of BOTH dimensions. The payoff is in the output itself: every "
    "z-bucket bounds a AND b to a 64-wide range simultaneously, which is "
    "why file-level min/max stats over z-sorted data can skip on either "
    "predicate. At scale: repartitionByRange(zval) before the write, "
    "stats come free from parquet footers.",
)
def rel_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    a = (col("o_custkey") % 256).cast("long")
    b = (col("o_orderkey") % 256).cast("long")
    z = o.select(a.alias("a"), b.alias("b"), _z_interleave(a, b).alias("zval"))
    return z.groupBy(F.shiftright("zval", 12).cast("long").alias("zbucket")).agg(
        F.count("*").alias("n"),
        F.min("a").cast("long").alias("a_min"),
        F.max("a").cast("long").alias("a_max"),
        F.min("b").cast("long").alias("b_min"),
        F.max("b").cast("long").alias("b_max"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (oracled sketch — HLL/t-digest are rows-only)
# ---------------------------------------------------------------------------


@register(
    "rel_cms_heavy_hitters",
    oracle="""
    WITH buck AS (
      SELECT o_custkey,
             CAST(r.s AS INT) AS seed,
             CAST(('0x' || substr(md5(CAST(r.s AS VARCHAR) || '-' || CAST(o_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % 64 AS bucket
      FROM orders, (SELECT UNNEST([0, 1, 2, 3]) AS s) r
    ),
    cms AS (
      SELECT seed, bucket, CAST(count(*) AS BIGINT) AS c
      FROM buck GROUP BY 1, 2
    ),
    exact AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS exact_n
      FROM orders GROUP BY 1
      ORDER BY exact_n DESC, o_custkey LIMIT 10
    )
    SELECT e.o_custkey, e.exact_n,
           min(c.c) AS cms_est,
           min(c.c) >= e.exact_n AS never_undercounts
    FROM exact e
    JOIN buck b ON b.o_custkey = e.o_custkey
    JOIN cms c ON c.seed = b.seed AND c.bucket = b.bucket
    GROUP BY e.o_custkey, e.exact_n
    """,
    doc="Count-min sketch heavy hitters with the one-sided error bound IN "
    "the result: 4 md5-hash rows × 64 buckets aggregate to a 256-cell "
    "sketch (one partial-agg exchange, constant memory at any cardinality); "
    "the top-10 exact keys then read their estimate = min over rows, and "
    "the never_undercounts column certifies CMS's ε-δ guarantee on every "
    "row. The oracled counterpart to the rows-only HLL++/t-digest entry — "
    "deterministic hash family, so both engines build the identical sketch.",
)
def rel_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_custkey")
    seeds = F.array(*[lit(s) for s in range(4)])
    buck = o.select(
        "o_custkey", F.explode(seeds).alias("seed")
    ).withColumn("bucket", _cms_bucket_col())
    cms = buck.groupBy("seed", "bucket").agg(F.count("*").alias("c"))
    exact = (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(col("exact_n").desc(), "o_custkey")
        .limit(10)
    )
    est = (
        exact.join(buck, "o_custkey")
        .join(cms, ["seed", "bucket"])
        .groupBy("o_custkey", "exact_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "o_custkey",
        "exact_n",
        "cms_est",
        (col("cms_est") >= col("exact_n")).alias("never_undercounts"),
    )


def _cms_bucket_col():
    h = F.md5(F.concat(col("seed").cast("string"), lit("-"), col("o_custkey").cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 64).cast("long")


# ---------------------------------------------------------------------------
# Data-contract audit (dbt-style tests as one report)
# ---------------------------------------------------------------------------


@register(
    "rel_data_contract_audit",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST((SELECT coalesce(sum(c - 1), 0) FROM
                 (SELECT count(*) AS c FROM orders GROUP BY o_orderkey) WHERE c > 1) AS BIGINT)
             AS n_violations,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_checked
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'orderstatus_not_null',
           CAST((SELECT count(*) FROM orders WHERE o_orderstatus IS NULL) AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'quantity_positive',
           CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    """,
    doc="Data-contract audit (the dbt-test suite as ONE distributed "
    "report): primary-key uniqueness, two referential-integrity checks, "
    "not-null and range constraints — each row is (check, violations, "
    "population). The gate a 100 TB ingest runs BEFORE publishing a "
    "partition.  Shape: ONE aggregate pass per fact table — each table "
    "left-joins its FK target's DISTINCT key set (dedup first, or a "
    "duplicate target key — the very violation an audit catches — fans "
    "out fact rows and corrupts every count; UNHINTED: both sides are "
    "fact-sized at scale, so broadcast is Catalyst's call) and folds "
    "every check into "
    "a single multi-aggregate row: pk-duplicate count as n - "
    "count_distinct(pk), orphans as null-FK matches, null/range checks "
    "as conditional sums.  The report rows are literal projections of "
    "the two 1-row stats — no per-check re-scan (was 12 scans / 11 "
    "exchanges; now 4 scans).",
)
def rel_data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    cust = T(spark, sf_dir, "customer")

    # FK targets join as DISTINCT key sets: a duplicate c_custkey /
    # o_orderkey (exactly the violation class this audit exists to catch)
    # would otherwise fan out the fact rows and corrupt n_checked, the
    # pk-uniqueness count, and the orphan counts (round-5 defect).  The
    # distinct's exchange is the price of EXISTS semantics.
    o = orders.join(
        cust.select(col("c_custkey").alias("_ck")).distinct(),
        orders["o_custkey"] == col("_ck"),
        "left",
    )
    o_stats = o.agg(
        F.count("*").alias("n"),
        F.count_distinct(col("o_orderkey")).alias("d"),
        F.sum(col("_ck").isNull().cast("long")).alias("orphans"),
        F.sum(col("o_orderstatus").isNull().cast("long")).alias("nulls"),
    )
    l = li.join(
        orders.select(col("o_orderkey").alias("_ok")).distinct(),
        li["l_orderkey"] == col("_ok"),
        "left",
    )
    l_stats = l.agg(
        F.count("*").alias("n"),
        F.sum(col("_ok").isNull().cast("long")).alias("orphans"),
        F.sum((col("l_quantity") <= 0).cast("long")).alias("bad_qty"),
    )
    # each 1-row stats table feeds several report rows — checkpoint at the
    # fork (the triangle-count discipline) or every union branch re-runs
    # the whole scan+join+aggregate chain
    o_stats = o_stats.localCheckpoint()
    l_stats = l_stats.localCheckpoint()

    def row(stats, name, viol):
        return stats.select(
            lit(name).alias("check_name"),
            viol.cast("bigint").alias("n_violations"),
            col("n").cast("bigint").alias("n_checked"),
        )

    return (
        row(o_stats, "orders_pk_unique", col("n") - col("d"))
        .unionByName(row(l_stats, "lineitem_fk_orders", col("orphans")))
        .unionByName(row(o_stats, "orders_fk_customer", col("orphans")))
        .unionByName(row(o_stats, "orderstatus_not_null", col("nulls")))
        .unionByName(row(l_stats, "quantity_positive", col("bad_qty")))
    )


@register(
    "rel_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS (completing the rollup/cube trio, SURVEY "
    "§2.11 beyond-reference): a hand-picked lattice subset — (flag,status), "
    "(flag), () — in ONE pass with grouping_id disambiguating NULL-as-data "
    "from NULL-as-total. Spark expands the sets BEFORE partial aggregation, "
    "so the single shuffle carries per-group partials only; at 100 TB this "
    "is 3 rollup reports for the price of one scan.",
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dsum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


@register(
    "rel_window_range_frame",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tn
      FROM events
    )
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / (COUNT(*) OVER w) AS avg_hour
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY tn
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-RANGE window frame (vs the suite's ROWS frames): per-user "
    "trailing-hour moving average — the frame is bounded by the ORDER-key "
    "VALUE (microsecond epoch; tz-free on both engines, constant offsets "
    "cancel inside range differences), not row offsets, so same-timestamp peers "
    "enter together on any engine. One exchange on user_id; the decimal "
    "window sum is order-free, and sum/count division happens on "
    "bit-identical operands. The canonical sliding-metric shape for "
    "event telemetry at scale.",
)
def rel_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tz-free micros key: NTZ-to-NTZ timestampdiff never consults the
    # session timezone (a cast to TIMESTAMP would), so frame membership is
    # identical under any driver session configuration
    tn = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2000-01-01 00:00:00', ts)")
    w = Window.partitionBy("user_id").orderBy(tn).rangeBetween(-3_600_000_000, 0)
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_hour"),
        (F.sum(dec("value", 18, 6)).over(w).cast("double") / F.count("*").over(w)).alias(
            "avg_hour"
        ),
    )


@register(
    "rel_corr_stats",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
             -- width 19 forces INT128 physical in DuckDB (a width-18
             -- product overflows INT64); Spark side stays (18,4) where
             -- the 37-digit product fits losslessly — both are exact
             SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy,
             SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
             AS pearson_r
    FROM m
    """,
    doc="Per-group Pearson correlation (quantity vs price) — the data-"
    "profiling statistic a warehouse quality pass computes per segment. "
    "All five moments accumulate as EXACT decimal sums in ONE partial-"
    "aggregated shuffle (order-free, bit-identical cross-engine); the "
    "closed-form r assembles driver-free from the moments with a "
    "mirrored double expression tree + round-9 guard. The single-pass "
    "moment-sketch shape is exactly how you'd profile 100 TB: no second "
    "centering pass, no window.",
)
def rel_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    x = dec("l_quantity", 18, 4)
    y = dec("l_extendedprice", 18, 4)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = col("n")
    sx, sy = col("sx").cast("double"), col("sy").cast("double")
    sxx, syy, sxy = (col(c).cast("double") for c in ("sxx", "syy", "sxy"))
    r = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return m.select("l_returnflag", "n", F.round(r, 9).alias("pearson_r"))


@register(
    "rel_partial_agg_merge",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Incremental materialized-view maintenance: two epoch partitions "
    "(shipdate <= / > the split) pre-aggregate INDEPENDENTLY to partial "
    "states (decimal sum + count), and the merge is just re-aggregation "
    "of the tiny partial tables — the oracle is the direct one-shot "
    "aggregation, proving the state is exactly reaggregable (DECIMAL "
    "sums reassociate; counts add). This is the lambda-architecture "
    "contract: at 100 TB you never re-scan history to refresh a rollup, "
    "you merge yesterday's state with today's partials.",
)
def rel_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    split = lit("2000-06-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(dec("l_quantity")).alias("psum"), F.count("*").alias("pn")
        )

    epoch1 = partial(li.filter(col("l_shipdate") <= split))
    epoch2 = partial(li.filter(col("l_shipdate") > split))
    return (
        epoch1.unionByName(epoch2)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("psum").cast("double").alias("sum_qty"),
            F.sum("pn").alias("n"),
        )
    )


@register(
    "rel_compaction_plan",
    oracle="""
    WITH files AS (
      SELECT o_orderkey AS file_id,
             -- x10000 makes the 4-dp price integral: the BIGINT cast is
             -- exact on both engines (no round-vs-truncate ambiguity)
             CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS size_bytes
      FROM orders
    ),
    binned AS (
      SELECT file_id, size_bytes,
             CAST(COALESCE(SUM(size_bytes) OVER (ORDER BY file_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  // 10000000000 AS BIGINT) AS bin
      FROM files
    )
    SELECT bin,
           COUNT(*) AS n_files,
           -- DuckDB's SUM(BIGINT) is HUGEINT: uncast it survives the
           -- row-count/schema checks but breaks the driver's value hash
           -- (round-2's one red row) — cast back to BIGINT explicitly
           CAST(SUM(size_bytes) AS BIGINT) AS bin_bytes
    FROM binned GROUP BY bin
    """,
    doc="Small-file compaction planner (the lakehouse maintenance job "
    "next to rel_zorder_layout): files bin-pack greedily by prefix-sum of "
    "size over a total order — bin = floor(bytes-before / target) — then "
    "a per-bin manifest rolls up. The prefix sum is one global-ordered "
    "window (RangePartitioning exchange: fine — the input is file "
    "METADATA, ~1 row per file, millions of rows for a 100 TB table, not "
    "the data itself); every bin lands within one file size of the "
    "configured target.",
)
def rel_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = T(spark, sf_dir, "orders").select(
        col("o_orderkey").alias("file_id"),
        (dec("o_totalprice", 18, 4) * 10000).cast("bigint").alias("size_bytes"),
    )
    w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, -1)
    # integer DIV, not floor(float /): keeps the whole query float-free
    binned = files.withColumn(
        "prefix_bytes", F.coalesce(F.sum("size_bytes").over(w), lit(0).cast("bigint"))
    ).withColumn(
        "bin", F.expr("prefix_bytes DIV 10000000000").cast("bigint")
    ).drop("prefix_bytes")
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_files"), F.sum("size_bytes").alias("bin_bytes")
    )


@register(
    "rel_unpivot",
    oracle="""
    WITH sel AS (
      SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount, l_tax
      FROM lineitem WHERE l_orderkey % 100 = 0
    )
    SELECT l_orderkey, l_partkey, 'l_quantity' AS measure, l_quantity AS value FROM sel
    UNION ALL
    SELECT l_orderkey, l_partkey, 'l_extendedprice', l_extendedprice FROM sel
    UNION ALL
    SELECT l_orderkey, l_partkey, 'l_discount', l_discount FROM sel
    UNION ALL
    SELECT l_orderkey, l_partkey, 'l_tax', l_tax FROM sel
    """,
    doc="UNPIVOT / melt (wide → long; the inverse of rel_pivot_returnflag, "
    "absent from the reference which holds wide frames only): four measure "
    "columns fold into (measure, value) rows via DataFrame.unpivot — "
    "Catalyst's Expand node, a narrow in-row expansion that pipelines "
    "inside the scan stage with ZERO shuffle at any scale.  No value "
    "arithmetic happens, so the doubles pass through bit-identical and "
    "need no decimal guard.",
)
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(col("l_orderkey") % 100 == 0)
    return li.unpivot(
        ["l_orderkey", "l_partkey"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


@register(
    "rel_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    w AS (
      SELECT user_id,
             CAST(epoch_us(nxt) - epoch_us(ts) AS BIGINT) AS dur_us,
             CAST(value AS DECIMAL(19,6)) AS v
      FROM seg WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           round(CAST(SUM(v * dur_us) AS DOUBLE) / SUM(dur_us), 6) AS twap
    FROM w GROUP BY user_id
    """,
    doc="Time-weighted average value per user (the TWAP/metering "
    "aggregation — each observation holds until the next one): lead() "
    "assigns every event its holding duration in exact integer "
    "microseconds, then duration-weighted values accumulate as exact "
    "DECIMAL x BIGINT products — order-free, bit-identical cross-engine; "
    "the single division happens once per user at the end under a "
    "round-6 guard.  ONE user_id exchange serves both the lead window "
    "and the final aggregation (sort-window then partial agg on the same "
    "key — no second shuffle).",
)
def rel_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").withColumn("ts", col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        dec("value", 19, 6).alias("v"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur_us"),
    ).filter(col("dur_us").isNotNull())
    return seg.groupBy("user_id").agg(
        F.sum("dur_us").alias("total_us"),
        F.round(
            F.sum(col("v") * col("dur_us")).cast("double") / F.sum("dur_us"), 6
        ).alias("twap"),
    )


@register(
    "rel_funnel_stages",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(ts) FILTER (event_type = 'view') AS first_view,
             MIN(ts) FILTER (event_type = 'click') AS first_click,
             MIN(ts) FILTER (event_type = 'purchase') AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id, first_view, first_click, first_purchase,
           first_view IS NOT NULL
             AND first_click IS NOT NULL AND first_click > first_view
             AND first_purchase IS NOT NULL AND first_purchase > first_click
             AS converted,
           CASE WHEN first_view IS NOT NULL
                 AND first_click IS NOT NULL AND first_click > first_view
                 AND first_purchase IS NOT NULL AND first_purchase > first_click
                THEN CAST(epoch_us(first_purchase) - epoch_us(first_view) AS BIGINT)
                ELSE NULL END AS funnel_us
    FROM stages
    """,
    doc="Funnel analysis (view → click → purchase, strictly ordered): "
    "per-user first-touch timestamps via conditional MIN — the whole "
    "funnel folds into ONE map-side-combined exchange, no joins between "
    "stages and no window (the classic product-analytics query, "
    "expressed the way it survives a 10^11-event store).  Conversion "
    "demands strict stage ordering; latency in exact integer "
    "microseconds.",
)
def rel_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").withColumn("ts", col("ts").cast("timestamp"))
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(col("event_type") == "view", col("ts"))).alias("first_view"),
        F.min(F.when(col("event_type") == "click", col("ts"))).alias("first_click"),
        F.min(F.when(col("event_type") == "purchase", col("ts"))).alias("first_purchase"),
    )
    ordered = (
        col("first_view").isNotNull()
        & col("first_click").isNotNull()
        & (col("first_click") > col("first_view"))
        & col("first_purchase").isNotNull()
        & (col("first_purchase") > col("first_click"))
    )
    return stages.select(
        "user_id",
        "first_view",
        "first_click",
        "first_purchase",
        ordered.alias("converted"),
        F.when(
            ordered, F.unix_micros("first_purchase") - F.unix_micros("first_view")
        ).alias("funnel_us"),
    )


@register(
    "rel_retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS w FROM events
    ),
    firsts AS (SELECT user_id, MIN(w) AS w0 FROM wk GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.w0, e.w - f.w0 AS week_k
      FROM wk e JOIN firsts f USING (user_id)
    )
    SELECT make_timestamp(w0 * 604800000000) AS cohort,
           CAST(week_k AS BIGINT) AS week_k,
           COUNT(*) AS active_users
    FROM activity GROUP BY 1, 2
    """,
    doc="Cohort retention matrix (the product-analytics staple): users "
    "cohorted by the week of their FIRST event, then counted once per "
    "(cohort, weeks-since-cohort) they were active in.  Shape: the "
    "first-touch election is one partial-agg exchange; the week-index "
    "table re-joins itself ON user_id (co-partitioned with the election "
    "— the sort/partitioning reuses, or broadcasts when the user "
    "dimension is small); dedup + count folds into one more partial-agg "
    "pass.  Week indexing is exact integer epoch-floor arithmetic "
    "(epoch-anchored, NOT an engine's time_bucket — whose origin "
    "conventions differ), so no date-library drift between engines.",
)
def rel_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    WEEK_US = 604_800_000_000
    ev = T(spark, sf_dir, "events").withColumn("ts", col("ts").cast("timestamp"))
    wk = ev.select("user_id", (F.unix_micros("ts") / WEEK_US).cast("long").alias("w"))
    firsts = wk.groupBy("user_id").agg(F.min("w").alias("w0"))
    activity = wk.join(firsts, "user_id").select(
        "user_id", "w0", (col("w") - col("w0")).alias("week_k")
    ).distinct()
    return activity.groupBy("w0", "week_k").agg(F.count("*").alias("active_users")).select(
        F.timestamp_micros(col("w0") * WEEK_US).alias("cohort"),
        col("week_k"),
        "active_users",
    )


@register(
    "rel_basket_pairs",
    oracle="""
    WITH baskets AS (
      SELECT l_orderkey, list_distinct(list(l_partkey)) AS parts FROM lineitem
      GROUP BY l_orderkey
    ),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b
      FROM baskets, UNNEST(parts) AS a(p), UNNEST(parts) AS b(p)
      WHERE a.p < b.p
    )
    SELECT part_a, part_b, COUNT(*) AS support
    FROM pairs GROUP BY part_a, part_b HAVING COUNT(*) >= 2
    """,
    doc="Market-basket pair mining (association-rule support counts): "
    "distinct parts per order collect IN-ROW, pairs expand inside the "
    "row (a < b upper triangle — bounded by basket size squared, ~7 "
    "lines per TPC-H order), then ONE partial-agg exchange counts "
    "support.  No self-join of the fact table against itself — the "
    "naive formulation shuffles the lineitem twice and explodes on hot "
    "orders; this shape is linear in baskets + output pairs.",
)
def rel_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_distinct(F.collect_list("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    col("parts"),
                    lambda a: F.filter(
                        F.transform(col("parts"), lambda b: F.struct(a.alias("part_a"), b.alias("part_b"))),
                        lambda s: s["part_a"] < s["part_b"],
                    ),
                )
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .filter(col("support") >= 2)
    )


@register(
    "rel_ratio_to_report",
    oracle="""
    WITH rev AS (
      SELECT n_regionkey AS region, c_nationkey AS nation,
             SUM(CAST(o_totalprice AS DECIMAL(19,4))) AS nation_rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(nation_rev AS DOUBLE) AS nation_rev,
           round(CAST(nation_rev AS DOUBLE)
                 / CAST(SUM(nation_rev) OVER (PARTITION BY region) AS DOUBLE), 6)
             AS region_share
    FROM rev
    """,
    doc="Ratio-to-report (share-of-parent window): each nation's revenue "
    "as a fraction of its region's total.  The fact stream aggregates "
    "FIRST (exact decimal, one partial-agg exchange; nation broadcasts — "
    "fixed 25 rows — while the customer join is unhinted, since customer "
    "scales with sf and a forced hint is a driver OOM at 100×); the "
    "window then runs over the 25-row nation "
    "rollup — the share never touches fact-table cardinality, which is "
    "what makes percent-of-total safe at 100 TB.  Division is one "
    "exactly-rounded double op per row; round-6 for display symmetry.",
)
def rel_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nt = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    rev = (
        o.join(c, col("o_custkey") == col("c_custkey"))
        .join(broadcast(nt), col("c_nationkey") == col("n_nationkey"))
        .groupBy(col("n_regionkey").alias("region"), col("c_nationkey").alias("nation"))
        .agg(F.sum(dec("o_totalprice", 19, 4)).alias("nation_rev"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        col("nation_rev").cast("double").alias("nation_rev"),
        F.round(
            col("nation_rev").cast("double") / F.sum("nation_rev").over(w).cast("double"), 6
        ).alias("region_share"),
    )


@register(
    "rel_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      FROM events
    ),
    marked AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
      FROM days
    )
    SELECT user_id,
           CAST(MIN(day) AS BIGINT) AS start_day,
           CAST(MAX(day) AS BIGINT) AS end_day,
           COUNT(*) AS n_days
    FROM marked GROUP BY user_id, island
    """,
    doc="Gaps-and-islands: maximal runs of CONSECUTIVE active days per "
    "user via the day - row_number() island-key trick — the classic "
    "sequence-integrity / activity-streak query.  Day indexing is exact "
    "integer epoch-floor division; ONE user_id exchange serves the "
    "distinct-day dedup, the island window, and the island rollup "
    "(same key end to end, the sessionize-events discipline).",
)
def rel_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    DAY_US = 86_400_000_000
    ev = T(spark, sf_dir, "events").withColumn("ts", col("ts").cast("timestamp"))
    days = ev.select(
        "user_id", (F.unix_micros("ts") / DAY_US).cast("long").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    marked = days.withColumn("island", col("day") - F.row_number().over(w))
    return marked.groupBy("user_id", "island").agg(
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
        F.count("*").alias("n_days"),
    ).drop("island")


@register(
    "rel_ewma_per_user",
    oracle="""
    WITH ordered AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(xs) AS BIGINT) AS n_events,
           CAST(list_reduce(xs, (acc, x) -> 0.125 * x + 0.875 * acc) AS DOUBLE) AS ewma
    FROM ordered
    """,
    doc="Exponentially-weighted moving average per user (the online "
    "smoothing every monitoring/finance pipeline keeps): an inherently "
    "SEQUENTIAL recurrence s_t = a*x_t + (1-a)*s_{t-1}, folded IN-ROW "
    "over the per-user event array (collect + total-order sort + "
    "aggregate fold — one exchange, no per-step window).  alpha = 0.125 "
    "is binary-exact, so every fold step is exactly-rounded IEEE "
    "arithmetic in an identical order — bit-identical cross-engine with "
    "NO rounding guard.  Per-user arrays bound memory (a user's history, "
    "not the corpus); unbounded keys would stream through the Welford-"
    "style stateful twin instead.",
)
def rel_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").withColumn("ts", col("ts").cast("timestamp"))
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    grouped = ev.groupBy("user_id").agg(xs.alias("xs"))
    ewma = F.aggregate(
        F.slice(col("xs"), 2, F.greatest(F.size("xs") - 1, lit(0))),
        F.element_at(col("xs"), 1),
        lambda acc, x: lit(0.125) * x + lit(0.875) * acc,
    )
    return grouped.select(
        "user_id",
        F.size("xs").cast("long").alias("n_events"),
        ewma.cast("double").alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering layout (next to rel_zorder_layout)
# ---------------------------------------------------------------------------


def _hilbert_layout_oracle() -> str:
    from osmdatapy_spark.operators.measures import hilbert_oracle_ctes

    # the raw keys ride the CTE chain via carry (the fold's x/y rotate)
    ctes = hilbert_oracle_ctes("a", "b", order=8, carry=("a", "b"))
    return f"""
    WITH h_src AS (
      SELECT (o_custkey % 256) AS a, (o_orderkey % 256) AS b FROM orders
    ),
    {ctes}
    SELECT CAST(d >> 12 AS BIGINT) AS hbucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(a) AS BIGINT) AS a_min, CAST(max(a) AS BIGINT) AS a_max,
           CAST(min(b) AS BIGINT) AS b_min, CAST(max(b) AS BIGINT) AS b_max
    FROM h8 GROUP BY 1
    """


@register(
    "rel_hilbert_layout",
    oracle=_hilbert_layout_oracle(),
    doc="Hilbert-curve clustering layout — the locality-preserving "
    "upgrade to rel_zorder_layout (Iceberg/Delta OPTIMIZE ... hilbert): "
    "consecutive curve positions are ALWAYS grid neighbors (no z-curve "
    "jumps), so range-bucketing by the Hilbert distance yields tighter "
    "per-bucket (a, b) min/max envelopes than Morton interleave — "
    "directly better file-skipping.  The per-level rotate/reflect fold "
    "unrolls into a fixed integer expression tree: pure Column algebra, "
    "one partial-aggregated exchange on the bucket key.  The oracle "
    "replays the identical fold via generated CTEs (same source, "
    "operators/measures.hilbert_oracle_ctes — kernel and oracle cannot "
    "drift).",
)
def rel_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmdatapy_spark.operators.measures import hilbert_index

    o = T(spark, sf_dir, "orders")
    a = (col("o_custkey") % 256).cast("long")
    b = (col("o_orderkey") % 256).cast("long")
    z = o.select(a.alias("a"), b.alias("b"), hilbert_index(a, b, order=8).alias("d"))
    return z.groupBy(F.shiftright("d", 12).cast("long").alias("hbucket")).agg(
        F.count("*").alias("n"),
        F.min("a").cast("long").alias("a_min"),
        F.max("a").cast("long").alias("a_max"),
        F.min("b").cast("long").alias("b_min"),
        F.max("b").cast("long").alias("b_max"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (privacy screen over quasi-identifiers)
# ---------------------------------------------------------------------------


@register(
    "rel_k_anonymity",
    oracle="""
    WITH q AS (
      -- floor(x/1000) explicitly: DuckDB's // floors but Spark's div
      -- truncates toward zero — they disagree on negative balances;
      -- an exactly-rounded double division + floor agrees everywhere
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS grp
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(5 AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(COUNT(*) FILTER (grp < 5) AS BIGINT) AS n_violating_classes,
           CAST(COALESCE(SUM(grp) FILTER (grp < 5), 0) AS BIGINT) AS n_exposed_rows,
           CAST(MIN(grp) AS BIGINT) AS min_class_size
    FROM q
    """,
    doc="k-anonymity audit over quasi-identifier columns (nation x "
    "account-balance band): the privacy screen a dataset release or "
    "training-data pipeline runs to find equivalence classes smaller "
    "than k — each one a re-identification risk that suppression/"
    "coarsening must fix before release.  The banding division is exact "
    "DECIMAL integer-div (no float band edges); two stacked partial-"
    "aggregated exchanges (quasi-identifier classes, then a 1-row "
    "report) — at 100 TB only class counts move.  FILTER aggregates "
    "keep it one pass; a NULL n_exposed_rows would mean zero violations "
    "(sum over empty set) — COALESCEd to 0 for a NULL-free report.",
)
def rel_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    q = c.groupBy(
        "c_nationkey",
        F.floor(col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(F.count("*").alias("grp"))
    small = col("grp") < 5
    return q.agg(
        lit(5).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_classes"),
        F.count(F.when(small, True)).cast("long").alias("n_violating_classes"),
        F.coalesce(F.sum(F.when(small, col("grp"))), lit(0))
        .cast("long")
        .alias("n_exposed_rows"),
        F.min("grp").cast("long").alias("min_class_size"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog register table — an EXACTLY-verified sketch build
# ---------------------------------------------------------------------------


@register(
    "rel_hll_registers",
    oracle="""
    WITH h AS (
      -- portable 60-bit hash: first 15 md5 hex digits (same recipe as
      -- hash_bucket/minhash — both engines compute the identical value)
      SELECT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM orders
    ),
    parts AS (
      SELECT hv % 256 AS bucket, hv // 256 AS w FROM h
    ),
    rho AS (
      -- rank of the first set bit of the 52-bit remainder, via string
      -- algebra (exact in both engines; no float log2): w = 0 -> 53
      SELECT bucket,
             CASE WHEN w = 0 THEN 53
                  ELSE strpos(lpad(bin(w), 52, '0'), '1') END AS r
      FROM parts
    ),
    regs AS (
      SELECT CAST(bucket AS BIGINT) AS bucket, CAST(MAX(r) AS BIGINT) AS register
      FROM rho GROUP BY bucket
    )
    SELECT bucket, register,
           round(0.7213 / (1.0 + 1.079 / 256) * 256 * 256
                 / SUM(power(2.0, -register)) OVER (), 4) AS raw_estimate
    FROM regs
    """,
    doc="HyperLogLog register table built EXACTLY (Flajolet et al. 2007) "
    "— the mergeable distinct-count sketch with its construction under "
    "the full value-hash gate, unlike the rows-only approx_count_distinct "
    "family: the 60-bit hash is the portable md5 recipe both engines "
    "share, bucket = h mod 256, and the first-set-bit rank computes by "
    "string algebra on bin(w) (exact — no float log2).  Registers are a "
    "MAX aggregate: associative+commutative, so the sketch "
    "partial-aggregates map-side and MERGES across epochs/partitions by "
    "construction — the lambda-architecture property that makes HLL "
    "ubiquitous.  The raw harmonic estimate rides along under a round-4 "
    "guard (power(2,-r) sums over 256 rows).  ONE register-table "
    "exchange; at 100 TB only 256-row partials move.",
)
def rel_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    hv = F.conv(F.substring(F.md5(col("o_custkey").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    parts = o.select((hv % 256).alias("bucket"), hv.alias("hv")).select(
        "bucket", F.expr("hv div 256").alias("w")
    )
    r = F.when(col("w") == 0, lit(53)).otherwise(
        F.instr(F.lpad(F.bin(col("w")), 52, "0"), "1")
    )
    regs = (
        parts.select("bucket", r.alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").cast("long").alias("register"))
        .select(col("bucket").cast("long").alias("bucket"), "register")
    )
    est = 0.7213 / (1.0 + 1.079 / 256) * 256 * 256 / F.sum(
        F.pow(2.0, -col("register"))
    ).over(Window.partitionBy())
    return regs.select("bucket", "register", F.round(est, 4).alias("raw_estimate"))


# ---------------------------------------------------------------------------
# Bloom filter build — the second exactly-verified sketch (join pruning)
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1024  # 32 words x 32 bits
_BLOOM_K = 3


def _bloom_positions_sql(key_sql: str) -> list[str]:
    """k portable hash positions from non-overlapping md5 hex slices —
    the same shared-recipe family as hash_bucket/minhash/HLL."""
    return [
        f"CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), {1 + 8 * i}, 8)) AS BIGINT)"
        f" % {_BLOOM_BITS}"
        for i in range(_BLOOM_K)
    ]


@register(
    "rel_bloom_filter",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_custkey AS k FROM orders),
    pos AS (
      {" UNION ALL ".join(f"SELECT {p} AS p FROM keys" for p in _bloom_positions_sql("k"))}
    ),
    bits AS (SELECT DISTINCT p // 32 AS word, p % 32 AS bit FROM pos)
    SELECT CAST(word AS BIGINT) AS word,
           CAST(SUM(CAST(1 AS BIGINT) << bit) AS BIGINT) AS bits
    FROM bits GROUP BY word
    """,
    doc="Bloom-filter build with the construction EXACTLY verified (the "
    "second oracled sketch next to rel_hll_registers): k=3 portable "
    "md5-slice hashes set bits in a 1024-bit filter stored as 32x32-bit "
    "words (32-bit words deliberately — a 1<<63 shift overflows signed "
    "arithmetic in DuckDB and flips the sign bit in Spark).  The word "
    "table is an OR-fold (distinct bits then exact sum of disjoint "
    "powers): associative, map-side combined, mergeable across "
    "partitions/epochs like every linear sketch.  This is the structure "
    "behind Bloom-join pruning (Spark's runtime row-group skipping): "
    "build on the dim side's join keys, ship 128 bytes, drop fact rows "
    "early.  FPR accuracy is pinned by its own pytest, not the oracle.",
)
def rel_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    keys = o.select(col("o_custkey").alias("k")).distinct()
    # all k positions in ONE pass (explode of an array): a k-branch union
    # would re-derive the distinct-keys lineage k times — k extra scans
    # and exchanges for the same rows
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.conv(
                        F.substring(F.md5(col("k").cast("string")), 1 + 8 * i, 8),
                        16,
                        10,
                    ).cast("long")
                    % _BLOOM_BITS
                    for i in range(_BLOOM_K)
                ]
            )
        ).alias("p")
    )
    bits = pos.select(
        F.expr("p div 32").alias("word"), (col("p") % 32).alias("bit")
    ).distinct()
    # pyspark's F.shiftleft only takes a literal shift — SQL expr allows
    # the column-valued bit position
    return bits.groupBy(col("word").cast("long").alias("word")).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
        .cast("long")
        .alias("bits")
    )
