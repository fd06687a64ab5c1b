"""Structured-Streaming-compatible window aggregations over the events
table (beyond-reference scope; the reference is strictly batch, SURVEY §2.9).

``tumbling_counts`` is written against a generic DataFrame so the SAME
function serves batch (driver correctness oracle) and streaming
(``readStream`` + watermark) — the Spark unifying idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from osmdatapy_spark.suite._util import dec


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window count + exact-decimal sum per event_type.

    In streaming mode add ``.withWatermark('ts', '1 hour')`` upstream; the
    aggregation state then expires with the watermark — bounded state at
    100 TB/day event rates."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value", 18, 6)).cast("double").alias("total_value"),
        )
        .select(col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def enriched_nation_counts(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static enrichment: each event joins the static customer
    dimension (broadcast — the stream side never shuffles for the join),
    then aggregates per nation and hour.

    In streaming mode the static side is re-read per micro-batch by Spark;
    at scale pin it with a broadcast hint exactly as here.  State is the
    windowed aggregate only — the join itself is stateless."""
    dim = customer.select(col("c_custkey").alias("user_id"), "c_nationkey")
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), col("c_nationkey"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value", 18, 6)).cast("double").alias("total_value"),
        )
        .select(col("w.start").alias("window_start"), "c_nationkey", "n", "total_value")
    )


def _read_event_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """readStream over the events parquet with an event-time-safe ``ts``.

    Parquet written with TIMESTAMP_NTZ (no zone) is rejected by
    ``withWatermark`` (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); watermarks need
    an instant.  Cast NTZ → TIMESTAMP (session-zone interpretation) so the
    same pipeline accepts either physical encoding."""
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", col("ts").cast("timestamp"))
    return stream


def streaming_enriched_nation_counts(
    spark: SparkSession, events_path: str, customer: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """enriched_nation_counts as an actual stream-static join."""
    stream = _read_event_stream(spark, events_path)
    return enriched_nation_counts(stream.withWatermark("ts", watermark), customer)


def streaming_tumbling_counts(
    spark: SparkSession, events_path: str, duration: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """The same aggregation as an actual stream (parquet file source,
    availableNow-style processing in tests)."""
    stream = _read_event_stream(spark, events_path)
    return tumbling_counts(stream.withWatermark("ts", watermark), duration)


def interval_join(views: DataFrame, purchases: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """View→purchase attribution: for each view, the purchases by the SAME
    user within ``horizon`` after the view — the canonical stream-stream
    interval join.

    Written against generic DataFrames so the same function serves batch
    (driver oracle) and streaming (both sides under ``readStream`` with
    watermarks — see ``streaming_interval_join``).  In streaming mode
    Spark buffers each side only ``horizon`` + watermark deep: state is
    bounded by rate × horizon, not history.

    Shape: equi-join on user_id with a time-range residual — shuffles
    both sides by user_id once; the range condition filters inside the
    join, no extra pass.  Delay is ``unix_micros`` arithmetic (exact
    BIGINT, engine-portable — no float epoch).
    """
    v = views.select(
        col("user_id"),
        col("event_id").alias("view_id"),
        col("ts").alias("v_ts"),
    )
    p = purchases.select(
        col("user_id").alias("p_user_id"),
        col("event_id").alias("purchase_id"),
        col("ts").alias("p_ts"),
    )
    joined = v.join(
        p,
        [
            col("user_id") == col("p_user_id"),
            col("p_ts") >= col("v_ts"),
            col("p_ts") <= col("v_ts") + F.expr(f"INTERVAL {horizon}"),
        ],
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("delay_us"),
    )


def streaming_interval_join(
    spark: SparkSession, events_path: str, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """interval_join as an actual watermarked stream-stream join: both
    sides are readStream over the same source, filtered to their event
    type, each with its own watermark (required — Spark must know how
    late EITHER side can be to expire join state)."""
    stream = _read_event_stream(spark, events_path)
    views = stream.filter(col("event_type") == "view").withWatermark("ts", watermark)
    purchases = stream.filter(col("event_type") == "purchase").withWatermark("ts", watermark)
    return interval_join(views, purchases, horizon)


def streaming_exact_dedup(
    spark: SparkSession,
    events_path: str,
    keys: list[str] | None = None,
    watermark: str = "45 days",
) -> DataFrame:
    """Streaming exact dedup: emit the first event seen per key, with the
    dedup state EXPIRING at the watermark — the ingest-time dedup an LLM
    data pipeline runs in front of its corpus store.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    key's event time falls behind the watermark, so state is bounded by
    (key arrival rate × watermark horizon) instead of growing with the
    whole history — the difference between a feasible and an impossible
    100 TB/day dedup.  A duplicate arriving after its key expired is
    re-emitted (the at-least-once trade); the downstream batch dedup
    (llm_exact_dedup) remains the exactness backstop.

    The batch equivalent is ``dropDuplicates(keys)`` / SELECT DISTINCT —
    the parity test runs this stream with a watermark wider than the
    fixture's 30-day span so both produce identical key sets."""
    keys = keys or ["user_id", "event_type"]
    stream = _read_event_stream(spark, events_path)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def rank_windowed_counts(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank (window_start, event_type, n) rows within each window and keep
    the top ``k`` — total order (count desc, event_type) so ties are
    deterministic across engines and reruns."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(col("n").desc(), col("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
    )


def windowed_topk(events: DataFrame, duration: str = "1 hour", k: int = 3) -> DataFrame:
    """Top-k event types per tumbling window by count — the batch face.

    Shape: ONE partial-aggregated exchange for the windowed counts; the
    per-window rank rides a second exchange keyed by window_start, whose
    cardinality is windows × types — tiny relative to the event stream at
    any scale."""
    counts = (
        events.groupBy(F.window("ts", duration).alias("w"), col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(col("w.start").alias("window_start"), "event_type", "n")
    )
    return rank_windowed_counts(counts, k)


def streaming_windowed_topk(
    spark: SparkSession,
    events_path: str,
    finalize,
    duration: str = "1 hour",
    watermark: str = "0 seconds",
    k: int = 3,
):
    """Windowed top-k as a real stream: APPEND-mode windowed counts emit
    each window EXACTLY ONCE — complete — when the watermark passes its
    end, so ranking inside ``foreachBatch`` sees every row of a window in
    the same micro-batch and is safe.  This is the production recipe for
    rank-per-window over streams, where window functions are unsupported
    on the streaming plan itself: incremental state does the counting,
    batch-side Column algebra does the finalization.

    ``finalize(topk_df, batch_id)`` receives the ranked top-k rows of the
    windows finalized in that micro-batch (idempotent per window — a
    window never re-emits).  Windows newer than the watermark horizon
    stay in state, by design: late events can still update them.

    Returns the DataStreamWriter (caller picks trigger/checkpoint)."""
    stream = _read_event_stream(spark, events_path)
    counts = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(col("w.start").alias("window_start"), "event_type", "n")
    )

    def _finalize_batch(batch_df, batch_id):
        finalize(rank_windowed_counts(batch_df, k), batch_id)

    return counts.writeStream.outputMode("append").foreachBatch(_finalize_batch)
