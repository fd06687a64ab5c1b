"""Structured Streaming face: the SAME tumbling-window aggregation function
runs as a real stream (availableNow over the events parquet, memory sink)
and must agree with its batch execution — the unified-API guarantee."""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import functions as F

from osmdatapy_spark.streaming.stateful import running_user_totals
from osmdatapy_spark.streaming.windows import streaming_tumbling_counts, tumbling_counts
from osmdatapy_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total_value"], 6))
        for r in tumbling_counts(events).collect()
    }

    # the parquet stream source can't apply the nanos-as-long conversion the
    # batch loader does, so stage a microsecond-precision copy
    staged = str(tmp_path / "events_us")
    events.write.parquet(staged)

    stream_df = streaming_tumbling_counts(spark, staged)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("t_stream_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total_value"], 6))
        for r in spark.sql("select * from t_stream_counts").collect()
    }
    assert got == batch


def test_stream_enrich_matches_batch(spark, tmp_path):
    """Stream-static join: the same enrichment function over readStream
    (availableNow) must equal its batch execution."""
    from osmdatapy_spark.streaming.windows import (
        enriched_nation_counts,
        streaming_enriched_nation_counts,
    )

    events = load_table(spark, SF_DIR, "events")
    customer = load_table(spark, SF_DIR, "customer")
    batch = {
        (r["window_start"], r["c_nationkey"]): (r["n"], round(r["total_value"], 6))
        for r in enriched_nation_counts(events, customer).collect()
    }

    staged = str(tmp_path / "events_enrich")
    events.write.parquet(staged)
    q = (
        streaming_enriched_nation_counts(spark, staged, customer)
        .writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r["window_start"], r["c_nationkey"]): (r["n"], round(r["total_value"], 6))
        for r in spark.sql("select * from t_enrich").collect()
    }
    assert got == batch


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState totals under availableNow must equal the
    batch groupBy oracle (update-mode: last emitted row per user wins)."""
    events = load_table(spark, SF_DIR, "events").select("user_id", "value", "ts")
    batch = {
        r["user_id"]: (r["n"], round(r["total"], 4))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }

    staged = str(tmp_path / "events_state")
    events.write.parquet(staged)
    stream = spark.readStream.schema(spark.read.parquet(staged).schema).parquet(staged)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql(
        "select * from (select *, row_number() over (partition by user_id order by n_events desc) rn"
        " from t_state_totals) where rn = 1"
    ).collect()
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4)) for r in rows}
    assert got == batch


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join under availableNow must
    emit exactly the batch join's pairs."""
    from osmdatapy_spark.streaming.windows import interval_join, streaming_interval_join

    events = load_table(spark, SF_DIR, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {
        (r["user_id"], r["view_id"], r["purchase_id"], r["delay_us"])
        for r in interval_join(
            events.filter(F.col("event_type") == "view"),
            events.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert batch, "fixture produced no view→purchase pairs"

    staged = str(tmp_path / "events_ij")
    events.write.parquet(staged)
    q = (
        streaming_interval_join(spark, staged)
        .writeStream.format("memory")
        .queryName("t_ij")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r["user_id"], r["view_id"], r["purchase_id"], r["delay_us"])
        for r in spark.sql("select * from t_ij").collect()
    }
    assert got == batch


def test_first_seen_dedup_matches_batch(spark, tmp_path):
    """applyInPandasWithState first-seen dedup (event-time TTL) under
    availableNow: one emission per key, matching the batch
    min-by-(ts,event_id) oracle."""
    from osmdatapy_spark.streaming.stateful import first_seen_dedup

    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    batch = {
        (r["user_id"], r["event_type"]): r["first_event_id"]
        for r in events.groupBy("user_id", "event_type")
        .agg(F.min(F.struct("ts", "event_id")).alias("m"))
        .select("user_id", "event_type", F.col("m.event_id").alias("first_event_id"))
        .collect()
    }

    staged = str(tmp_path / "events_fsd")
    events.write.parquet(staged)
    stream = (
        spark.readStream.schema(spark.read.parquet(staged).schema)
        .parquet(staged)
        .withWatermark("ts", "30 days")
    )
    q = (
        first_seen_dedup(stream)
        .writeStream.format("memory")
        .queryName("t_fsd")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("select user_id, event_type, first_event_id from t_fsd").collect()
    keys = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys)), "key emitted twice"
    assert {(r["user_id"], r["event_type"]): r["first_event_id"] for r in rows} == batch


def test_stream_dedup_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark with a watermark wider than the
    fixture's time span must emit exactly one row per key — the batch
    DISTINCT key set."""
    from osmdatapy_spark.streaming.windows import streaming_exact_dedup

    events = load_table(spark, SF_DIR, "events")
    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in events.select("user_id", "event_type").distinct().collect()
    }

    staged = str(tmp_path / "events_dedup")
    events.write.parquet(staged)
    q = (
        streaming_exact_dedup(spark, staged)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("select user_id, event_type from t_dedup").collect()
    got = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate keys emitted"
    assert set(got) == batch_keys


def test_latest_version_upsert_matches_batch(spark, tmp_path):
    """Streaming changefile upsert under availableNow must converge to the
    batch max-version election, including out-of-order versions split
    across micro-batch files."""
    from osmdatapy_spark.streaming.stateful import latest_version_upsert

    from pyspark.sql import Window

    li = load_table(spark, SF_DIR, "lineitem").limit(2000)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    changes = li.select(
        F.col("l_orderkey").alias("osmid"),
        (F.row_number().over(w) + 1).cast("long").alias("version"),
        F.when(F.col("l_returnflag") == "R", "delete").otherwise("modify").alias("op"),
        F.col("l_linestatus").alias("val"),
    )
    batch = {
        r["osmid"]: (r["m"]["version"], r["m"]["op"], r["m"]["val"])
        for r in changes.groupBy("osmid")
        .agg(F.max(F.struct("version", "op", "val")).alias("m"))
        .collect()
    }

    staged = str(tmp_path / "changes")
    # two files -> at least two micro-batch splits possible; high versions
    # deliberately land in the FIRST file so later batches must be ignored
    changes.filter(F.col("version") >= 4).coalesce(1).write.parquet(staged)
    changes.filter(F.col("version") < 4).coalesce(1).write.mode("append").parquet(staged)
    stream = (
        spark.readStream.schema(spark.read.parquet(staged).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    q = (
        latest_version_upsert(stream)
        .writeStream.format("memory")
        .queryName("t_upsert")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql(
        "select * from (select *, row_number() over (partition by osmid order by version desc) rn"
        " from t_upsert) where rn = 1"
    ).collect()
    got = {r["osmid"]: (r["version"], r["op"], r["val"]) for r in rows}
    assert got == batch


def test_windowed_topk_matches_batch(spark, tmp_path):
    """foreachBatch finalization: append-mode windowed counts emit each
    window exactly once at watermark passage, so ranking per micro-batch
    equals the batch rank for every FINALIZED window.  Windows not yet
    passed by the watermark (here: the one containing the stream's max
    event time, with a 0-second watermark) stay in state — asserted
    absent, not lost."""
    from osmdatapy_spark.streaming.windows import streaming_windowed_topk, windowed_topk

    events = load_table(spark, SF_DIR, "events")
    batch_rows = windowed_topk(events).collect()
    max_ts = events.agg(F.max("ts")).first()[0]
    finalized = {
        (r["window_start"], r["event_type"]): (r["n"], r["rank"])
        for r in batch_rows
        if r["window_start"] + timedelta(hours=1) <= max_ts
    }
    held_back = {
        (r["window_start"], r["event_type"])
        for r in batch_rows
        if r["window_start"] + timedelta(hours=1) > max_ts
    }
    assert finalized and held_back  # the fixture exercises both sides

    got: dict = {}
    emitted_batches: list[int] = []

    def collect(topk_df, batch_id):
        rows = topk_df.collect()
        if rows:
            emitted_batches.append(batch_id)
        for r in rows:
            key = (r["window_start"], r["event_type"])
            assert key not in got, f"window re-emitted: {key}"
            got[key] = (r["n"], r["rank"])

    staged = str(tmp_path / "ev_topk")
    events.write.parquet(staged)
    q = (
        streaming_windowed_topk(spark, staged, collect)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_topk"))
        .start()
    )
    q.awaitTermination(240)
    assert got == finalized
    assert not (held_back & set(got))


def test_welford_moments_match_batch(spark, tmp_path):
    """The Welford stateful fold over one availableNow pass must reproduce
    the batch DECIMAL moments (stream_user_zscore's stats) to float
    tolerance for every user — the numerically-stable-streaming vs
    exact-batch agreement that makes the anomaly thresholds consistent
    across both faces."""
    import math

    from osmdatapy_spark.streaming.stateful import running_user_moments
    from osmdatapy_spark.suite._util import dec

    events = load_table(spark, SF_DIR, "events")
    v = dec("value", 19, 6)
    batch = {
        r["user_id"]: (
            r["n"],
            float(r["sx"]) / r["n"],
            math.sqrt(r["n"] * float(r["sxx"]) - float(r["sx"]) ** 2) / r["n"],
        )
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum(v).alias("sx"), F.sum(v * v).alias("sxx"))
        .collect()
    }

    staged = str(tmp_path / "ev_moments")
    events.write.parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    q = (
        running_user_moments(stream)
        .writeStream.format("memory")
        .queryName("t_moments")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        r["user_id"]: (r["n"], r["mean"], math.sqrt(r["m2"] / r["n"]))
        for r in spark.sql("select * from t_moments").collect()
    }
    assert set(got) == set(batch)
    for uid, (n, mean, std) in batch.items():
        gn, gmean, gstd = got[uid]
        assert gn == n
        assert abs(gmean - mean) < 1e-9 * max(1.0, abs(mean))
        assert abs(gstd - std) < 1e-9 * max(1.0, std)


def test_scd2_stream_matches_batch(spark, tmp_path):
    """Streaming SCD2 (closed rows win over open predecessors on
    (osmid, version)) must reconstruct exactly the batch window-derived
    validity table."""
    from pyspark.sql import Window

    from osmdatapy_spark.streaming.stateful import scd2_intervals

    base = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("osmid"),
        F.lit(1).cast("bigint").alias("version"),
        F.col("o_orderstatus").alias("val"),
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    changes = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("osmid"),
        (F.row_number().over(w) + 1).cast("bigint").alias("version"),
        F.col("l_linestatus").alias("val"),
    )
    hist = base.unionByName(changes)
    w2 = Window.partitionBy("osmid").orderBy("version")
    batch = {
        (r["osmid"], r["version"]): (r["val"], r["valid_to"], r["is_current"])
        for r in hist.select(
            "osmid",
            "version",
            "val",
            (F.lead("version").over(w2) - 1).alias("valid_to"),
            F.lead("version").over(w2).isNull().alias("is_current"),
        ).collect()
    }

    staged = str(tmp_path / "scd2_changes")
    hist.write.parquet(staged)
    stream = spark.readStream.schema(spark.read.parquet(staged).schema).parquet(staged)
    q = (
        scd2_intervals(stream)
        .writeStream.format("memory")
        .queryName("t_scd2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got: dict = {}
    for r in spark.sql("select * from t_scd2").collect():
        k = (r["osmid"], r["version"])
        v = (r["val"], r["valid_to"], r["is_current"])
        if k not in got or not v[2]:  # closed row supersedes open
            got[k] = v
    assert got == batch


def test_cusum_stream_matches_batch(spark, tmp_path):
    """Streaming CUSUM (direct recurrence, scaled-integer state) must
    reproduce the batch prefix-min linearization (rel_cusum_drift)
    EXACTLY — integer state vs DECIMAL windows, zero tolerance."""
    from osmdatapy_spark.streaming.stateful import running_user_cusum
    from osmdatapy_spark.suite.analytics import rel_cusum_drift

    batch = {
        r["user_id"]: (r["max_cusum"], r["n_alarms"], r["first_alarm_event_id"])
        for r in rel_cusum_drift(spark, SF_DIR).collect()
    }

    events = load_table(spark, SF_DIR, "events")
    staged = str(tmp_path / "ev_cusum")
    events.write.parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    q = (
        running_user_cusum(stream)
        .writeStream.format("memory")
        .queryName("t_cusum")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        r["user_id"]: (r["max_cusum"], r["n_alarms"], r["first_alarm_event_id"])
        for r in spark.sql("select * from t_cusum").collect()
    }
    assert got == batch


def test_heavy_hitters_stream_matches_batch(spark, tmp_path):
    """Misra–Gries streaming top-k == the batch groupBy top-k when the
    per-key distinct-item count stays under the counter budget m (the
    exactness regime the operator guarantees)."""
    from osmdatapy_spark.streaming.stateful import running_heavy_hitters
    from osmdatapy_spark.suite.ext import stream_heavy_hitters

    batch = {
        (r["event_type"], r["rank"]): (r["user_id"], r["est_count"])
        for r in stream_heavy_hitters(spark, SF_DIR).collect()
    }

    from osmdatapy_spark.tables import load_table

    staged = str(tmp_path / "ev_hh")
    load_table(spark, SF_DIR, "events").write.parquet(staged)
    stream = spark.readStream.schema(
        load_table(spark, SF_DIR, "events").schema
    ).parquet(staged)
    q = (
        running_heavy_hitters(stream)
        .writeStream.format("memory")
        .queryName("t_hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], r["rank"]): (r["user_id"], r["est_count"])
        for r in spark.sql(
            "SELECT * FROM t_hh"
        ).collect()
    }
    assert got == batch, {k: (got.get(k), batch.get(k)) for k in set(got) | set(batch) if got.get(k) != batch.get(k)}


def test_transform_with_state_running_totals_matches_batch(spark, tmp_path):
    """The NEW transformWithStateInPandas API (typed ValueState on the
    RocksDB store): per-user running totals under availableNow with
    multi-file micro-batches must converge to the batch aggregate
    EXACTLY (integer micro-unit accumulation — no float drift across
    batch splits)."""
    import pytest

    # the transformWithState wire protocol needs the protobuf python
    # package (absent in this container — same env-gating as the PIL
    # pixel path); the operator itself is real and the gate is the
    # import, not the logic
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable — transformWithState wire protocol needs it")

    from osmdatapy_spark.streaming.stateful_v2 import running_totals_tws

    events = load_table(spark, SF_DIR, "events").select("user_id", "value", "event_id")
    batch = {
        r["user_id"]: (r["n"], r["micro"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 10_000).cast("long")).alias("micro"),
        )
        .collect()
    }

    staged = str(tmp_path / "ev_tws")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(staged)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(staged)
    stream = (
        spark.readStream.schema(spark.read.parquet(staged).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        try:
            q = (
                running_totals_tws(stream)
                .writeStream.format("memory")
                .queryName("t_tws")
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        except Exception as e:  # pragma: no cover - env-dependent store support
            if "RocksDB" in str(e) or "stateStore" in str(e):
                pytest.skip(f"RocksDB state store unavailable: {e}")
            raise
        rows = spark.sql("SELECT * FROM t_tws").collect()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    # update mode re-emits touched keys per micro-batch; totals are
    # MONOTONE, so the max emission per key is the converged total
    final = {}
    for r in rows:
        cur = final.get(r["user_id"], (0, 0))
        final[r["user_id"]] = max(cur, (r["n_events"], r["total_micro"]))
    assert final == batch


def test_tws_batch_face_batching_invariance(spark):
    """The batch-parity face (suite stream_user_totals_tws) executes the
    REAL stateful_v2 processor with no protobuf/RocksDB gate — and its
    result must be independent of how the per-user rows are split into
    handleInputRows calls (the exact-integer-state property the
    streaming twin relies on).  chunks=1 (one batch) and chunks=7 (many
    micro-batch-shaped calls) must agree with each other and with the
    plain aggregate."""
    from osmdatapy_spark.streaming.stateful_v2 import running_totals_tws_batch

    events = load_table(spark, SF_DIR, "events").select("user_id", "value")

    def as_map(df):
        return {r["user_id"]: (r["n_events"], r["total_micro"]) for r in df.collect()}

    one = as_map(running_totals_tws_batch(events, chunks=1))
    many = as_map(running_totals_tws_batch(events, chunks=7))
    agg = {
        r["user_id"]: (r["n"], r["micro"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 10_000).cast("long")).alias("micro"),
        )
        .collect()
    }
    assert one == many == agg and len(agg) > 0


def _osc_node(osmid, lon, lat, version):
    return {"osmid": osmid, "osmtype": 0, "tags": {}, "lon": lon, "lat": lat,
            "refs": None, "members": None, "version": version, "changeset": None}


def test_osc_stream_matches_batch(spark, tmp_path):
    """The osmxml streaming source over a diff directory must emit exactly
    the rows the batch reader sees — same schema, action column included."""
    from osmdatapy_spark.sources.xml import (
        read_osm_xml,
        read_osm_xml_stream,
        write_osm_osc,
    )

    d = tmp_path / "diffs"
    d.mkdir()
    with open(d / "000001.osc", "w") as f:
        write_osm_osc(iter([
            ("create", _osc_node(1, 1.0, 2.0, 1)),
            ("create", _osc_node(2, 3.0, 4.0, 1)),
        ]), f)
    with open(d / "000002.osc", "w") as f:
        write_osm_osc(iter([
            ("modify", _osc_node(1, 9.0, 2.0, 2)),
            ("delete", _osc_node(2, None, None, 2)),
        ]), f)

    key = lambda r: (r["osmid"], r["version"], r["action"], r["lon"])  # noqa: E731
    batch = sorted(key(r) for r in read_osm_xml(spark, str(d), osc=True).collect())

    q = (
        read_osm_xml_stream(spark, str(d))
        .writeStream.format("memory")
        .queryName("t_osc_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(key(r) for r in spark.sql("select * from t_osc_stream").collect())
    assert got == batch and len(got) == 4


def test_osc_stream_incremental_exactly_once(spark, tmp_path):
    """A file appearing AFTER the first drain is consumed exactly once on
    the next drain (offset = last file name), and the folded CDC state
    over all emitted rows equals the batch apply over the whole dir."""
    from pyspark.sql import Window

    from osmdatapy_spark.sources.xml import read_osm_xml_stream, write_osm_osc

    d = tmp_path / "diffs"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    with open(d / "000001.osc", "w") as f:
        write_osm_osc(iter([
            ("create", _osc_node(1, 1.0, 1.0, 1)),
            ("create", _osc_node(2, 2.0, 2.0, 1)),
        ]), f)

    out = str(tmp_path / "out")

    def drain():
        # parquet sink, not memory: the memory sink cannot RESUME from a
        # checkpoint, and resuming is exactly what this test pins
        q = (
            read_osm_xml_stream(spark, str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    drain()
    assert spark.read.parquet(out).count() == 2

    with open(d / "000002.osc", "w") as f:
        write_osm_osc(iter([
            ("modify", _osc_node(1, 5.0, 1.0, 2)),
            ("delete", _osc_node(2, None, None, 2)),
        ]), f)
    drain()
    df = spark.read.parquet(out)
    assert df.count() == 4  # file 1 NOT re-emitted, file 2 exactly once

    # CDC fold over the accumulated emissions = final latest-state view
    w = Window.partitionBy("osmid").orderBy(F.col("version").desc())
    latest = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .filter("action <> 'delete'")
    )
    final = {r["osmid"]: r["lon"] for r in latest.collect()}
    assert final == {1: 5.0}


def test_osc_stream_reads_gzipped_diffs(spark, tmp_path):
    """Replication feeds ship gzip-compressed (.osc.gz) — the streaming
    reader must consume them through the same decompressing opener as
    the batch reader."""
    import gzip

    from osmdatapy_spark.sources.xml import read_osm_xml_stream, write_osm_osc
    import io

    d = tmp_path / "diffs"
    d.mkdir()
    buf = io.StringIO()
    write_osm_osc(iter([("create", _osc_node(7, 1.5, 2.5, 1))]), buf)
    with gzip.open(d / "000001.osc.gz", "wt") as f:
        f.write(buf.getvalue())

    q = (
        read_osm_xml_stream(spark, str(d))
        .writeStream.format("memory")
        .queryName("t_osc_gz")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("select * from t_osc_gz").collect()
    assert len(rows) == 1
    assert rows[0]["osmid"] == 7 and rows[0]["action"] == "create"
    assert rows[0]["lon"] == 1.5


# ---------------------------------------------------------------------------
# Streaming PBF directory watcher — the bulk twin of the .osc watcher
# ---------------------------------------------------------------------------


def _pbf_epoch(path, nodes, ways=()):
    """Write one epoch extract: nodes = [(id, lon, lat, tags)], ways =
    [(id, refs, tags)]."""
    from osmdatapy_spark.sources.pbf_codec import PbfWriter

    w = PbfWriter()
    if nodes:
        w.add_dense_nodes(list(nodes))
    if ways:
        w.add_ways(list(ways))
    w.write(str(path))


def test_pbf_stream_matches_batch(spark, tmp_path):
    """The osmpbf streaming source over an extract directory must emit
    exactly the rows the batch reader sees — tags map and refs included
    (the pickled-row path renders Arrow maps/structs back faithfully)."""
    from osmdatapy_spark.sources.pbf import read_pbf, read_pbf_stream

    d = tmp_path / "epochs"
    d.mkdir()
    _pbf_epoch(d / "000001.osm.pbf", [(1, 1.0, 2.0, {"amenity": "cafe"}), (2, 3.0, 4.0, {})])
    _pbf_epoch(d / "000002.osm.pbf", [], ways=[(10, [1, 2], {"highway": "path"})])

    key = lambda r: (r["osmid"], r["osmtype"], r["lon"], dict(r["tags"] or {}), list(r["refs"] or []))  # noqa: E731
    batch = sorted(str(key(r)) for r in read_pbf(spark, str(d)).collect())

    q = (
        read_pbf_stream(spark, str(d))
        .writeStream.format("memory")
        .queryName("t_pbf_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(str(key(r)) for r in spark.sql("select * from t_pbf_stream").collect())
    assert got == batch and len(got) == 3


def test_pbf_stream_incremental_exactly_once(spark, tmp_path):
    """An epoch file appearing AFTER the first drain is consumed exactly
    once on the next drain (offset = last file basename) — parallel to
    test_osc_stream_incremental_exactly_once, completing the bulk+diff
    streaming story."""
    from osmdatapy_spark.sources.pbf import read_pbf_stream

    d = tmp_path / "epochs"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _pbf_epoch(d / "000001.osm.pbf", [(1, 1.0, 1.0, {}), (2, 2.0, 2.0, {})])

    def drain():
        # parquet sink, not memory: resuming from the checkpoint is
        # exactly what this test pins
        q = (
            read_pbf_stream(spark, str(d), osmtypes={0}, columns=["osmid", "lon", "lat"])
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    drain()
    assert spark.read.parquet(out).count() == 2

    _pbf_epoch(d / "000002.osm.pbf", [(3, 5.0, 5.0, {})])
    drain()
    df = spark.read.parquet(out)
    assert df.count() == 3  # file 1 NOT re-emitted, file 2 exactly once
    assert sorted(r["osmid"] for r in df.collect()) == [1, 2, 3]


def test_bulk_pbf_then_osc_diff_lifecycle(spark, tmp_path):
    """The real deployment sequence end-to-end: a bulk epoch extract
    streams in through the .pbf watcher, minutely diffs stream in through
    the .osc watcher, and ONE latest-version CDC fold over the combined
    emissions yields the same state as applying the diff to the base by
    hand — the bulk+diff story the two watchers exist for."""
    from pyspark.sql import Window

    from osmdatapy_spark.sources.pbf import read_pbf_stream
    from osmdatapy_spark.sources.xml import read_osm_xml_stream, write_osm_osc

    bulk = tmp_path / "bulk"
    diffs = tmp_path / "diffs"
    bulk.mkdir(), diffs.mkdir()
    # epoch extract: nodes 1..4 at version-0 positions
    _pbf_epoch(bulk / "000001.osm.pbf", [(i, float(i), 0.0, {}) for i in (1, 2, 3, 4)])
    # diff: move 2, delete 3, create 5
    with open(diffs / "000001.osc", "w") as f:
        write_osm_osc(iter([
            ("modify", _osc_node(2, 20.0, 0.0, 2)),
            ("delete", _osc_node(3, None, None, 2)),
            ("create", _osc_node(5, 5.0, 0.0, 1)),
        ]), f)

    out_bulk = str(tmp_path / "out_bulk")
    out_diff = str(tmp_path / "out_diff")
    q1 = (
        read_pbf_stream(spark, str(bulk), osmtypes={0}, columns=["osmid", "lon", "lat"])
        .writeStream.format("parquet").option("path", out_bulk)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q1.awaitTermination(240)
    q2 = (
        read_osm_xml_stream(spark, str(diffs))
        .writeStream.format("parquet").option("path", out_diff)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(240)

    base = spark.read.parquet(out_bulk).select(
        "osmid", "lon", F.lit(1).alias("version"), F.lit("base").alias("action")
    )
    ch = spark.read.parquet(out_diff).select("osmid", "lon", "version", "action")
    merged = base.unionByName(ch)
    w = Window.partitionBy("osmid").orderBy(F.col("version").desc())
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .filter("action <> 'delete'")
    )
    final = {r["osmid"]: r["lon"] for r in latest.collect()}
    assert final == {1: 1.0, 2: 20.0, 4: 4.0, 5: 5.0}


# ---------------------------------------------------------------------------
# Watcher listing contract: zero-padding, dotfiles, arrival rationing
# ---------------------------------------------------------------------------


def test_watch_rejects_unpadded_basenames(tmp_path):
    """'9.osc' + '10.osc' must fail LOUDLY: lexicographic order is the
    arrival order only for equal-width (zero-padded) names, so an unpadded
    sequence would be silently skipped by the basename-keyed offset."""
    import pytest

    from osmdatapy_spark.sources._watch import list_watched_files

    (tmp_path / "9.osc").write_text("<osmChange/>")
    (tmp_path / "10.osc").write_text("<osmChange/>")
    with pytest.raises(ValueError, match="zero-padded"):
        list_watched_files(str(tmp_path), (".osc",), "osmxml")


def test_watch_allows_nonnumeric_mixed_width_stems(tmp_path):
    """The width lint only guards the numeric-misorder hazard ('9' after
    '10').  Non-numeric stems of differing widths — an .osm snapshot
    beside numbered diffs, or date-stamped names — sort consistently and
    were streaming fine before the lint existed, so they must keep
    listing instead of hard-failing a deployed stream."""
    from osmdatapy_spark.sources._watch import list_watched_files

    (tmp_path / "base.osc").write_text("<osmChange/>")
    (tmp_path / "daily-2024-01-02.osc").write_text("<osmChange/>")
    files = list_watched_files(str(tmp_path), (".osc",), "osmxml")
    assert [f.split("/")[-1] for f in files] == [
        "base.osc", "daily-2024-01-02.osc"
    ]


def test_watch_mixed_dir_still_guards_numeric_subset(tmp_path):
    """One non-numeric file beside UNPADDED numeric diffs — the motivating
    mixed-directory case — must NOT disable the misorder guard: the
    numeric sequence '9.osc'/'10.osc' is exactly as hazardous with a
    snapshot sitting next to it (the guard applies to the numeric-stem
    SUBSET, not all-or-nothing)."""
    import pytest

    from osmdatapy_spark.sources._watch import list_watched_files

    (tmp_path / "snapshot.osc").write_text("<osmChange/>")
    (tmp_path / "9.osc").write_text("<osmChange/>")
    (tmp_path / "10.osc").write_text("<osmChange/>")
    with pytest.raises(ValueError, match="zero-padded"):
        list_watched_files(str(tmp_path), (".osc",), "osmxml")
    # ... while uniformly-padded numeric stems beside the snapshot list fine
    (tmp_path / "9.osc").unlink()
    (tmp_path / "10.osc").unlink()
    (tmp_path / "09.osc").write_text("<osmChange/>")
    (tmp_path / "10.osc").write_text("<osmChange/>")
    files = list_watched_files(str(tmp_path), (".osc",), "osmxml")
    assert [f.split("/")[-1] for f in files] == ["09.osc", "10.osc", "snapshot.osc"]


def test_watch_skips_dotfiles(tmp_path):
    """Hidden dotfiles (e.g. macOS '._000001.osm.pbf' AppleDouble sidecars)
    sort before every real file and would wedge an existing stream below
    its offset — the listing must skip them in both branches."""
    from osmdatapy_spark.sources._watch import list_watched_files

    (tmp_path / "000001.osc").write_text("<osmChange/>")
    (tmp_path / "._000001.osc").write_text("junk")
    files = list_watched_files(str(tmp_path), (".osc",), "osmxml")
    assert [f.split("/")[-1] for f in files] == ["000001.osc"]
    files = list_watched_files(str(tmp_path / "*"), (".osc",), "osmxml")
    assert [f.split("/")[-1] for f in files] == ["000001.osc"]


def test_pbf_stream_rations_arrival_batches(tmp_path):
    """With maxFilesPerTrigger set, a bulk multi-epoch drop must NOT
    decode in one microbatch: the pbf watcher's read() advances the
    offset past only N files per call, so a populated directory drains
    one ration at a time instead of materializing everything on the
    driver at once (it is opt-in: an availableNow run plans exactly one
    read per run, so unlimited stays the default)."""
    from osmdatapy_spark.sources.pbf import OsmPbfSimpleStreamReader, PBF_SCHEMA

    d = tmp_path / "epochs"
    d.mkdir()
    _pbf_epoch(d / "000001.osm.pbf", [(1, 1.0, 1.0, {})])
    _pbf_epoch(d / "000002.osm.pbf", [(2, 2.0, 2.0, {})])
    _pbf_epoch(d / "000003.osm.pbf", [(3, 3.0, 3.0, {})])

    r = OsmPbfSimpleStreamReader(PBF_SCHEMA, {"path": str(d), "maxFilesPerTrigger": "1"})
    offsets = [r.initialOffset()]
    batches = []
    for _ in range(3):
        rows, end = r.read(offsets[-1])
        batches.append(rows)
        offsets.append(end)
    assert [len(b) for b in batches] == [1, 1, 1]
    assert offsets[-1] == {"last": "000003.osm.pbf"}
    # a wider ration takes two files per microbatch
    r2 = OsmPbfSimpleStreamReader(PBF_SCHEMA, {"path": str(d), "maxFilesPerTrigger": "2"})
    rows, end = r2.read(r2.initialOffset())
    assert len(rows) == 2 and end == {"last": "000002.osm.pbf"}
    # and the default is unlimited (availableNow drains everything)
    r3 = OsmPbfSimpleStreamReader(PBF_SCHEMA, {"path": str(d)})
    rows, end = r3.read(r3.initialOffset())
    assert len(rows) == 3 and end == {"last": "000003.osm.pbf"}


def test_osc_stream_rations_arrival_batches(tmp_path):
    """The .osc watcher honors the same opt-in maxFilesPerTrigger ration
    as the pbf watcher (default stays unlimited — replication diffs are
    small by contract)."""
    from osmdatapy_spark.sources.xml import (
        OSC_SCHEMA,
        OsmXmlSimpleStreamReader,
        write_osm_osc,
    )

    d = tmp_path / "diffs"
    d.mkdir()
    for i in (1, 2, 3):
        with open(d / f"00000{i}.osc", "w") as f:
            write_osm_osc(iter([("create", _osc_node(i, float(i), 0.0, 1))]), f)

    r = OsmXmlSimpleStreamReader(OSC_SCHEMA, {"path": str(d), "maxFilesPerTrigger": "1"})
    rows, end = r.read(r.initialOffset())
    assert len(rows) == 1 and end == {"last": "000001.osc"}
    rows, end = r.read(end)
    assert len(rows) == 1 and end == {"last": "000002.osc"}
    # default: unlimited
    r2 = OsmXmlSimpleStreamReader(OSC_SCHEMA, {"path": str(d)})
    rows, end = r2.read(r2.initialOffset())
    assert len(rows) == 3 and end == {"last": "000003.osc"}


def test_option_lookup_is_case_insensitive(tmp_path):
    """Spark hands Python data sources a CaseInsensitiveDict that STORES
    keys lowercased — dict(options).get('maxFilesPerTrigger') silently
    returns the default.  The readers must find the option under either
    casing (review finding: the ration was a silent no-op on the real
    streaming path)."""
    from osmdatapy_spark.sources._watch import get_option
    from osmdatapy_spark.sources.pbf import OsmPbfSimpleStreamReader, PBF_SCHEMA

    assert get_option({"maxfilespertrigger": "3"}, "maxFilesPerTrigger", "0") == "3"
    assert get_option({"maxFilesPerTrigger": "3"}, "maxFilesPerTrigger", "0") == "3"
    assert get_option({}, "maxFilesPerTrigger", "0") == "0"

    d = tmp_path / "epochs"
    d.mkdir()
    _pbf_epoch(d / "000001.osm.pbf", [(1, 1.0, 1.0, {})])
    _pbf_epoch(d / "000002.osm.pbf", [(2, 2.0, 2.0, {})])
    # the lowercased dict Spark actually delivers
    r = OsmPbfSimpleStreamReader(
        PBF_SCHEMA, {"path": str(d), "maxfilespertrigger": "1"}
    )
    rows, end = r.read(r.initialOffset())
    assert len(rows) == 1 and end == {"last": "000001.osm.pbf"}


def test_pbf_stream_ration_through_real_option_path(spark, tmp_path):
    """End-to-end through spark.readStream: with max_files_per_trigger=1
    an availableNow run (ONE planned read for the simple reader) must
    consume exactly the first file; the next run picks up the second —
    proving the option survives Spark's option-key lowercasing."""
    from osmdatapy_spark.sources.pbf import read_pbf_stream

    d = tmp_path / "epochs"
    d.mkdir()
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _pbf_epoch(d / "000001.osm.pbf", [(1, 1.0, 1.0, {}), (2, 2.0, 2.0, {})])
    _pbf_epoch(d / "000002.osm.pbf", [(3, 3.0, 3.0, {})])

    def drain():
        q = (
            read_pbf_stream(
                spark, str(d), osmtypes={0}, columns=["osmid"], max_files_per_trigger=1
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    drain()
    assert sorted(r["osmid"] for r in spark.read.parquet(out).collect()) == [1, 2]
    drain()
    assert sorted(r["osmid"] for r in spark.read.parquet(out).collect()) == [1, 2, 3]


def test_watch_allows_mixed_suffix_uniform_stems(tmp_path):
    """Compression enabled mid-stream is an advertised-legal layout:
    '000009.osc' + '000010.osc.gz' have equal-width zero-padded stems, so
    the padding lint must NOT reject them (digits decide the order before
    the suffix)."""
    from osmdatapy_spark.sources._watch import list_watched_files

    (tmp_path / "000009.osc").write_text("<osmChange/>")
    (tmp_path / "000010.osc.gz").write_bytes(b"x")
    files = list_watched_files(
        str(tmp_path), (".osc", ".osc.gz"), "osmxml"
    )
    assert [f.split("/")[-1] for f in files] == ["000009.osc", "000010.osc.gz"]


def test_batch_readers_skip_dotfiles(spark, tmp_path):
    """The BATCH directory expanders skip AppleDouble sidecars too — a
    '._part.osm.pbf' resource fork would crash the framing scan of the
    whole directory (the stream watcher already skipped them)."""
    from osmdatapy_spark.sources.pbf import read_pbf

    d = tmp_path / "shards"
    d.mkdir()
    _pbf_epoch(d / "000001.osm.pbf", [(1, 1.0, 1.0, {})])
    (d / "._000001.osm.pbf").write_bytes(b"\x00\x05\x16\x07junk")
    assert read_pbf(spark, str(d)).count() == 1


def test_pbf_watcher_dictionary_skip(tmp_path):
    """The pbf epoch watcher forwards reader options verbatim, so the
    dictionary skip works per microbatch file: only elements from blocks
    carrying the key reach the batch rows."""
    from osmdatapy_spark.sources.pbf import PBF_SCHEMA, OsmPbfSimpleStreamReader
    from osmdatapy_spark.sources.pbf_codec import PbfWriter

    d = tmp_path / "epochs"
    d.mkdir()
    w = PbfWriter()
    w.add_ways([(1, [1, 2], {"highway": "residential"})])
    w.add_ways([(2, [1, 2], {"bridge": "yes"})])
    w.write(str(d / "000001.osm.pbf"), groups_per_block=1)

    r = OsmPbfSimpleStreamReader(
        PBF_SCHEMA, {"path": str(d), "any_tag_keys": "bridge"}
    )
    rows, end = r.read(r.initialOffset())
    assert end == {"last": "000001.osm.pbf"}
    assert [t[0] for t in rows] == [2]  # only the bridge block's way
    # no skip option: both ways stream
    r2 = OsmPbfSimpleStreamReader(PBF_SCHEMA, {"path": str(d)})
    rows2, _ = r2.read(r2.initialOffset())
    assert sorted(t[0] for t in rows2) == [1, 2]
