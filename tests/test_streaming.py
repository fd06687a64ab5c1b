"""Structured Streaming face: the SAME tumbling-window aggregation function
runs as a real stream (availableNow over the events parquet, memory sink)
and must agree with its batch execution — the unified-API guarantee."""

from __future__ import annotations

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
