"""Arbitrary stateful streaming on the NEW ``transformWithStateInPandas``
API (Spark 4's successor to ``applyInPandasWithState`` — typed state
variables on the RocksDB state store instead of one opaque state tuple).

One operator is expressed on each API generation deliberately:
``streaming/stateful.py`` carries the production suite on the
established ``applyInPandasWithState`` (GroupState), and this module
proves the SAME engine semantics port to the arbitrary-state processor
model — per-user running totals with a ``ValueState``, exact integer
accumulation (micro-cent longs, so any micro-batch split produces
bit-identical totals; float order-dependence can't leak in), update-mode
emission of only the touched keys per batch.

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) — set per-query in
the test; the HDFS-backed default store does not support
transformWithState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_micro", LongType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("micro", LongType(), True),
    ]
)


def _make_processor():
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, micro = self._totals.get()
            else:
                n, micro = 0, 0
            for pdf in rows:
                n += len(pdf)
                # exact integer accumulation: values are 4-dp decimals in
                # the synthetic data, so PER-ROW micro-unit conversion is
                # lossless and the int64 sum is order-independent (a
                # float batch-sum could drift past the rounding guard on
                # large batches)
                micro += int((pdf["value"] * 10_000).round().astype("int64").sum())
            self._totals.update((n, micro))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_micro": [micro]}
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def running_totals_tws(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, micro-unit total) — the
    transformWithStateInPandas face.  Works only under ``readStream``
    with the RocksDB state store provider."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
