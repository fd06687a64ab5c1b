"""Custom stateful streaming operator via ``applyInPandasWithState``
(beyond-reference scope — the reference has no streaming at all, SURVEY
§2.9).

``running_user_totals`` keeps one small state row per user (event count +
value total) and emits the updated totals every micro-batch.  State is
keyed by user_id, so it scales horizontally with the shuffle; with a
watermark + timeout the state is bounded (here GroupStateTimeout
NoTimeout for the bounded test corpus; production sets
``ProcessingTimeTimeout`` and expires idle users).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events_stream):
    """events(user_id, value, ...) stream → per-user running totals.

    Works only under ``readStream`` (applyInPandasWithState requires a
    streaming DataFrame); the batch equivalent is a plain groupBy — which
    is exactly the unit-test oracle."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
