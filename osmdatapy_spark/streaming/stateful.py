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


# ---------------------------------------------------------------------------
# First-seen dedup with event-time TTL
# ---------------------------------------------------------------------------

DEDUP_OUTPUT_SCHEMA = "user_id long, event_type string, first_event_id long, first_ts timestamp"
DEDUP_STATE_SCHEMA = "seen long"

_TTL_MS = 3_600_000  # 1 hour past the key's watermark


def _first_seen(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        # TTL expired: drop the key's state.  A duplicate arriving later
        # re-emits (the bounded-state / at-least-once trade, same contract
        # as dropDuplicatesWithinWatermark).
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    if not state.exists and len(rows):
        first = rows.sort_values(["ts", "event_id"]).iloc[0]
        state.update((1,))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + _TTL_MS)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "first_event_id": [int(first["event_id"])],
                "first_ts": [first["ts"]],
            }
        )
    else:
        # already seen inside the TTL: swallow duplicates, refresh nothing
        # (TTL anchors to first sight — a hot duplicate key still expires)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + _TTL_MS)
        return


def first_seen_dedup(events_stream):
    """Custom stateful streaming dedup with an EVENT-TIME TTL: emit the
    first event per (user_id, event_type); keep the key's state only
    until the watermark passes first-sight + 1 h, then expire it via
    ``GroupStateTimeout.EventTimeTimeout``.

    This is the applyInPandasWithState formulation of what
    ``dropDuplicatesWithinWatermark`` does natively — written out because
    it is the template for ANY custom TTL'd per-key streaming state
    (rate limiting, sessionization variants, novelty detection): state
    bounded by key-arrival rate × TTL, horizontally partitioned by the
    groupBy key.  Requires a watermark upstream (EventTimeTimeout
    contract); batch oracle = min-by-(ts,event_id) per key, the pytest
    parity check."""
    return events_stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Latest-version element upsert (streaming OSC changefile application)
# ---------------------------------------------------------------------------

UPSERT_OUTPUT_SCHEMA = "osmid long, version long, op string, val string"
UPSERT_STATE_SCHEMA = "version long, op string, val string"


def _upsert_element(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    cur = state.get if state.exists else None
    best = cur  # (version, op, val)
    for pdf in pdfs:
        for r in pdf.sort_values("version").itertuples():
            if best is None or r.version > best[0]:
                best = (int(r.version), str(r.op), str(r.val))
    if best is not None and best != cur:
        state.update(best)
        yield pd.DataFrame(
            {
                "osmid": [key[0]],
                "version": [best[0]],
                "op": [best[1]],
                "val": [best[2]],
            }
        )


def latest_version_upsert(changes_stream):
    """Streaming OSC changefile application — the readStream counterpart
    of the batch ``osm_apply_changes`` query: a create/modify/delete
    stream keyed by osmid keeps only each element's LATEST version in
    state and emits a row whenever it advances (update mode — exactly the
    CDC upsert feed a downstream materialized view consumes; 'delete'
    rows are tombstones).

    State is one (version, op, val) triple per live element — bounded by
    the element population, not the change volume, and partitioned
    horizontally by the groupBy key like every stateful operator here.
    Batch oracle: ``groupBy(osmid).agg(max(struct(version, op, val)))`` —
    the same partial-agg election the batch query uses; the pytest parity
    check proves stream and batch converge to identical final states."""
    return changes_stream.groupBy("osmid").applyInPandasWithState(
        _upsert_element,
        outputStructType=UPSERT_OUTPUT_SCHEMA,
        stateStructType=UPSERT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Running per-key moments (Welford) — the streaming anomaly-detector state
# ---------------------------------------------------------------------------

MOMENTS_OUTPUT_SCHEMA = "user_id long, n long, mean double, m2 double"
MOMENTS_STATE_SCHEMA = "n long, mean double, m2 double"


def _welford_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    for pdf in pdfs:
        # deterministic intra-batch fold order so replays accumulate
        # identically (micro-batch row order is not guaranteed)
        for v in pdf.sort_values("event_id")["value"]:
            n += 1
            d = float(v) - mean
            mean += d / n
            m2 += d * (float(v) - mean)
    state.update((n, mean, m2))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "mean": [mean], "m2": [m2]})


def running_user_moments(events_stream):
    """Per-user running (count, mean, M2) via Welford's online update —
    the state a streaming anomaly detector thresholds against
    (std = sqrt(M2/n)).  One three-scalar state row per user: bounded by
    the key population, partitioned horizontally by the groupBy key,
    numerically stable at any event count (no catastrophic cancellation —
    the naive sum-of-squares in float is NOT; the batch face gets
    exactness from DECIMAL sums instead, stream_user_zscore's oracle).

    Update-mode emission per micro-batch; the pytest parity check proves
    a single availableNow fold reproduces the batch decimal moments to
    float tolerance."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _welford_user,
        outputStructType=MOMENTS_OUTPUT_SCHEMA,
        stateStructType=MOMENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming SCD2: validity intervals emitted as versions supersede each other
# ---------------------------------------------------------------------------

SCD2_OUTPUT_SCHEMA = "osmid long, version long, val string, valid_to long, is_current boolean"
SCD2_STATE_SCHEMA = "version long, val string"


def _scd2_element(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    cur = state.get if state.exists else None  # (version, val) open interval
    out: list[tuple] = []
    rows = pd.concat(list(pdfs), ignore_index=True)
    changed = False
    for r in rows.sort_values("version").itertuples():
        if cur is not None and r.version > cur[0]:
            # the open interval closes at the superseding version
            out.append((key[0], cur[0], cur[1], int(r.version) - 1, False))
        if cur is None or r.version > cur[0]:
            cur = (int(r.version), str(r.val))
            changed = True
    if changed and cur is not None:
        state.update(cur)
        out.append((key[0], cur[0], cur[1], None, True))
    if out:
        yield pd.DataFrame(
            out, columns=["osmid", "version", "val", "valid_to", "is_current"]
        )


def scd2_intervals(changes_stream):
    """Streaming SCD2 history build — the incremental twin of the batch
    ``osm_element_history_scd2`` window query: as versions arrive, the
    previously-open interval CLOSES (emitted once, immutable — an
    append-friendly fact) and the new version opens (update-mode row,
    superseded later).  A warehouse sink upserts on (osmid, version):
    closed rows win over their open predecessors, which is exactly the
    dedup the parity test applies.

    State per element is one (version, val) pair — the same bound as the
    CDC upsert; history rows live in the SINK, not in state, so a
    billion-version element costs the same state as a fresh one.  Late
    or duplicate versions <= the open version are ignored (idempotent
    replay), matching the batch window's semantics when versions are
    unique per element."""
    return changes_stream.groupBy("osmid").applyInPandasWithState(
        _scd2_element,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM drift detector (scaled-integer state — exact)
# ---------------------------------------------------------------------------

CUSUM_OUTPUT_SCHEMA = (
    "user_id long, max_cusum double, n_alarms long, first_alarm_event_id long"
)
CUSUM_STATE_SCHEMA = "s10k long, max10k long, n_alarms long, first_alarm long"

_CUSUM_TARGET_10K = 300 * 10_000
_CUSUM_H_10K = 1000 * 10_000


def _cusum_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    s, mx, n_alarms, first = state.get if state.exists else (0, 0, 0, -1)
    for pdf in pdfs:
        # fold in (ts, event_id) order — the SAME total order the batch
        # face's prefix-sum/prefix-min windows use; event_id alone only
        # coincides when ids happen to be assigned in timestamp order
        for eid, v in pdf.sort_values(["ts", "event_id"])[
            ["event_id", "value"]
        ].itertuples(index=False):
            # 4-dp values scaled to exact integers: the fold is pure BIGINT
            # arithmetic, so the stream state equals the batch DECIMAL
            # result BIT-FOR-BIT, not just to float tolerance
            s = max(0, s + round(float(v) * 10_000) - _CUSUM_TARGET_10K)
            mx = max(mx, s)
            if s > _CUSUM_H_10K:
                n_alarms += 1
                if first < 0:
                    first = int(eid)
    state.update((s, mx, n_alarms, first))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "max_cusum": [mx / 10_000],
            "n_alarms": [n_alarms],
            "first_alarm_event_id": [first],
        }
    )


def running_user_cusum(events_stream):
    """Streaming face of ``rel_cusum_drift``: Page's recurrence s_i =
    max(0, s + x - target) applied DIRECTLY — in a stream the sequential
    dependency costs nothing (events arrive in order), so the state is
    four scalars per user while the batch face pays a prefix-min window
    to parallelize the same recurrence.  Values are scaled to exact
    integer ten-thousandths, making stream-vs-batch agreement exact
    (pinned by test_cusum_stream_matches_batch), not tolerance-based.
    Update-mode emission; state bounded by the user population."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _cusum_user,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters (bounded-state streaming top-k)
# ---------------------------------------------------------------------------

HH_OUTPUT_SCHEMA = "event_type string, user_id long, est_count long, rank long"
HH_STATE_SCHEMA = "ids array<long>, counts array<long>"

_HH_M = 256  # tracked-counter budget per key (the MG memory bound)
_HH_K = 10


def _heavy_hitters(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        ids, counts = state.get
        tracked = dict(zip(ids, counts))
    else:
        tracked = {}
    for pdf in pdfs:
        # deterministic fold order (same discipline as the CUSUM fold)
        for uid in pdf.sort_values(["ts", "event_id"])["user_id"]:
            uid = int(uid)
            if uid in tracked:
                tracked[uid] += 1
            elif len(tracked) < _HH_M:
                tracked[uid] = 1
            else:
                # MG decrement step: every counter pays one; zeros evict
                tracked = {u: c - 1 for u, c in tracked.items() if c > 1}
    state.update((list(tracked.keys()), list(tracked.values())))
    top = sorted(tracked.items(), key=lambda uc: (-uc[1], uc[0]))[:_HH_K]
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(top),
            "user_id": [u for u, _ in top],
            "est_count": [c for _, c in top],
            "rank": list(range(1, len(top) + 1)),
        }
    )


def running_heavy_hitters(events_stream):
    """Streaming top-k users per event type via Misra–Gries (the
    bounded-state frequency sketch: at most ``m`` counters per key, with
    the guarantee est >= true - N/m — and EXACT counts whenever the key's
    distinct-item count stays under ``m``, which the batch-parity test
    exploits).  The batch face is ``stream_heavy_hitters`` (plain groupBy
    count + per-key top-k); the streaming face never stores more than
    ``m`` (id, count) pairs per event type no matter how many users flow
    through — the state-boundedness story CMS tells for totals, told for
    top-k membership.  Update-mode emission of the current top ``k``."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        _heavy_hitters,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
