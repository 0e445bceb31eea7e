"""Custom stateful streaming operator: in-order turn release.

The north-rule invariant is "per-turn text equality under stable turn
ordering" — in batch, a window over ``turn_idx`` (operators/ordering.py).
Under continuous arrival the same guarantee needs per-conversation STATE:
turns of one conversation can land in different micro-batches and out of
order, and a downstream consumer (the extraction pass, an exporter) must
still see each conversation as a contiguous ``turn_idx`` prefix.

``ordered_turn_release`` is the applyInPandasWithState recast of the
reference's stable-ordering guarantee (the reference sorts whole
compilation units before running a pass; a stream cannot sort what has not
arrived yet, so it buffers):

* state per ``conv_id``: the next expected ``turn_idx`` plus the buffered
  out-of-order turns (JSON-encoded rows — state rides Spark's state store,
  so it must be a flat struct);
* each micro-batch merges arrivals with the buffer and releases the
  maximal contiguous prefix, in order;
* duplicate arrivals of an already-released ``turn_idx`` are dropped
  (exactly-once release under at-least-once file replay);
* gaps stay buffered across micro-batches until the missing turn arrives —
  or, with ``gap_timeout_ms`` set, until the conversation has been silent
  that long: the timeout flushes the buffer in ``turn_idx`` order, skipping
  the permanently-missing turns (at web scale some turns never arrive;
  unbounded buffering would leak state forever).

All work is Arrow-batched pandas (§2.10: no per-row Python in plans);
state size per key is O(out-of-order window), not O(conversation).
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# released rows keep the authoritative transcript shape (input_hint)
OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
# next contiguous turn_idx to release + JSON-encoded buffered rows
STATE_SCHEMA = "next_idx int, buffered string"

_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _release_logic(
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_timeout_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    next_idx, buffered = state.get if state.exists else (0, "[]")
    rows: dict[int, dict[str, Any]] = {r["turn_idx"]: r for r in json.loads(buffered)}
    if gap_timeout_ms is not None and state.hasTimedOut:
        # conversation went silent with a gap: flush the buffer in turn_idx
        # order, skipping the turns that never arrived (bounded state)
        out = [rows[i] for i in sorted(rows)]
        state.update((max(rows, default=next_idx - 1) + 1, "[]"))
        state.setTimeoutDuration(gap_timeout_ms)
        if out:
            yield _to_pdf(out)
        return
    for pdf in pdfs:
        for r in pdf.to_dict("records"):
            idx = int(r["turn_idx"])
            if idx >= next_idx and idx not in rows:  # drop dup / already-released
                ts = r["ts"]
                r["ts"] = None if pd.isnull(ts) else ts.isoformat()
                r["turn_idx"] = idx
                rows[idx] = r
    out = []
    while next_idx in rows:
        out.append(rows.pop(next_idx))
        next_idx += 1
    state.update((next_idx, json.dumps(list(rows.values()))))
    if gap_timeout_ms is not None:
        state.setTimeoutDuration(gap_timeout_ms)
    if out:
        yield _to_pdf(out)


def _to_pdf(out: list) -> pd.DataFrame:
    pdf = pd.DataFrame(out, columns=_COLS)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def _release(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    yield from _release_logic(pdfs, state, gap_timeout_ms=None)


# ---------------------------------------------------------------------------
# streaming sessionization (the batch w3 semantics under continuous arrival)
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800  # same gap rule as the batch operator / oracle
SESSION_OUTPUT = "event_id long, user_id long, ts timestamp, session_idx long"
# released-through event-time boundary, last released event time, running
# session counter, JSON-buffered (event_id, ts_us) pairs awaiting watermark
SESSION_STATE = "boundary_us long, last_ts_us long, session_idx long, buffered string"


def _sessionize_logic(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    boundary_us, last_ts_us, session_idx, buffered = (
        state.get if state.exists else (-(2**62), None, 0, "[]")
    )
    rows: dict[int, int] = {r[0]: r[1] for r in json.loads(buffered)}
    if not state.hasTimedOut:
        for pdf in pdfs:
            for eid, ts in zip(pdf["event_id"], pdf["ts"]):
                if pd.isnull(ts):
                    continue
                ts_us = int(ts.value // 1000)
                # <= boundary means already released (crash replay) or late
                # beyond the watermark (dropped, the watermark contract);
                # buffer dedup by event_id handles within-window redelivery
                if ts_us > boundary_us and eid not in rows:
                    rows[int(eid)] = ts_us
    wm_us = state.getCurrentWatermarkMs() * 1000
    ready = sorted(
        ((ts_us, eid) for eid, ts_us in rows.items() if ts_us <= wm_us)
    )
    out = []
    for ts_us, eid in ready:
        if last_ts_us is None or ts_us - last_ts_us > SESSION_GAP_S * 1_000_000:
            session_idx += 1
        last_ts_us = ts_us
        out.append((eid, key[0], ts_us, session_idx))
        del rows[eid]
    boundary_us = max(boundary_us, wm_us)
    state.update(
        (boundary_us, last_ts_us, session_idx, json.dumps(sorted(rows.items())))
    )
    if rows:
        # wake this group on the next watermark advance even if no new
        # events arrive for it — buffered tails must not wait for traffic
        state.setTimeoutTimestamp(max(wm_us // 1000 + 1, 1))
    if out:
        pdf = pd.DataFrame(out, columns=["event_id", "user_id", "ts", "session_idx"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
        yield pdf


def stream_sessionize(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming gap-based sessionization: per user, events are buffered
    until the event-time watermark passes them, then released in (ts,
    event_id) order with a session index that increments on gaps >
    SESSION_GAP_S — the applyInPandasWithState recast of the batch
    `w3_sessionize` window (same gap rule, so a drained stream equals the
    batch result row-for-row; pinned by test_stream_sessionize_equals_batch).

    Out-of-order arrival within the watermark reorders correctly; events
    later than the watermark are dropped (the standard lateness contract);
    duplicate deliveries dedup by event_id in-buffer and by the released
    boundary across restarts.  Event-time timeouts re-invoke groups whose
    buffers are waiting, so a user's tail releases when the GLOBAL watermark
    advances, not only when that user sees new traffic.  State per user is
    O(events inside the watermark window), never O(history)."""
    from pyspark.sql import functions as F

    # watermarks require TIMESTAMP (LTZ); parquet event tables often carry
    # TIMESTAMP_NTZ — the cast reinterprets the same wall-clock instant
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_logic,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def ordered_turn_release(
    transcripts_stream: DataFrame, gap_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming DataFrame of turns released in contiguous per-conversation
    ``turn_idx`` order, each exactly once, across micro-batch boundaries.

    ``gap_timeout_ms``: optional processing-time bound on how long a gap may
    block a conversation; on expiry the buffered tail flushes in order
    (still deduped, no longer contiguous).  None = buffer until arrival."""
    if gap_timeout_ms is None:
        fn, conf = _release, GroupStateTimeout.NoTimeout
    else:

        def fn(key, pdfs, state):  # bind the timeout
            yield from _release_logic(pdfs, state, gap_timeout_ms=gap_timeout_ms)

        conf = GroupStateTimeout.ProcessingTimeTimeout
    return transcripts_stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
