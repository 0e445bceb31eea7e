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
  out-of-order turns (JSON-encoded — state rides Spark's state store, so it
  must be a flat struct; the payload is COLUMNAR, a list of column arrays
  with ts as int64 ns, so encode/decode is vectorized, not per-row);
* each micro-batch merges arrivals with the buffer and releases the
  maximal contiguous prefix, in order;
* duplicate arrivals of an already-released ``turn_idx`` are dropped
  (exactly-once release under at-least-once file replay);
* gaps stay buffered across micro-batches until the missing turn arrives —
  or, with ``gap_timeout_ms`` set, until the conversation has been silent
  that long: the timeout flushes the buffer in ``turn_idx`` order, skipping
  the permanently-missing turns (at web scale some turns never arrive;
  unbounded buffering would leak state forever).

All work is Arrow-batched pandas/numpy (§2.10: no per-row Python in
plans) — the buffer merge is mask + concat + drop_duplicates, the
contiguous-prefix release is one arange comparison, and sessionization's
gap rule is a diff/cumsum (round-3 VERDICT #3 closed the former
``to_dict("records")`` per-row loops; ``scripts/probe_stateful_merge.py``
measures the win on a hot 10k-buffered-turn key).  State size per key is
O(out-of-order window), not O(conversation).
"""

from __future__ import annotations

import json
from typing import Iterator, Tuple

import numpy as np
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


def _buf_decode(buffered: str) -> pd.DataFrame:
    """Columnar JSON state -> buffer frame (ts int64 ns -> datetime64[ns];
    the iNaT sentinel round-trips to NaT via the view)."""
    cols = json.loads(buffered)
    if not cols:
        return pd.DataFrame(columns=_COLS)
    conv, idxs, role, text, tool, ts_ns = cols
    return pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": np.asarray(idxs, dtype="int64"),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": np.asarray(ts_ns, dtype="int64").view("datetime64[ns]"),
        },
        columns=_COLS,
    )


def _dt64(s: pd.Series) -> np.ndarray:
    """Series -> datetime64[ns] array WITHOUT pd.to_datetime (which boxes
    every value into a Timestamp just to probe its conversion cache — the
    single hottest line of the old per-row path's profile)."""
    if s.dtype == "datetime64[ns]":
        return s.to_numpy()
    return s.astype("datetime64[ns]").to_numpy()


def _buf_encode(pdf: pd.DataFrame) -> str:
    if not len(pdf):
        return "[]"
    return json.dumps(
        [
            pdf["conv_id"].tolist(),
            pdf["turn_idx"].to_numpy(dtype="int64").tolist(),
            pdf["role"].tolist(),
            pdf["text"].tolist(),
            pdf["tool"].where(pdf["tool"].notna(), None).tolist(),
            _dt64(pdf["ts"]).view("int64").tolist(),
        ]
    )


def _finalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Coerce a release frame to the output schema's dtypes/column order."""
    out = pdf[_COLS].copy()
    if out["ts"].dtype != "datetime64[ns]":
        out["ts"] = out["ts"].astype("datetime64[ns]")
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out


def _release_logic(
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_timeout_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    next_idx, buffered = state.get if state.exists else (0, "[]")
    buf = _buf_decode(buffered)
    if gap_timeout_ms is not None and state.hasTimedOut:
        # conversation went silent with a gap: flush the buffer in turn_idx
        # order, skipping the turns that never arrived (bounded state)
        state.update(
            (int(buf["turn_idx"].max()) + 1 if len(buf) else next_idx, "[]")
        )
        state.setTimeoutDuration(gap_timeout_ms)
        if len(buf):
            yield _finalize(buf.sort_values("turn_idx", kind="mergesort"))
        return
    # merge: buffer first (it wins over redelivery), then arrivals in order
    # (first occurrence of a turn_idx wins within the batch — identical to
    # the former per-row "idx not in rows" rule)
    parts = [buf] if len(buf) else []
    for pdf in pdfs:
        live = pdf[pdf["turn_idx"] >= next_idx]
        if len(live):
            parts.append(live[_COLS])
    if parts:
        allf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        allf = allf[~allf["turn_idx"].duplicated(keep="first")]
        allf = allf.sort_values("turn_idx", kind="mergesort")
    else:
        allf = buf
    # maximal contiguous prefix: sorted unique ints match next_idx + arange
    # exactly on the releasable prefix and nowhere after the first gap
    idxs = allf["turn_idx"].to_numpy(dtype="int64", na_value=-1)
    k = int((idxs == next_idx + np.arange(len(idxs))).sum())
    released, remaining = allf.iloc[:k], allf.iloc[k:]
    state.update((next_idx + k, _buf_encode(remaining)))
    if gap_timeout_ms is not None:
        state.setTimeoutDuration(gap_timeout_ms)
    if k:
        yield _finalize(released)


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
    pairs = json.loads(buffered)
    eids = np.asarray([p[0] for p in pairs], dtype="int64")
    tss = np.asarray([p[1] for p in pairs], dtype="int64")
    if not state.hasTimedOut:
        for pdf in pdfs:
            new_e = pdf["event_id"].to_numpy(dtype="int64")
            ts_ns = _dt64(pdf["ts"])
            new_t = ts_ns.view("int64") // 1000
            # <= boundary means already released (crash replay) or late
            # beyond the watermark (dropped, the watermark contract);
            # buffer dedup by event_id handles within-window redelivery
            m = ~pd.isnull(ts_ns) & (new_t > boundary_us)
            if len(eids):
                m &= ~np.isin(new_e, eids)
            new_e, new_t = new_e[m], new_t[m]
            if len(new_e):
                _, first = np.unique(new_e, return_index=True)  # first wins
                eids = np.concatenate([eids, new_e[first]])
                tss = np.concatenate([tss, new_t[first]])
    wm_us = state.getCurrentWatermarkMs() * 1000
    ready = tss <= wm_us
    rel_e, rel_t = eids[ready], tss[ready]
    order = np.lexsort((rel_e, rel_t))  # (ts, event_id) release order
    rel_e, rel_t = rel_e[order], rel_t[order]
    out = None
    if len(rel_t):
        # gap rule as diff/cumsum: a session starts where the gap to the
        # previous released event exceeds SESSION_GAP_S
        gap_us = SESSION_GAP_S * 1_000_000
        starts = np.empty(len(rel_t), dtype=bool)
        starts[0] = last_ts_us is None or rel_t[0] - last_ts_us > gap_us
        starts[1:] = np.diff(rel_t) > gap_us
        sess = session_idx + np.cumsum(starts, dtype="int64")
        session_idx = int(sess[-1])
        last_ts_us = int(rel_t[-1])
        out = pd.DataFrame(
            {
                "event_id": rel_e,
                "user_id": np.full(len(rel_e), key[0], dtype="int64"),
                "ts": pd.to_datetime(rel_t, unit="us"),
                "session_idx": sess,
            }
        )
        eids, tss = eids[~ready], tss[~ready]
    boundary_us = max(boundary_us, wm_us)
    keep = np.argsort(eids, kind="stable")
    buf_pairs = np.stack([eids[keep], tss[keep]], axis=1).tolist() if len(eids) else []
    state.update((boundary_us, last_ts_us, session_idx, json.dumps(buf_pairs)))
    if len(eids):
        # wake this group on the next watermark advance even if no new
        # events arrive for it — buffered tails must not wait for traffic
        state.setTimeoutTimestamp(max(wm_us // 1000 + 1, 1))
    if out is not None:
        yield out


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
