"""Micro-bench: vectorized stateful buffer merge vs the legacy per-row loop.

Round-3 VERDICT #3: the stateful streaming ops iterated rows in Python
(``pdf.to_dict("records")`` / per-row zip inside applyInPandasWithState),
bounded by the out-of-order window per key but hot on conversations with
thousands of buffered turns.  This probe replays the worst case — ONE key
with a 10k-turn buffer blocked on turn 0, then the unblocking arrival — on
both the shipped vectorized ``_release_logic`` and a faithful copy of the
legacy per-row implementation, asserts identical release output, and prints
the speedup (the round-3 "done" bar is >= 3x).

Run: python scripts/probe_stateful_merge.py [n_turns=10000] [reps=5]
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from plume_spark.streaming.stateful import (  # noqa: E402
    _COLS,
    _release_logic,
    _sessionize_logic,
)

SESSION_GAP_S = 1800


class FakeState:
    def __init__(self, value=None):
        self.exists = value is not None
        self.hasTimedOut = False
        self._v = value
        self._wm_ms = 0

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def setTimeoutDuration(self, ms):
        pass

    def setTimeoutTimestamp(self, ms):
        pass

    def getCurrentWatermarkMs(self):
        return self._wm_ms


# --- faithful copy of the round-3 per-row implementation (legacy baseline) --


def _legacy_to_pdf(out: list) -> pd.DataFrame:
    pdf = pd.DataFrame(out, columns=_COLS)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def _legacy_release_logic(
    pdfs: Iterator[pd.DataFrame], state, gap_timeout_ms=None
) -> Iterator[pd.DataFrame]:
    next_idx, buffered = state.get if state.exists else (0, "[]")
    rows: dict[int, dict[str, Any]] = {r["turn_idx"]: r for r in json.loads(buffered)}
    for pdf in pdfs:
        for r in pdf.to_dict("records"):
            idx = int(r["turn_idx"])
            if idx >= next_idx and idx not in rows:
                ts = r["ts"]
                r["ts"] = None if pd.isnull(ts) else ts.isoformat()
                r["turn_idx"] = idx
                rows[idx] = r
    out = []
    while next_idx in rows:
        out.append(rows.pop(next_idx))
        next_idx += 1
    state.update((next_idx, json.dumps(list(rows.values()))))
    if out:
        yield _legacy_to_pdf(out)


def _legacy_sessionize_logic(key, pdfs, state):
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
                if ts_us > boundary_us and eid not in rows:
                    rows[int(eid)] = ts_us
    wm_us = state.getCurrentWatermarkMs() * 1000
    ready = sorted(((ts_us, eid) for eid, ts_us in rows.items() if ts_us <= wm_us))
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
    if out:
        pdf = pd.DataFrame(out, columns=["event_id", "user_id", "ts", "session_idx"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
        yield pdf


# --- the hot-key scenario ---------------------------------------------------


def _turns(idxs) -> pd.DataFrame:
    n = len(idxs)
    return pd.DataFrame(
        {
            "conv_id": np.full(n, "hot-conv"),
            "turn_idx": np.asarray(idxs, dtype="int32"),
            "role": np.where(np.asarray(idxs) % 2 == 0, "user", "assistant"),
            "text": pd.Series([f"turn text {i} " * 4 for i in idxs]),
            "tool": pd.Series([None] * n, dtype=object),
            "ts": pd.to_datetime(np.asarray(idxs, dtype="int64"), unit="s"),
        },
        columns=_COLS,
    )


def _canon_release(outs) -> list[tuple]:
    rows = []
    for o in outs:
        for r in o.itertuples(index=False):
            rows.append(
                (r.conv_id, int(r.turn_idx), r.role, r.text, r.tool, pd.Timestamp(r.ts))
            )
    return rows


def bench_release(n: int, reps: int) -> dict:
    # micro-batch 1 buffers turns 1..n (turn 0 missing, nothing releases);
    # micro-batch 2 delivers turn 0 and the whole buffer drains in order.
    res = {}
    blocked, unblocker = _turns(range(1, n + 1)), _turns([0])
    for name, fn in (("vectorized", _release_logic), ("legacy", _legacy_release_logic)):
        best, outs = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            st = FakeState()
            o1 = list(fn(iter([blocked]), st))
            o2 = list(fn(iter([unblocker]), st))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            outs = (o1, o2, st._v[0])
        assert outs[0] == [] and outs[2] == n + 1
        res[name] = {"sec": best, "out": _canon_release(outs[1])}
    assert res["vectorized"]["out"] == res["legacy"]["out"], "release outputs differ"
    assert [r[1] for r in res["vectorized"]["out"]] == list(range(n + 1))
    return res


def bench_sessionize(n: int, reps: int) -> dict:
    # one user, n buffered events below the watermark -> all release at once
    eids = np.arange(n, dtype="int64")
    # shuffled arrival order; +1s keeps everything above the initial wm=0
    ts = pd.to_datetime((eids * 7) % (n * 5) + 1, unit="s")
    batch = pd.DataFrame({"event_id": eids, "ts": ts})
    res = {}
    for name, fn in (
        ("vectorized", _sessionize_logic),
        ("legacy", _legacy_sessionize_logic),
    ):
        best, out = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            st = FakeState()
            o1 = list(fn((1,), iter([batch]), st))  # wm=0: everything buffers
            st._wm_ms = 10**12
            o2 = list(fn((1,), iter([]), st))  # watermark passes: all release
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            out = (o1, o2)
        assert out[0] == []
        rel = out[1][0]
        res[name] = {
            "sec": best,
            "out": [tuple(r) for r in rel.itertuples(index=False)],
        }
    assert res["vectorized"]["out"] == res["legacy"]["out"], "session outputs differ"
    return res


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rel = bench_release(n, reps)
    ses = bench_sessionize(n, reps)
    report = {
        "n_turns": n,
        "release_vectorized_sec": round(rel["vectorized"]["sec"], 4),
        "release_legacy_sec": round(rel["legacy"]["sec"], 4),
        "release_speedup": round(rel["legacy"]["sec"] / rel["vectorized"]["sec"], 2),
        "sessionize_vectorized_sec": round(ses["vectorized"]["sec"], 4),
        "sessionize_legacy_sec": round(ses["legacy"]["sec"], 4),
        "sessionize_speedup": round(
            ses["legacy"]["sec"] / ses["vectorized"]["sec"], 2
        ),
        "outputs_identical": True,
    }
    print(json.dumps(report))
