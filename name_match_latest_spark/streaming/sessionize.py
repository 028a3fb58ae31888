"""Streaming gap-based sessionization — the stateful-stream twin of
`operators.events.sessionize` (30-min-inactivity sessions over an
interaction/crawl log), built on `applyInPandasWithState`.

Semantics: identical to the batch operator when events arrive in
event-time order per user ACROSS batches (within a batch any order is
fine — the update function sorts).  A session closes when a later
event of the same user arrives more than ``gap_sec`` after it; closed
sessions are emitted exactly once, in (user, session_seq) order.  The
still-open tail session of each user lives in the group state between
micro-batches.  Idle-user flushing is the stream-end concern batch
jobs don't have: pass ``timeout='processing'`` to emit a user's open
session after ``gap_sec`` of wall-clock silence, or close the stream
with a sentinel event beyond the gap (the deterministic test path —
ProcessingTimeTimeout firing depends on trigger wall-clock timing).

Scale design: state per user is ONE fixed-size tuple (seq, start,
last, n, sum) — not the session's events — so state size is
O(active_users), not O(events); the shuffle key is user_id exactly
like the batch plan.  Timestamps are int64 microseconds end-to-end
(pandas ns -> //1000), matching the batch operator's exact-integer
gap arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

STREAM_SESSION_SCHEMA = (
    "user_id long, session_seq long, start_us long, end_us long, "
    "n_events long, sum_value double"
)


def stream_sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    timeout: str = "none",
) -> DataFrame:
    """``events`` is a STREAMING frame with columns (user_id long,
    ts timestamp/timestamp_ntz, value double).  Returns closed
    sessions (append semantics) with micros bounds —
    STREAM_SESSION_SCHEMA."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if timeout not in ("none", "processing"):
        raise ValueError("timeout must be 'none' or 'processing'")
    gap_us = int(gap_sec) * 1_000_000

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_seq", LongType()),
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("seq", LongType()),
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
            StructField("sum", DoubleType()),
        ]
    )

    def update(key, pdf_iter, state):
        (user,) = key
        if timeout == "processing" and state.hasTimedOut:
            seq, start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_seq": [seq],
                    "start_us": [start],
                    "end_us": [last],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
            return

        frames = [pdf for pdf in pdf_iter if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
        pdf = pdf.sort_values("ts", kind="mergesort")
        us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        vals = pdf["value"].fillna(0.0).to_numpy()

        if state.exists:
            seq, start, last, n, s = state.get
        else:
            seq, start, last, n, s = 0, None, None, 0, 0.0

        # vectorized session grouping (no per-row Python): break flags
        # via diff, then one aggregate per SESSION group
        import numpy as np

        brk = np.empty(len(us), dtype=bool)
        brk[0] = last is None or us[0] - last > gap_us
        brk[1:] = np.diff(us) > gap_us
        gid = np.cumsum(brk)  # 0 = continues the open session
        gdf = pd.DataFrame({"g": gid, "us": us, "v": vals})
        agg = gdf.groupby("g", sort=True).agg(
            start=("us", "first"),
            end=("us", "last"),
            n=("us", "size"),
            sum=("v", "sum"),
        )

        out = {k: [] for k in ("seq", "start", "end", "n", "sum")}
        for g in agg.itertuples():  # one row per session, not per event
            if g.Index == 0:  # merge into the carried-over open session
                n += int(g.n)
                s += float(g.sum)
                last = int(g.end)
            else:
                if last is not None:  # close the previous session
                    out["seq"].append(seq)
                    out["start"].append(start)
                    out["end"].append(last)
                    out["n"].append(n)
                    out["sum"].append(s)
                seq += 1
                start, last = int(g.start), int(g.end)
                n, s = int(g.n), float(g.sum)
        state.update((seq, start, last, n, s))
        if timeout == "processing":
            state.setTimeoutDuration(gap_sec * 1000)
        if out["seq"]:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(out["seq"]),
                    "session_seq": out["seq"],
                    "start_us": out["start"],
                    "end_us": out["end"],
                    "n_events": out["n"],
                    "sum_value": out["sum"],
                }
            )

    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout == "processing"
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=conf,
    )
