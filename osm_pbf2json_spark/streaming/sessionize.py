"""Custom stateful streaming operator: per-key sessionization via
`applyInPandasWithState` (the pattern the engine uses when built-in
windowed aggregation can't express the semantics — gap-based sessions).

A session is a run of events for one key with event-time gaps < `gap_ms`.
Sessions are CLOSED (emitted) when a later event proves the gap; the
trailing open session stays in state until more data for the key arrives
(idiomatic for incremental ingestion: the next micro-batch or the next
run of the job closes it). This keeps the operator deterministic under
`availableNow` batch-style triggers — no wall-clock timers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, session_start long, session_end long, n_events int"
STATE_SCHEMA = "start long, last long, n int"


def _sessionize_fn(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ts = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["ts_ms"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last < gap_ms:
                last, n = t, n + 1
            else:
                closed.append((start, last, n))
                start, last, n = t, t, 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                [
                    {"key": key[0], "session_start": s, "session_end": e, "n_events": c}
                    for s, e, c in closed
                ]
            )

    return fn


def sessionize(stream_df: DataFrame, gap_ms: int = 60_000) -> DataFrame:
    """stream_df: streaming frame with (key string, ts_ms long)."""
    return stream_df.groupBy("key").applyInPandasWithState(
        _sessionize_fn(gap_ms),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
