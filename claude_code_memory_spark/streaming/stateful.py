"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only stateful stream logic is the watcher's debounce
thread plus chat sessionization on inactivity (ST2/ST8,
watcher/debounce.py:149-260, chat/parser.py:272-288) — both wall-clock,
single-process. This module is the cluster-scale form: state lives in the
state store (checkpointed, partitioned by key), an Arrow-batched pandas
function folds each micro-batch into it, and inactivity timeouts flush
completed sessions.

Scale notes: state is hash-partitioned by user — 1000 executors each hold
1/1000th of open sessions; a micro-batch only touches keys present in it
plus timed-out keys. Timeout flushing is how sessions complete without
new data arriving — the exact semantics the reference implements with a
background timer thread (debounce.py:164-181), minus the single point of
failure.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

from pyspark.sql import DataFrame

SESSION_OUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start long, end long, n long, total double"


def stateful_sessionize(
    events: DataFrame,
    gap_us: int = 3600 * 1_000_000,
    *,
    emit_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming inactivity-gap sessionization with explicit state.

    ``events`` is a *streaming* DataFrame with columns
    ``user_id long, ts_us long, value double``. A session closes when a
    later event for the same user arrives >= gap_us after the session's
    last event, or when the processing-time timeout fires with no new
    data (default: gap_us converted to ms). Completed sessions are
    appended; open sessions stay in the state store.

    Batch twin (identical math, oracle-checked): operators/sessions.py /
    queries/sessionsq.py::sessionize_events.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout_ms = emit_timeout_ms if emit_timeout_ms is not None else max(gap_us // 1000, 1)

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable["pandas.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        cols = [
            "user_id",
            "session_start_us",
            "session_end_us",
            "n_events",
            "total_value",
        ]
        if state.hasTimedOut:
            # inactivity flush: no new events for this user
            if state.exists:
                start, end, n, total = state.get
                state.remove()
                yield pd.DataFrame([(user_id, start, end, n, total)], columns=cols)
            return

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_us")
        if state.exists:
            start, end, n, total = state.get
        else:
            start = end = None
            n, total = 0, 0.0
        closed = []
        for ts, v in zip(batch["ts_us"], batch["value"]):
            ts = int(ts)
            if start is None:
                start, end, n, total = ts, ts, 1, float(v)
            elif ts - end >= gap_us:
                closed.append((user_id, start, end, n, total))
                start, end, n, total = ts, ts, 1, float(v)
            else:
                end, n, total = ts, n + 1, total + float(v)
        state.update((start, end, n, total))
        state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fold,
            SESSION_OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
