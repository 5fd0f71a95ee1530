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


ANOMALY_OUT_SCHEMA = (
    "series string, bucket_id long, bucket_value double, z double, "
    "is_anomaly boolean"
)
_ANOM_STATE_SCHEMA = (
    "cur_bucket long, cur_sum double, hist_buckets array<long>, "
    "hist_sums array<double>"
)


def stateful_anomaly_zscore(
    events: DataFrame,
    *,
    bucket_us: int = 3600 * 1_000_000,
    window: int = 24,
    threshold: float = 3.0,
    emit_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of queries/timeseriesq.py::anomaly_rolling_zscore:
    per-series hourly bucket sums z-scored against the trailing
    ``window`` CLOSED buckets, held in the state store.

    ``events``: streaming DataFrame ``series string, ts_us long,
    value double``. A bucket closes when a later bucket's first event
    arrives (or the inactivity timeout fires); at close it is scored
    against the history ring — which never includes the bucket itself,
    same as the batch query's `ROWS BETWEEN window PRECEDING AND 1
    PRECEDING` frame — then appended to the ring (bounded at
    ``window`` entries per series, so state is O(series x window)
    regardless of stream length). Scored rows are emitted only once
    the ring is full, matching the batch twin's ``m == window`` gate.
    Late events for already-closed buckets are dropped (the watermark
    analogue; the batch query is the backfill path).

    At scale: state hash-partitions by series; a micro-batch touches
    only the series present in it plus timed-out ones.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout_ms = emit_timeout_ms if emit_timeout_ms is not None else max(
        bucket_us // 1000, 1
    )
    out_cols = ["series", "bucket_id", "bucket_value", "z", "is_anomaly"]

    def score(x: float, hist: list) -> tuple:
        import math

        m = len(hist)
        mean = sum(hist) / m
        var = max(sum(v * v for v in hist) / m - mean * mean, 0.0)
        z = round((x - mean) / math.sqrt(var + 1e-9), 4)
        return z, abs(z) >= threshold

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterable["pandas.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        (series,) = key

        def close(cur_b, cur_s, hb, hs, emit):
            if len(hb) >= window:
                z, flag = score(cur_s, hs[-window:])
                emit.append((series, cur_b, round(cur_s, 4), z, flag))
            hb = (hb + [cur_b])[-window:]
            hs = (hs + [cur_s])[-window:]
            return hb, hs

        if state.hasTimedOut:
            if state.exists:
                cur_b, cur_s, hb, hs = state.get
                emit: list = []
                if cur_b is not None:
                    hb, hs = close(cur_b, cur_s, list(hb), list(hs), emit)
                state.update((None, None, list(hb), list(hs)))
                if emit:
                    yield pd.DataFrame(emit, columns=out_cols)
            return

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_us")
        if state.exists:
            cur_b, cur_s, hb, hs = state.get
            hb, hs = list(hb), list(hs)
        else:
            cur_b, cur_s, hb, hs = None, None, [], []
        emit = []
        for ts, v in zip(batch["ts_us"], batch["value"]):
            b = int(ts) // bucket_us
            if cur_b is None:
                if hb and b <= hb[-1]:
                    continue  # late event for a closed bucket: drop
                cur_b, cur_s = b, float(v)
            elif b == cur_b:
                cur_s += float(v)
            elif b > cur_b:
                hb, hs = close(cur_b, cur_s, hb, hs, emit)
                cur_b, cur_s = b, float(v)
            # b < cur_b: late, drop
        state.update((cur_b, cur_s, hb, hs))
        state.setTimeoutDuration(timeout_ms)
        if emit:
            yield pd.DataFrame(emit, columns=out_cols)

    return events.groupBy("series").applyInPandasWithState(
        fold,
        ANOMALY_OUT_SCHEMA,
        _ANOM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


TOTALS_OUT_SCHEMA = "user_id long, n_events long, total_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime totals on Spark 4's `transformWithStateInPandas`
    — the successor API to `applyInPandasWithState` (explicit typed
    state handles, timers, TTL support) that the other stateful
    operators here will migrate to. State = one ValueState(n, total)
    per user; every micro-batch emits the user's updated running totals
    (Update output mode — the dashboard-feed shape).

    ``events``: streaming DataFrame ``user_id long, ts_us long,
    value double``. State is O(users); a micro-batch touches only the
    users present in it.

    Environment gate (same pattern as the multimodal decoders): the
    transformWithState protocol serializes state over a protobuf
    channel, so `google.protobuf` must be importable on the workers —
    raise loudly here rather than fail opaquely mid-query. Every other
    stateful operator in this module runs without it."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf on the "
            "workers (pip install protobuf); use stateful_sessionize / "
            "stateful_anomaly_zscore (applyInPandasWithState) otherwise"
        ) from exc
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("tot", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=TOTALS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
