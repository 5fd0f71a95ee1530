"""Streaming-operator profile (r13, verdict item 7): the four streaming
modules had never been profiled in 12 rounds. Drives each operator with
a synthetic but realistic event feed and records per-micro-batch
progress metrics (processedRowsPerSecond, batchDuration, state rows) —
the numbers that say whether the stateful operators keep up with a real
event rate.

Sections:
- stateful_sessionize  : rate source, U users, processing-time batches
- stateful_anomaly     : rate source, S series
- debounce/dedup       : file JSONL feed, availableNow, foreachBatch
                         coalesce_events into a noop-equivalent sink
- pipeline (watch)     : file events over a tiny project, foreachBatch →
                         CodeMemoryEngine.index (the batch pipeline —
                         its cost is the reindex bench's, recorded here
                         for the per-batch latency shape)

Writes streaming_profile.json at the repo root.
Usage: python tools/streaming_profile.py [--rate N] [--seconds S]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from claude_code_memory_spark.session import get_spark  # noqa: E402


def _drain_progress(q, seconds: float) -> list[dict]:
    """Run the query for ``seconds``, then stop and return progress rows."""
    time.sleep(seconds)
    prog = [json.loads(p) for p in q.recentProgress]
    q.stop()
    return prog


def _summ(progress: list[dict]) -> dict:
    rows = [p for p in progress if p.get("numInputRows", 0) > 0]
    if not rows:
        return {"batches": 0}
    dur = [p["batchDuration"] for p in rows]
    rps = [p.get("processedRowsPerSecond", 0.0) for p in rows]
    st = [
        sum(s.get("numRowsTotal", 0) for s in p.get("stateOperators", []))
        for p in rows
    ]
    return {
        "batches": len(rows),
        "input_rows": sum(p["numInputRows"] for p in rows),
        "batch_ms_median": sorted(dur)[len(dur) // 2],
        "batch_ms_max": max(dur),
        "processed_rows_per_sec_median": round(sorted(rps)[len(rps) // 2], 1),
        "state_rows_final": st[-1] if st else None,
    }


def main() -> None:
    rate = int(sys.argv[sys.argv.index("--rate") + 1]) if "--rate" in sys.argv else 5000
    seconds = (
        float(sys.argv[sys.argv.index("--seconds") + 1])
        if "--seconds" in sys.argv
        else 45.0
    )
    spark = get_spark("streaming_profile")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    out: dict = {
        "rate_rows_per_sec": rate,
        "run_seconds": seconds,
        "load1_at_start": round(os.getloadavg()[0], 2),
    }
    ckroot = tempfile.mkdtemp(prefix="stream_prof_")

    # -- stateful sessionize over a rate source -------------------------
    from claude_code_memory_spark.streaming.stateful import (
        stateful_anomaly_zscore,
        stateful_sessionize,
    )

    users = 2_000
    ev = (
        spark.readStream.format("rate").option("rowsPerSecond", rate).load()
        .select(
            (F.col("value") % users).alias("user_id"),
            # compress time 3600x so sessions actually close mid-run
            (F.unix_micros("timestamp") * 3600).alias("ts_us"),
            (F.col("value") % 97).cast("double").alias("value"),
        )
    )
    q = (
        stateful_sessionize(ev, gap_us=300 * 1_000_000, emit_timeout_ms=2000)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(ckroot, "sess"))
        .trigger(processingTime="2 seconds")
        .start()
    )
    out["sessionize"] = _summ(_drain_progress(q, seconds))

    # -- stateful anomaly z-score ---------------------------------------
    series = 500
    ev2 = (
        spark.readStream.format("rate").option("rowsPerSecond", rate).load()
        .select(
            F.concat(F.lit("s"), (F.col("value") % series)).alias("series"),
            (F.unix_micros("timestamp") * 3600).alias("ts_us"),
            (F.col("value") % 11).cast("double").alias("value"),
        )
    )
    q = (
        stateful_anomaly_zscore(
            ev2, bucket_us=600 * 1_000_000, window=4, emit_timeout_ms=2000
        )
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(ckroot, "anom"))
        .trigger(processingTime="2 seconds")
        .start()
    )
    out["anomaly_zscore"] = _summ(_drain_progress(q, seconds))

    # -- debounce / dedup over a JSONL file feed ------------------------
    from claude_code_memory_spark.streaming.debounce import (
        coalesce_events,
        deduped_stream_within_watermark,
    )
    from claude_code_memory_spark.schemas import EVENTS as EV_SCHEMA  # noqa: F401

    evdir = os.path.join(ckroot, "events_in")
    os.makedirs(evdir)
    n_files, per_file = 20, 5_000
    t0 = time.time()
    for i in range(n_files):
        with open(os.path.join(evdir, f"ev{i:03d}.jsonl"), "w") as fh:
            for j in range(per_file):
                fh.write(
                    json.dumps(
                        {
                            "file_path": f"src/mod{(i * per_file + j) % 700}.py",
                            "event_type": "modified",
                            "event_time": f"2031-01-01T00:{i:02d}:{j % 60:02d}.000Z",
                            "sha256": f"h{(i * per_file + j) % 9_000}",
                        }
                    )
                    + "\n"
                )
    out["debounce_feed_write_sec"] = round(time.time() - t0, 2)
    stream = (
        spark.readStream.schema(
            "file_path string, event_type string, event_time timestamp, sha256 string"
        ).json(evdir)
    )
    deduped = deduped_stream_within_watermark(stream)
    batches: list[tuple[int, float]] = []

    def sink(df, epoch):
        t = time.time()
        n = coalesce_events(df).count()
        batches.append((n, round(time.time() - t, 3)))

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(ckroot, "deb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out["debounce"] = {
        "input_events": n_files * per_file,
        "batches": len(batches),
        "coalesced_rows": sum(n for n, _ in batches),
        "foreachbatch_sec": [s for _, s in batches],
    }

    # -- watch pipeline over a tiny project -----------------------------
    from claude_code_memory_spark.api import CodeMemoryEngine
    from claude_code_memory_spark.streaming.pipeline import start_watch

    proj = os.path.join(ckroot, "proj")
    os.makedirs(proj)
    for i in range(6):
        with open(os.path.join(proj, f"m{i}.py"), "w") as fh:
            fh.write(f"def f{i}(x):\n    return x + {i}\n")
    store = os.path.join(ckroot, "store")
    eng = CodeMemoryEngine(spark, store)
    eng.index(proj)  # initial build outside the stream
    wdir = os.path.join(ckroot, "watch_events")
    os.makedirs(wdir)
    lat: list[float] = []
    t0 = time.time()
    with open(os.path.join(proj, "m0.py"), "a") as fh:
        fh.write("def g(y):\n    return y\n")
    with open(os.path.join(wdir, "e0.jsonl"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "file_path": "m0.py",
                    "event_type": "modified",
                    "event_time": "2031-01-01T00:00:00.000Z",
                    "sha256": "x0",
                }
            )
            + "\n"
        )
    q = start_watch(eng, wdir, proj)
    # wait for exactly one non-empty batch to complete
    deadline = time.time() + 180
    done = False
    while time.time() < deadline and not done:
        time.sleep(1)
        for p in q.recentProgress:
            pr = json.loads(p)
            if pr.get("numInputRows", 0) > 0:
                lat.append(pr["batchDuration"] / 1000.0)
                done = True
    q.stop()
    out["watch_one_file_batch_sec"] = lat[0] if lat else None
    out["watch_wall_to_first_batch_sec"] = round(time.time() - t0, 2)

    import shutil

    shutil.rmtree(ckroot, ignore_errors=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "streaming_profile.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
