"""File-level data skipping for TableStore — the public-knowledge core of
Delta/Iceberg data skipping: a per-snapshot manifest of per-file column
min/max stats, consulted at read time to drop files a predicate provably
cannot match, before Spark ever lists or opens them.

Why this exists when parquet already has row-group stats: row-group
pruning happens AFTER the scan task has opened the file's footer — at
100 TB with millions of files, the win is never scheduling those tasks
at all (and never listing the files into the scan). Delta stores exactly
these stats in its transaction log for the same reason.

Stats are collected from parquet FOOTERS only (metadata IO, ~KB per
file, never the data pages), distributed over the executors via
mapInPandas on the file-path list — the same iterator pattern as
sources/large_json.py — so stats collection scales with file count, not
data volume. The manifest itself is metadata-sized (one row per file x
stat column) and lives as `_filestats.json` inside the snapshot dir,
written before the TableStore commit so a crash mid-write leaves no
half-trusted manifest (the commit pointer never references the dir).

Pruning semantics are conservative: a file is kept unless its stats
PROVE no row can match — missing stats, unknown columns, all-null
ranges, and unsupported predicate shapes all keep the file. The
predicate is re-applied as a real filter after the pruned scan, so
skipping is a pure IO optimization, never a correctness dependency.
"""

from __future__ import annotations

import json
import os
from datetime import date, datetime
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_FILE = "_filestats.json"

# predicate ops supported by the pruner (plus "in" with a value list);
# anything else keeps the file
_OPS = ("=", "<", "<=", ">", ">=")


def _norm(v):
    """Normalize a stat/predicate value to a JSON-able, totally-ordered
    primitive. Timestamps/dates become ISO strings (lexicographic order
    == chronological order for a fixed format); bytes and complex types
    return None (column excluded from skipping)."""
    if isinstance(v, bool):
        return None  # min/max over bools is not a useful skip signal
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    try:  # numpy scalars
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
    except Exception:
        pass
    return None


def _footer_stats_batch(paths: Iterable[str]) -> Iterable[dict]:
    """Per-file column min/max/null-count from the parquet footer,
    merged across row groups. Runs on executors."""
    import pyarrow.parquet as pq

    for path in paths:
        out: dict[str, dict] = {}
        rows = 0
        try:
            md = pq.ParquetFile(path).metadata
        except Exception:
            yield {"file": path, "rows": None, "cols": {}}
            continue
        rows = md.num_rows
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if "." in name:  # nested leaves: skip
                    continue
                st = col.statistics
                entry = out.setdefault(
                    name, {"min": None, "max": None, "nulls": 0, "ok": True}
                )
                if st is None or not st.has_min_max:
                    # a row group without stats poisons the column for
                    # this file: its rows could be anything
                    entry["ok"] = False
                    continue
                try:
                    # pyarrow refuses stat extraction for some physical
                    # types (e.g. decimals stored as fixed-len byte arrays)
                    mn, mx = _norm(st.min), _norm(st.max)
                except Exception:
                    entry["ok"] = False
                    continue
                if mn is None or mx is None:
                    entry["ok"] = False
                    continue
                entry["min"] = mn if entry["min"] is None else min(entry["min"], mn)
                entry["max"] = mx if entry["max"] is None else max(entry["max"], mx)
                if st.null_count is not None:
                    entry["nulls"] += st.null_count
        cols = {
            k: {"min": v["min"], "max": v["max"], "nulls": v["nulls"]}
            for k, v in out.items()
            if v["ok"] and v["min"] is not None
        }
        yield {"file": path, "rows": rows, "cols": cols}


def collect_file_stats(spark: SparkSession, snapshot_dir: str) -> dict:
    """Build the stats manifest for every parquet part under
    ``snapshot_dir`` (recursing into partition subdirs) and write it as
    `_filestats.json` in that dir. Footer reads are distributed via
    mapInPandas over the path list."""
    paths = []
    for root, _dirs, files in os.walk(snapshot_dir):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                paths.append(os.path.join(root, f))
    if not paths:
        manifest = {"files": {}}
    elif len(paths) <= 128:
        # driver-side fast path: a local footer read is ~1-3 ms, a Spark
        # job ~0.7 s of scheduling — measured 6.4 s of a 15.5 s write
        # stage going to 9 stats jobs over ≤ 96 files each (r9 write
        # profile). 128 footers ≈ 0.3 s driver-side; the distributed
        # path stays for snapshots that are genuinely many-file (object
        # storage at 100 TB, where listing alone argues for executors).
        manifest = {
            "files": {
                os.path.relpath(r["file"], snapshot_dir): r
                for r in _footer_stats_batch(paths)
            }
        }
    else:

        def batches(it):
            import pandas

            for pdf in it:
                rows = list(_footer_stats_batch(pdf["path"].tolist()))
                yield pandas.DataFrame({"j": [json.dumps(r) for r in rows]})

        pdf = (
            spark.createDataFrame([(p,) for p in paths], "path string")
            .repartition(min(len(paths), 64))
            .mapInPandas(batches, "j string")
        )
        manifest = {
            "files": {
                os.path.relpath(r["file"], snapshot_dir): r
                for r in (json.loads(x["j"]) for x in pdf.collect())
            }
        }
    for r in manifest["files"].values():
        r.pop("file", None)
    tmp = os.path.join(snapshot_dir, STATS_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(snapshot_dir, STATS_FILE))
    return manifest


def load_file_stats(snapshot_dir: str) -> dict | None:
    path = os.path.join(snapshot_dir, STATS_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _file_may_match(cols: dict, predicates: list[tuple]) -> bool:
    """Conservative check: False only when stats PROVE the conjunction of
    predicates matches no row in the file."""
    for pred in predicates:
        col, op, value = pred
        st = cols.get(col)
        if st is None:
            continue
        if op == "in":
            vals = [_norm(v) for v in value]
            if any(v is None for v in vals) or not vals:
                continue
            mn, mx = st["min"], st["max"]
            same_kind = all(isinstance(v, str) == isinstance(mn, str) for v in vals)
            if not same_kind:
                continue
            try:
                if all(v < mn or v > mx for v in vals):
                    return False
            except TypeError:
                pass
            continue
        value = _norm(value)
        if value is None or op not in _OPS:
            continue  # unknown → cannot exclude
        mn, mx = st["min"], st["max"]
        if type(mn) is str and not isinstance(value, str):
            continue  # cross-type comparison: don't trust it
        if not isinstance(mn, str) and isinstance(value, str):
            continue
        try:
            if op == "=" and (value < mn or value > mx):
                return False
            if op == "<" and mn >= value:
                return False
            if op == "<=" and mn > value:
                return False
            if op == ">" and mx <= value:
                return False
            if op == ">=" and mx < value:
                return False
        except TypeError:
            continue
    return True


def prune_files(manifest: dict, predicates: list[tuple]) -> tuple[list[str], int]:
    """(surviving relative paths, total file count)."""
    files = manifest.get("files", {})
    kept = [
        rel
        for rel, entry in files.items()
        if _file_may_match(entry.get("cols", {}), predicates)
    ]
    return kept, len(files)


def _predicate_column(pred: tuple):
    col, op, value = pred
    c = F.col(col)
    if op == "=":
        return c == F.lit(value)
    if op == "<":
        return c < F.lit(value)
    if op == "<=":
        return c <= F.lit(value)
    if op == ">":
        return c > F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    if op == "in":
        vals = list(value)
        if not vals:  # empty IN-list matches nothing
            return F.lit(False)
        return c.isin(*vals)
    raise ValueError(f"unsupported predicate op: {op!r}")


def pruned_read(store, table: str, predicates: list[tuple]) -> DataFrame | None:
    """TableStore read that consults each snapshot's stats manifest and
    scans only files the predicates might match; the predicates are then
    applied as a real filter, so the result is EXACTLY
    ``store.read(table).filter(conjunction)`` — skipping is IO-only.

    ``predicates``: [(column, op, literal)] with op in {=, <, <=, >, >=},
    AND-combined. Snapshots without a manifest scan fully (honest
    fallback). Returns (DataFrame, files_scanned, files_total) via the
    `.attrs`-free route: see `pruned_read_stats` for the counts."""
    df, _kept, _total = pruned_read_stats(store, table, predicates)
    return df


def pruned_read_stats(store, table: str, predicates: list[tuple]):
    meta = store._manifest(table)
    if meta is None:
        return None, 0, 0

    def fresh_reader():
        # a NEW reader per scan: DataFrameReader.option mutates in
        # place, so a basePath set for one snapshot's file-list read
        # would leak into the next snapshot's full-dir fallback
        r = store.spark.read
        if "schema" in meta:
            from pyspark.sql.types import StructType

            r = r.schema(StructType.fromJson(json.loads(meta["schema"])))
        return r

    parts = []  # (snapshot ordinal, DataFrame)
    kept_n = 0
    total_n = 0
    cond = None
    for p in predicates:
        c = _predicate_column(p)
        cond = c if cond is None else (cond & c)
    for ord_i, snap in enumerate(meta["snapshots"]):
        snap_dir = os.path.join(store.root, table, snap)
        manifest = load_file_stats(snap_dir)
        if manifest is None:
            parts.append((ord_i, fresh_reader().parquet(snap_dir)))
            # unknown file count: count parts for honest reporting
            n = sum(
                1
                for _r, _d, fs in os.walk(snap_dir)
                for f in fs
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            kept_n += n
            total_n += n
            continue
        kept, total = prune_files(manifest, predicates)
        kept_n += len(kept)
        total_n += total
        if kept:
            parts.append(
                # basePath recovers partition columns (chunk_type=... dir
                # values) when scanning an explicit file list inside a
                # partitioned snapshot — without it they'd read as NULL
                (
                    ord_i,
                    fresh_reader().option("basePath", snap_dir).parquet(
                        *[os.path.join(snap_dir, rel) for rel in kept]
                    ),
                )
            )
    if not parts:
        # everything pruned: empty frame with the table schema
        empty = store.read(table).limit(0)
        return (empty.filter(cond) if cond is not None else empty), kept_n, total_n
    tss = meta.get("tombstones") or []
    if any(tss):
        # delta-merge survivor rule (r12): mirror TableStore._assemble —
        # a tombstoned file_path kills rows in EARLIER snapshots only
        from pyspark.sql import functions as F
        from pyspark.sql.types import StringType, StructField, StructType

        rows = None
        for ord_i, p in parts:
            p = p.withColumn("__snap_ord", F.lit(ord_i))
            rows = p if rows is None else rows.unionByName(p)
        ts_schema = StructType([StructField("file_path", StringType())])
        ts = None
        for ord_i, t in enumerate(tss):
            if not t:
                continue
            tp = (
                store.spark.read.schema(ts_schema)
                .parquet(os.path.join(store.root, table, t))
                .withColumn("__ts_ord", F.lit(ord_i))
            )
            ts = tp if ts is None else ts.unionByName(tp)
        last = ts.groupBy(F.col("file_path").alias("__ts_fp")).agg(
            F.max("__ts_ord").alias("__ts_ord")
        )
        df = (
            rows.join(
                F.broadcast(last), rows["file_path"] == F.col("__ts_fp"), "left"
            )
            .filter(
                F.col("__ts_ord").isNull()
                | (F.col("__snap_ord") >= F.col("__ts_ord"))
            )
            .drop("__snap_ord", "__ts_fp", "__ts_ord")
        )
    else:
        df = parts[0][1]
        for _ord, p in parts[1:]:
            df = df.unionByName(p)
    if cond is not None:
        df = df.filter(cond)
    return df, kept_n, total_n
