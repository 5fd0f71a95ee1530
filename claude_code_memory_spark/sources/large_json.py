"""Streaming content extraction for huge JSON files (S6 content mode).

Reference semantics (analysis/json_parser.py:623-816): ijson streams the
known content arrays (topics/posts/articles/...) of a multi-GB JSON
dump item by item, emitting a documentation entity + implementation
chunk per item in bounded batches, never holding the whole document.

ijson is not in this container, so the same contract is met with a
buffered incremental scanner: fixed-size reads, string/escape-aware
bracket tracking, one top-level array element materialized at a time.
The Spark surface is a mapInPandas over FILE PATHS (not file contents —
the document never enters a DataFrame row), and the iterator-of-batches
protocol yields one small pandas batch per `batch_rows` items, so task
memory is bounded by (io buffer + one item + one batch) regardless of
file size. On a cluster the path must be on shared storage (same
requirement as the reference's local file read).

A file can't be split across tasks without a format-aware splitter, but
many files parallelize across tasks — pass several paths.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

CONTENT_ARRAYS = (
    "topics posts articles comments messages threads forums site_pages "
    "items content chunks".split()
)

CONTENT_RECORD_SCHEMA = (
    "entity_name string, entity_type string, content string, "
    "array_key string, item_index int, file_path string"
)


def iter_array_items(
    fh, array_key: str, *, bufsize: int = 65536
) -> Iterator[str]:
    """Yield the raw text of each top-level element of ``"array_key": [...]``
    reading `fh` in `bufsize` chunks. Memory: O(bufsize + largest item).

    Approximation vs ijson: the key is located textually (a key string
    embedded inside a VALUE could false-positive); exact enough for the
    reference's content dumps and documented here."""
    needle = f'"{array_key}"'
    window = ""
    # phase 1: find '"key"' then skip ws/':' to '['
    while True:
        chunk = fh.read(bufsize)
        if not chunk:
            return
        window += chunk
        idx = window.find(needle)
        if idx >= 0:
            rest = window[idx + len(needle):]
            j = 0
            while True:
                while j < len(rest) and rest[j] in " \t\r\n:":
                    j += 1
                if j < len(rest):
                    break
                more = fh.read(bufsize)
                if not more:
                    return
                rest += more
            if rest[j] != "[":
                return  # key exists but is not an array
            data = rest[j + 1:]
            break
        window = window[-len(needle):]  # boundary overlap only

    # phase 2: depth/string-aware element split
    depth = 0
    in_str = False
    esc = False
    buf: list[str] = []
    while True:
        for ch in data:
            if esc:
                buf.append(ch)
                esc = False
                continue
            if in_str:
                buf.append(ch)
                if ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
                buf.append(ch)
                continue
            if ch in "{[":
                depth += 1
                buf.append(ch)
                continue
            if ch in "}]":
                if depth == 0 and ch == "]":
                    item = "".join(buf).strip()
                    if item:
                        yield item
                    return
                depth -= 1
                buf.append(ch)
                continue
            if ch == "," and depth == 0:
                item = "".join(buf).strip()
                if item:
                    yield item
                buf = []
                continue
            buf.append(ch)
        data = fh.read(bufsize)
        if not data:
            item = "".join(buf).strip()
            if item:
                yield item
            return


def _entity_name(array_key: str, item: dict, index: int) -> str:
    """Reference naming (json_parser.py:474-509): chunk_number, then
    title-ish fields, then id fields, then the 1-based index."""
    base = array_key.rstrip("s")
    title = next(
        (
            str(item[f]).strip().replace("\n", " ").replace("\r", "")[:100]
            for f in ("title", "subject", "name", "headline")
            if isinstance(item.get(f), str) and item[f].strip()
        ),
        None,
    )
    if "chunk_number" in item:
        num = item["chunk_number"]
        return f"{base}_{num}_{title}" if title else f"{base}_{num}"
    if title:
        return f"{base}_{index + 1}_{title}"
    for f in ("id", "_id", "post_id", "article_id"):
        if f in item:
            return f"{base}_{item[f]}"
    return f"{base}_{index + 1}"


def _item_content(item: dict) -> str:
    """Reference content assembly (json_parser.py:511-547): body fields,
    Title: prefix, Author: suffix."""
    parts = [
        item[f].strip()
        for f in ("content", "body", "text", "message", "description")
        if isinstance(item.get(f), str) and item[f].strip()
    ]
    for f in ("title", "subject", "name", "headline"):
        if isinstance(item.get(f), str) and item[f].strip():
            parts.insert(0, f"Title: {item[f].strip()}")
            break
    for f in ("author", "user", "username", "created_by", "poster"):
        a = item.get(f)
        if isinstance(a, str):
            parts.append(f"Author: {a}")
            break
        if isinstance(a, dict) and "name" in a:
            parts.append(f"Author: {a['name']}")
            break
    return "\n\n".join(parts)


def stream_content_records(
    path: str,
    file_path: str,
    *,
    arrays: tuple[str, ...] | list[str] = CONTENT_ARRAYS,
    batch_rows: int = 500,
    max_items: int = 0,
) -> Iterator[list[dict]]:
    """Batches of content records from one JSON file, bounded memory."""
    n = 0
    batch: list[dict] = []
    for array_key in arrays:
        with open(path, encoding="utf-8", errors="replace") as fh:
            for i, text in enumerate(iter_array_items(fh, array_key)):
                if max_items and n >= max_items:
                    break
                try:
                    item = json.loads(text)
                except (json.JSONDecodeError, RecursionError):
                    continue
                if not isinstance(item, dict):
                    continue
                content = _item_content(item) or text[:2000]
                batch.append(
                    dict(
                        entity_name=_entity_name(array_key, item, i),
                        entity_type="documentation",
                        content=content,
                        array_key=array_key,
                        item_index=i,
                        file_path=file_path,
                    )
                )
                n += 1
                if len(batch) >= batch_rows:
                    yield batch
                    batch = []
        if batch:
            yield batch
            batch = []


def content_records_df(
    spark,
    json_paths: list[str] | str,
    *,
    arrays: tuple[str, ...] | list[str] = CONTENT_ARRAYS,
    batch_rows: int = 500,
    max_items: int = 0,
):
    """DataFrame of streamed content records for one or more JSON files.

    One task per file; each task yields one Arrow batch per `batch_rows`
    items (bounded memory however big the file is)."""
    import pandas as pd

    if isinstance(json_paths, str):
        json_paths = [json_paths]
    paths = spark.createDataFrame(
        [(p, p.rsplit("/", 1)[-1]) for p in json_paths], "path string, file_path string"
    ).repartition(len(json_paths))

    cols = [f.split(" ")[0] for f in CONTENT_RECORD_SCHEMA.split(", ")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                for batch in stream_content_records(
                    row["path"], row["file_path"],
                    arrays=arrays, batch_rows=batch_rows, max_items=max_items,
                ):
                    yield pd.DataFrame(batch, columns=cols)

    return paths.mapInPandas(run, CONTENT_RECORD_SCHEMA)
