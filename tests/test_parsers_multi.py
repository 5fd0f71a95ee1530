"""Tests for the non-Python parsers (markdown chunking, JS, JSON/YAML/
CSV/INI) and the chat pipeline — mirroring the reference's unit cases
(test_parser.py:266-419 markdown; javascript_parser coverage)."""

import pytest
import json
import textwrap

from pyspark.sql import functions as F

from claude_code_memory_spark.sources.config_parsers import (
    parse_csv_source,
    parse_ini_source,
    parse_json_source,
    parse_yaml_source,
)
from claude_code_memory_spark.sources.javascript_parser import parse_javascript_source
from claude_code_memory_spark.sources.markdown_parser import (
    pack_chunks,
    parse_markdown_source,
    parse_sections,
)


def _by_kind(recs):
    ent = {r["entity_name"]: r for r in recs if r["record_kind"] == "entity"}
    rel = {(r["from_entity"], r["relation_type"], r["to_entity"]) for r in recs if r["record_kind"] == "relation"}
    impl = [r for r in recs if r["record_kind"] == "implementation"]
    return ent, rel, impl


def test_markdown_sections_and_headers():
    src = textwrap.dedent(
        """
        Intro paragraph before any heading.

        # Title
        Some text.

        ## Section A
        More text here.

        ```python
        # not a heading inside code fence
        x = 1
        ```

        ## Section B
        Final text.
        """
    )
    sections = parse_sections(src)
    headings = [s["heading"] for s in sections]
    assert headings == [None, "Title", "Section A", "Section B"]
    # fenced pseudo-heading must not split a section
    assert "# not a heading inside code fence" in sections[2]["text"]

    recs = parse_markdown_source("doc.md", src)
    ent, rel, impl = _by_kind(recs)
    assert ent["Title"]["entity_type"] == "documentation"
    assert ("doc.md", "contains", "Section A") in rel
    assert len(impl) >= 1  # packed chunks


def test_markdown_greedy_packing_budget():
    # 30 sections of ~100 tokens → chunks near the 800-token target
    sections = [
        {"heading": f"S{i}", "level": 2, "text": "word " * 80 + f"s{i}", "tokens": 101}
        for i in range(30)
    ]
    chunks = pack_chunks(sections)
    assert len(chunks) > 1
    # every chunk within max budget (+overlap tail)
    assert all(c["tokens"] <= 1000 + 100 for c in chunks)
    # chunks (except maybe the last) are near-target packed: >= 4 sections
    assert all(len(c["headings"]) >= 4 for c in chunks[:-1])
    # overlap: chunk i+1 contains the tail of chunk i's final section
    assert chunks[0]["headings"][-1].lower() not in ("",)
    tail_marker = "s" + chunks[0]["headings"][-1][1:].lower()
    assert tail_marker in chunks[1]["content"].lower()


def test_markdown_oversized_section_split():
    sections = [{"heading": "Big", "level": 1, "text": "para " * 2000, "tokens": 2500}]
    chunks = pack_chunks(sections)
    assert len(chunks) >= 2
    # bound: max_tokens + overlap tail (100) + join separators
    assert all(c["tokens"] <= 1000 + 100 + 8 for c in chunks)


def test_javascript_entities():
    src = textwrap.dedent(
        """
        import React from 'react';
        import { useState, useEffect } from 'react';
        const axios = require('axios');

        export function fetchData(url) {
          return axios.get(url);
        }

        const Widget = (props) => {
          return null;
        };

        export default class DataStore extends BaseStore {
          load(id) {
            return fetchData(id);
          }
          static create() {
            return new DataStore();
          }
        }
        """
    )
    recs = parse_javascript_source("app.js", src)
    ent, rel, impl = _by_kind(recs)
    assert ent["fetchData"]["entity_type"] == "function"
    assert ent["Widget"]["entity_type"] == "function"
    # no JSX in the body: the upgraded parser requires JSX evidence before
    # labeling a React component (uppercase name alone is not enough)
    assert all("React" not in o for o in ent["Widget"]["observations"])
    assert ent["DataStore"]["entity_type"] == "class"
    assert ("DataStore", "inherits", "BaseStore") in rel
    assert ent["DataStore.load"]["entity_type"] == "method"
    assert ent["DataStore.create"]["entity_type"] == "method"
    assert ("app.js", "imports", "react") in rel
    assert ("app.js", "imports", "axios") in rel
    assert ("app.js", "imports", "useState") in rel


def test_json_package_and_keys():
    pkg = json.dumps(
        {"name": "demo", "dependencies": {"react": "^18.0.0", "lodash": "4.x"},
         "devDependencies": {"jest": "29"}}
    )
    recs = parse_json_source("web/package.json", pkg)
    ent, rel, impl = _by_kind(recs)
    assert ent["react"]["entity_type"] == "import"
    assert ("web/package.json", "imports", "jest") in rel
    assert "package.json::name" in ent

    bad = parse_json_source("x.json", "{not valid")
    assert len(bad) == 1 and bad[0]["entity_type"] == "file"


def test_yaml_csv_ini():
    y = parse_yaml_source("ci.yml", "on: push\njobs:\n  build:\n    runs-on: ubuntu\n")
    ent, rel, _ = _by_kind(y)
    assert any("ci.yml::jobs" == n for n in ent)

    c = parse_csv_source("data.csv", "id,name,score\n1,a,10\n2,b,20\n")
    ent, rel, _ = _by_kind(c)
    assert "data.csv::name" in ent
    assert "2 rows" in ent["data.csv::score"]["observations"][0]

    i = parse_ini_source("conf.ini", "[server]\nhost=x\nport=1\n[client]\nretries=3\n")
    ent, rel, _ = _by_kind(i)
    assert "server" in ent and "client" in ent


def test_chat_pipeline(spark, tmp_path):
    import json as _json

    msgs = [
        {"chat_id": "c1", "ts": "2024-01-01T10:00:00Z", "role": "user",
         "content": "there is an error and a traceback in my build"},
        {"chat_id": "c1", "ts": "2024-01-01T10:05:00Z", "role": "assistant",
         "content": "let me fix the bug"},
        # ≥1h gap → new conversation
        {"chat_id": "c1", "ts": "2024-01-01T12:00:00Z", "role": "user",
         "content": "now implement the new feature and create the schema"},
        {"chat_id": "c2", "ts": "2024-01-01T09:00:00Z", "role": "user",
         "content": "the and of to in is it"},
    ]
    p = tmp_path / "chat.jsonl"
    with open(p, "w") as fh:
        for m in msgs:
            fh.write(_json.dumps(m) + "\n")

    from claude_code_memory_spark.sources.chat import (
        categorize,
        chat_chunks,
        conversations,
        read_chat_jsonl,
    )

    convs = conversations(read_chat_jsonl(spark, str(p)))
    rows = {(r["chat_id"], r["session_id"]): r for r in convs.collect()}
    assert len(rows) == 3  # c1 splits at the 2h gap; c2 is one conversation
    assert rows[("c1", 1)]["n_messages"] == 2
    assert abs(rows[("c1", 1)]["duration_sec"] - 300.0) < 1e-6

    cat = categorize(convs)
    got = {(r["chat_id"], r["session_id"]): r for r in cat.collect()}
    assert got[("c1", 1)]["category"] == "debugging"
    assert got[("c1", 2)]["category"] == "implementation"
    assert got[("c2", 1)]["language"] == "en"

    chunks = chat_chunks(cat).collect()
    assert len(chunks) == 3
    assert all(c["chunk_type"] == "chat_summary" for c in chunks)
    assert len({c["point_id"] for c in chunks}) == 3  # deterministic distinct ids


@pytest.mark.slow
def test_engine_indexes_mixed_languages(spark, tmp_path):
    proj = tmp_path / "mixed"
    proj.mkdir()
    (proj / "main.py").write_text("def f():\n    return 1\n")
    (proj / "app.js").write_text("export function g() { return 2; }\n")
    (proj / "types.ts").write_text(
        "export interface Order {\n  id: number;\n}\n\n"
        "export enum Status { Open, Done }\n\n"
        "export const parse = (raw: string): Order => JSON.parse(raw);\n"
    )
    (proj / "README.md").write_text("# Readme\n\nSome docs about g and f.\n")
    (proj / "package.json").write_text('{"dependencies": {"react": "18"}}')

    from claude_code_memory_spark.api import CodeMemoryEngine

    eng = CodeMemoryEngine(spark, str(tmp_path / "store"))
    eng.index(str(proj))
    ents = {r["entity_name"]: r["entity_type"] for r in eng.store.read("entities").collect()}
    assert ents.get("f") == "function"
    assert ents.get("g") == "function"
    assert ents.get("Order") == "interface"
    assert ents.get("Status") == "enum"
    assert ents.get("parse") == "function"
    assert ents.get("Readme") == "documentation"
    assert ents.get("react") == "import"


def test_toml_pyproject_and_generic(spark, tmp_path):
    from claude_code_memory_spark.sources.config_parsers import parse_toml_source

    pyproject = """
[project]
name = "demo"
dependencies = ["numpy>=1.20", "pandas[all] ; python_version>'3.8'"]

[project.optional-dependencies]
dev = ["pytest~=8.0"]

[tool.poetry.dependencies]
python = "^3.11"
requests = "*"
"""
    recs = parse_toml_source("/p/pyproject.toml", pyproject)
    imports = {r["entity_name"] for r in recs if r.get("entity_type") == "import"}
    assert {"numpy", "pandas", "pytest", "requests"} <= imports
    assert "python" not in imports  # interpreter pin is not a dependency
    rels = {(r["from_entity"], r["to_entity"], r["relation_type"])
            for r in recs if r.get("relation_type") == "imports"}
    assert ("/p/pyproject.toml", "numpy", "imports") in rels
    tables = {r["entity_name"] for r in recs if r.get("entity_type") == "variable"}
    assert "pyproject.toml::project" in tables

    # generic toml: tables as variables; malformed input degrades to file rec
    generic = parse_toml_source("/p/config.toml", "[server]\nport = 8080\n")
    assert any(r["entity_name"] == "config.toml::server" for r in generic)
    broken = parse_toml_source("/p/bad.toml", "= nonsense [[[")
    assert len(broken) == 1 and broken[0]["entity_type"] == "file"


@pytest.mark.slow
def test_engine_indexes_toml(spark, tmp_path):
    from claude_code_memory_spark.api import CodeMemoryEngine

    proj = tmp_path / "tproj"
    proj.mkdir()
    (proj / "pyproject.toml").write_text(
        '[project]\nname = "x"\ndependencies = ["duckdb>=0.9"]\n'
    )
    (proj / "m.py").write_text("import duckdb\n")
    eng = CodeMemoryEngine(spark, str(tmp_path / "tstore"))
    eng.index(str(proj))
    hits = eng.search("duckdb", mode="keyword", k=5).collect()
    assert hits
