"""Project scanner (sources/files.py::scan_project) — the explicit-walk
listing that replaced the binaryFile source. Pins the behaviors the
swap exists for: underscore files ARE indexed (Hadoop's hidden-file
filter dropped __init__.py silently), dot files/dirs are NOT, exclude
dirs prune, size limits hold, and the schema/hash contract is stable.
"""

from __future__ import annotations

from claude_code_memory_spark.sources.files import scan_project


def _paths(spark, proj):
    return {
        r["relative_path"] for r in scan_project(spark, str(proj)).collect()
    }


def test_underscore_files_are_indexed(spark, tmp_path):
    proj = tmp_path / "p"
    (proj / "pkg").mkdir(parents=True)
    (proj / "pkg" / "__init__.py").write_text("x = 1\n")
    (proj / "pkg" / "_internal.py").write_text("y = 2\n")
    (proj / "__main__.py").write_text("z = 3\n")
    got = _paths(spark, proj)
    assert got == {"pkg/__init__.py", "pkg/_internal.py", "__main__.py"}


def test_hidden_and_excluded_stay_out(spark, tmp_path):
    proj = tmp_path / "p"
    (proj / ".git").mkdir(parents=True)
    (proj / ".git" / "config").write_text("no\n")
    (proj / "node_modules" / "dep").mkdir(parents=True)
    (proj / "node_modules" / "dep" / "index.js").write_text("no\n")
    (proj / ".hidden.py").write_text("no\n")
    (proj / "ok.py").write_text("yes\n")
    assert _paths(spark, proj) == {"ok.py"}


def test_size_and_empty_filters(spark, tmp_path):
    proj = tmp_path / "p"
    proj.mkdir()
    (proj / "empty.py").write_text("")
    (proj / "big.py").write_text("x" * 2_000_000)
    (proj / "ok.py").write_text("a = 1\n")
    assert _paths(spark, proj) == {"ok.py"}


def test_schema_hash_and_language(spark, tmp_path):
    import hashlib

    proj = tmp_path / "p"
    proj.mkdir()
    content = "def f():\n    pass\n"
    (proj / "m.py").write_text(content)
    rows = scan_project(spark, str(proj)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["language"] == "py"
    assert r["content"] == content
    assert r["size"] == len(content)
    assert r["sha256"] == hashlib.sha256(content.encode()).hexdigest()
    assert r["mtime"] is not None


def test_non_utf8_decodes_lossily(spark, tmp_path):
    proj = tmp_path / "p"
    proj.mkdir()
    (proj / "weird.txt").write_bytes(b"ok \xff\xfe bytes\n")
    rows = scan_project(spark, str(proj)).collect()
    assert len(rows) == 1 and "ok" in rows[0]["content"]
