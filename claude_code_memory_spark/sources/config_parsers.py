"""JSON / YAML / text / CSV / INI parsers (S6, S7, S10).

Reference semantics:
- JSON (analysis/json_parser.py:20-862): structure extraction; special
  files — package.json dependencies become import relations (:230-262),
  tsconfig compiler options (:263-285). Huge-file streaming mode (:623-816)
  is unnecessary on Spark: `spark.read.json` partitions natively.
- YAML (analysis/yaml_parser.py): top-level keys; GitHub-workflow
  detection. PyYAML is gated behind an import-try.
- Text/CSV/INI (analysis/text_parser.py:16-346): plain chunking, CSV
  header+row counts, INI sections.
"""

from __future__ import annotations

import configparser
import io
import json
import re

from claude_code_memory_spark.sources.python_parser import (
    _entity_rec,
    _impl_rec,
    _relation_rec,
)


def parse_json_source(path: str, source: str) -> list[dict]:
    recs: list[dict] = []
    n_lines = source.count("\n") + 1
    recs.append(_entity_rec(path, "file", path, 1, n_lines, [f"JSON file {path}"]))
    try:
        data = json.loads(source)
    except (json.JSONDecodeError, RecursionError):
        return recs
    basename = path.rsplit("/", 1)[-1]
    if basename == "package.json" and isinstance(data, dict):
        # package.json deps → import relations (json_parser.py:230-262)
        for section in ("dependencies", "devDependencies", "peerDependencies"):
            for dep, ver in (data.get(section) or {}).items():
                recs.append(
                    _entity_rec(dep, "import", path, None, None, [f"npm dependency {dep}@{ver}"])
                )
                recs.append(_relation_rec(path, dep, "imports", path, section))
    if isinstance(data, dict):
        for key, value in list(data.items())[:100]:
            kind = type(value).__name__
            recs.append(
                _entity_rec(
                    f"{basename}::{key}", "variable", path, None, None,
                    [f"JSON key '{key}' ({kind})"],
                )
            )
            recs.append(_relation_rec(path, f"{basename}::{key}", "contains", path))
    return recs


def parse_yaml_source(path: str, source: str) -> list[dict]:
    recs: list[dict] = []
    n_lines = source.count("\n") + 1
    recs.append(_entity_rec(path, "file", path, 1, n_lines, [f"YAML file {path}"]))
    try:
        import yaml  # gated: not guaranteed in every runtime
    except ImportError:
        # fallback: top-level keys by regex (good enough for entity surface)
        keys = re.findall(r"^([A-Za-z_][\w-]*):", source, flags=re.MULTILINE)
        data = {k: None for k in keys}
    else:
        try:
            data = yaml.safe_load(source) or {}
        except yaml.YAMLError:
            return recs
    if isinstance(data, dict):
        is_workflow = "on" in data and "jobs" in data  # GH Actions detection
        basename = path.rsplit("/", 1)[-1]
        for key in list(data)[:100]:
            recs.append(
                _entity_rec(
                    f"{basename}::{key}", "variable", path, None, None,
                    [f"{'Workflow' if is_workflow else 'YAML'} key '{key}'"],
                )
            )
            recs.append(_relation_rec(path, f"{basename}::{key}", "contains", path))
    return recs


def parse_text_source(path: str, source: str, *, chunk_chars: int = 3200) -> list[dict]:
    """Plain-text chunking (text_parser.py:127-149)."""
    recs = [
        _entity_rec(path, "file", path, 1, source.count("\n") + 1, [f"Text file {path}"])
    ]
    for i in range(0, len(source), chunk_chars):
        seg = source[i : i + chunk_chars]
        if seg.strip():
            recs.append(
                _impl_rec(f"{path}::chunk{i // chunk_chars}", "documentation", path, None, None, seg, None)
            )
    return recs


def parse_csv_source(path: str, source: str) -> list[dict]:
    """CSV header + row stats (text_parser.py:150-236). For data-scale CSV
    use spark.read.csv — this handles small config-ish CSVs in a repo."""
    recs = [
        _entity_rec(path, "file", path, 1, source.count("\n") + 1, [f"CSV file {path}"])
    ]
    lines = [ln for ln in source.splitlines() if ln.strip()]
    if not lines:
        return recs
    header = [h.strip() for h in lines[0].split(",")]
    basename = path.rsplit("/", 1)[-1]
    for col in header[:50]:
        if col:
            recs.append(
                _entity_rec(
                    f"{basename}::{col}", "variable", path, 1, None,
                    [f"CSV column '{col}' ({len(lines) - 1} rows)"],
                )
            )
            recs.append(_relation_rec(path, f"{basename}::{col}", "contains", path))
    return recs


def parse_ini_source(path: str, source: str) -> list[dict]:
    """INI sections + keys (text_parser.py:237-346)."""
    recs = [
        _entity_rec(path, "file", path, 1, source.count("\n") + 1, [f"INI file {path}"])
    ]
    cp = configparser.ConfigParser(strict=False, interpolation=None)
    try:
        cp.read_file(io.StringIO(source))
    except configparser.Error:
        return recs
    for section in cp.sections():
        recs.append(
            _entity_rec(
                section, "variable", path, None, None,
                [f"INI section [{section}] with {len(cp[section])} keys"],
            )
        )
        recs.append(_relation_rec(path, section, "contains", path))
    return recs


def parse_toml_source(path: str, source: str) -> list[dict]:
    """S10 family: TOML via stdlib ``tomllib``. pyproject.toml gets the
    package.json treatment (json_parser.py:230-262 parity): [project]
    dependencies and every optional-dependency group become import
    entities + ``imports`` relations (PEP 508 specifiers stripped);
    other files surface their top-level tables/keys as variables."""
    import tomllib

    recs = [
        _entity_rec(path, "file", path, 1, source.count("\n") + 1, [f"TOML file {path}"])
    ]
    try:
        data = tomllib.loads(source)
    except (tomllib.TOMLDecodeError, RecursionError):
        return recs
    basename = path.rsplit("/", 1)[-1]

    def dep_name(spec: str) -> str:
        return re.split(r"[\s<>=!~;\[\(]", spec.strip(), 1)[0]

    if basename == "pyproject.toml" and isinstance(data, dict):
        project = data.get("project") or {}
        groups: list[tuple[str, list]] = [
            ("dependencies", project.get("dependencies") or [])
        ]
        for grp, deps in (project.get("optional-dependencies") or {}).items():
            groups.append((f"optional:{grp}", deps or []))
        # poetry layout keeps deps under [tool.poetry.dependencies]
        poetry = ((data.get("tool") or {}).get("poetry") or {}).get("dependencies")
        if isinstance(poetry, dict):
            groups.append(("poetry", [f"{k}{'' if v == '*' else v}" if isinstance(v, str) else k
                                      for k, v in poetry.items() if k != "python"]))
        for section, deps in groups:
            for spec in deps:
                name = dep_name(str(spec))
                if not name:
                    continue
                recs.append(
                    _entity_rec(name, "import", path, None, None,
                                [f"python dependency {spec}"])
                )
                recs.append(_relation_rec(path, name, "imports", path, section))
    if isinstance(data, dict):
        for key, value in list(data.items())[:100]:
            kind = type(value).__name__
            recs.append(
                _entity_rec(
                    f"{basename}::{key}", "variable", path, None, None,
                    [f"TOML table '{key}' ({kind})"],
                )
            )
            recs.append(_relation_rec(path, f"{basename}::{key}", "contains", path))
    return recs
