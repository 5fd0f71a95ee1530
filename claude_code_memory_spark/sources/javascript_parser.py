"""JavaScript/TypeScript parser (regex-based approximation).

Reference semantics (S5, analysis/javascript_parser.py:19-1197):
functions (declarations, arrow consts, methods), classes + inheritance,
React components (uppercase function returning JSX), imports (default /
named / namespace), exports. The reference uses tree-sitter; tree-sitter
isn't in this container, so this extractor covers the same entity surface
with line-anchored regexes — per-file inside the shared mapInPandas stage.
"""

from __future__ import annotations

import re

_FUNC = re.compile(r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s+(\w+)\s*\(([^)]*)\)")
_ARROW = re.compile(r"^\s*(?:export\s+)?(?:const|let|var)\s+(\w+)\s*=\s*(?:async\s*)?(?:\([^)]*\)|\w+)\s*=>")
_CLASS = re.compile(r"^\s*(?:export\s+)?(?:default\s+)?class\s+(\w+)(?:\s+extends\s+([\w.]+))?")
_METHOD = re.compile(r"^\s{2,}(?:async\s+)?(?:static\s+)?(\w+)\s*\(([^)]*)\)\s*\{")
_IMPORT = re.compile(r"^\s*import\s+(?:(\w+)|\{([^}]*)\}|\*\s+as\s+(\w+))?\s*(?:,\s*\{([^}]*)\})?\s*from\s+['\"]([^'\"]+)['\"]")
_BARE_IMPORT = re.compile(r"^\s*import\s+['\"]([^'\"]+)['\"]")
_REQUIRE = re.compile(r"(?:const|let|var)\s+(?:\{[^}]*\}|\w+)\s*=\s*require\(['\"]([^'\"]+)['\"]\)")
_CALL = re.compile(r"\b([a-zA-Z_]\w*)\s*\(")
_JS_KEYWORDS = frozenset(
    "if for while switch catch function return new typeof await import require console".split()
)


def parse_javascript_source(path: str, source: str) -> list[dict]:
    from claude_code_memory_spark.sources.python_parser import (
        _entity_rec,
        _impl_rec,
        _relation_rec,
    )

    recs: list[dict] = []
    lines = source.splitlines()
    recs.append(
        _entity_rec(path, "file", path, 1, len(lines) or 1, [f"JavaScript file {path}"])
    )

    current_class: str | None = None
    current_class_indent = 0
    for i, line in enumerate(lines, start=1):
        if current_class is not None and line.strip().startswith("}") and (
            len(line) - len(line.lstrip()) <= current_class_indent
        ):
            current_class = None

        m = _CLASS.match(line)
        if m:
            name, base = m.group(1), m.group(2)
            current_class = name
            current_class_indent = len(line) - len(line.lstrip())
            obs = [f"Class {name}"]
            # React class component heuristic
            if base and ("Component" in base):
                obs.append("React class component")
            recs.append(_entity_rec(name, "class", path, i, None, obs))
            recs.append(_relation_rec(path, name, "contains", path))
            if base:
                recs.append(_relation_rec(name, base.split(".")[-1], "inherits", path))
            continue

        m = _FUNC.match(line) or _ARROW.match(line)
        if m:
            name = m.group(1)
            etype = "function"
            obs = [f"Function {name}"]
            if name[0].isupper():
                obs.append("Possible React component")
            recs.append(_entity_rec(name, etype, path, i, None, obs))
            recs.append(_relation_rec(path, name, "contains", path))
            continue

        if current_class:
            m = _METHOD.match(line)
            if m and m.group(1) not in _JS_KEYWORDS:
                qual = f"{current_class}.{m.group(1)}"
                recs.append(
                    _entity_rec(qual, "method", path, i, None, [f"Method {m.group(1)}"])
                )
                recs.append(_relation_rec(current_class, qual, "contains", path))

        m = _IMPORT.match(line)
        if m:
            module = m.group(5)
            recs.append(
                _entity_rec(module, "import", path, i, None, [f"Imports {module}"])
            )
            recs.append(_relation_rec(path, module, "imports", path, "module"))
            for names in (m.group(2), m.group(4)):
                if names:
                    for n in names.split(","):
                        n = n.strip().split(" as ")[0].strip()
                        if n:
                            recs.append(_relation_rec(path, n, "imports", path, "named"))
            continue
        m = _BARE_IMPORT.match(line) or _REQUIRE.search(line)
        if m:
            module = m.group(1)
            recs.append(_entity_rec(module, "import", path, i, None, [f"Imports {module}"]))
            recs.append(_relation_rec(path, module, "imports", path, "module"))
    return recs
