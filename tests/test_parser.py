"""Parser tests — mirror the reference's tests/unit/test_parser.py cases:
simple function (:99), class+methods (:126), imports (:187), syntax errors
(:210), empty files (:227), docstrings (:239)."""

from claude_code_memory_spark.sources.files import scan_project
from claude_code_memory_spark.sources.python_parser import parse_python_files, split_parsed


def _parse(spark, temp_repo):
    files = scan_project(spark, temp_repo)
    parsed = parse_python_files(files).cache()
    return split_parsed(parsed)


def test_entities_extracted(spark, temp_repo):
    entities, relations, impl = _parse(spark, temp_repo)
    by_name = {r["entity_name"]: r for r in entities.collect()}
    # functions and classes
    assert by_name["helper"]["entity_type"] == "function"
    assert by_name["compute"]["entity_type"] == "function"
    assert by_name["Processor"]["entity_type"] == "class"
    assert by_name["Processor.run"]["entity_type"] == "method"
    # docstrings and signatures
    assert by_name["helper"]["docstring"] == "Add two numbers."
    assert by_name["helper"]["signature"] == "helper(a, b)"
    # variables, constants, tuple unpack
    assert by_name["MAX_SIZE"]["entity_type"] == "constant"
    assert by_name["x"]["entity_type"] == "variable"
    assert by_name["y"]["entity_type"] == "variable"
    # imports
    assert by_name["os"]["entity_type"] == "import"
    # files, including syntax-error files (graceful degradation)
    file_entities = [n for n, r in by_name.items() if r["entity_type"] == "file"]
    assert any("broken.py" in n for n in file_entities)


def test_empty_source_graceful():
    from claude_code_memory_spark.sources.python_parser import parse_python_source

    recs = parse_python_source("empty.py", "")
    assert len(recs) == 1 and recs[0]["entity_type"] == "file"


def test_relations_extracted(spark, temp_repo):
    entities, relations, impl = _parse(spark, temp_repo)
    rels = {(r["from_entity"], r["relation_type"], r["to_entity"]) for r in relations.collect()}
    assert ("compute", "calls", "helper") in rels
    assert ("Derived", "inherits", "Base") in rels
    assert ("Processor", "contains", "Processor.run") in rels
    assert any(r[1] == "imports" and r[2] == "os" for r in rels)


def test_implementation_chunks(spark, temp_repo):
    entities, relations, impl = _parse(spark, temp_repo)
    rows = {r["entity_name"]: r for r in impl.collect()}
    assert "def helper(a, b):" in rows["helper"]["content"]
    assert rows["compute"]["complexity"] >= 3  # for + if + base
    assert rows["helper"]["line_number"] < rows["helper"]["end_line_number"]


def test_decorator_and_raise_relations():
    """Decorators → (target, uses, name, decorator); raise X → (fn, throws, X) —
    the same relation surface the JS parser emits for @deco / throw new."""
    import textwrap

    from claude_code_memory_spark.sources.python_parser import parse_python_source

    src = textwrap.dedent(
        '''
        import functools

        @functools.cache
        def compute(x):
            if x < 0:
                raise ValueError("negative")
            return x * 2

        @register
        class Handler:
            @staticmethod
            def run():
                raise errors.TimeoutError()
        '''
    )
    recs = parse_python_source("m.py", src)
    rels = {
        (r["from_entity"], r["to_entity"], r["relation_type"])
        for r in recs
        if r["record_kind"] == "relation"
    }
    assert ("compute", "cache", "uses") in rels
    assert ("compute", "ValueError", "throws") in rels
    assert ("Handler", "register", "uses") in rels
    assert ("Handler.run", "staticmethod", "uses") in rels
    assert ("Handler.run", "TimeoutError", "throws") in rels


def test_optional_annotation_unwrapping():
    """Optional[Tool] and Tool | None unwrap to Tool for type binds and
    return binds (the value IS a Tool whenever it's used); containers
    (list[Tool]) and non-None unions stay opaque."""
    from claude_code_memory_spark.sources.python_parser import parse_python_source

    src = (
        "from pkg.core import Motor\n"
        "from typing import Optional\n"
        "\n"
        "def f(a: Optional[Motor], b: Motor | None, c: None | Motor,\n"
        "      d: list[Motor], e: Motor | str):\n"
        "    return a.rev()\n"
        "\n"
        "def g() -> Optional[Motor]:\n"
        "    return fetch()\n"
    )
    recs = parse_python_source("app.py", src)
    tbinds = {
        r["entity_name"]: r["to_entity"]
        for r in recs
        if r["record_kind"] == "type_binding"
    }
    assert tbinds.get("a") == "Motor"
    assert tbinds.get("b") == "Motor"
    assert tbinds.get("c") == "Motor"
    assert "d" not in tbinds  # container, not the element
    assert "e" not in tbinds  # non-None union: ambiguous
    rbinds = {
        r["from_entity"]: r["to_entity"]
        for r in recs
        if r["record_kind"] == "return_bind"
    }
    assert rbinds.get("g") == "Motor"
