"""HTML/CSS parser (S8) + strip_html (X15) + file-op detection (X14)."""

import textwrap

from claude_code_memory_spark.sources.python_parser import parse_python_source
from claude_code_memory_spark.sources.web_parsers import (
    parse_css_source,
    parse_html_source,
    strip_html,
)


def _by_kind(recs):
    ent = {r["entity_name"]: r for r in recs if r["record_kind"] == "entity"}
    rel = {
        (r["from_entity"], r["relation_type"], r["to_entity"], r["import_type"])
        for r in recs
        if r["record_kind"] == "relation"
    }
    return ent, rel


def test_html_entities_and_relations():
    src = textwrap.dedent(
        """
        <html><head>
          <title>My App</title>
          <link rel="stylesheet" href="style.css">
          <script src="app.js"></script>
        </head>
        <body>
          <div id="root" class="container main">
            <span class="badge">hi</span>
          </div>
        </body></html>
        """
    )
    ent, rel = _by_kind(parse_html_source("index.html", src))
    assert ent["My App"]["entity_type"] == "documentation"
    assert "#root" in ent
    assert ".container" in ent and ".badge" in ent
    assert ("index.html", "imports", "app.js", "script") in rel
    assert ("index.html", "imports", "style.css", "stylesheet") in rel


def test_css_selectors_vars_imports():
    src = textwrap.dedent(
        """
        @import url("base.css");
        /* .commented { } */
        :root { --main-color: #fff; --pad: 4px; }
        .button { color: var(--main-color); }
        #header > .nav { padding: var(--pad); }
        """
    )
    ent, rel = _by_kind(parse_css_source("style.css", src))
    assert ".button" in ent
    assert "#header > .nav" in ent
    assert ".commented" not in ent
    assert ent["--main-color"]["entity_type"] == "constant"
    assert ("style.css", "imports", "base.css", "css") in rel


def test_strip_html():
    html = "<div><script>var x=1;</script><style>.a{}</style><p>Hello <b>world</b></p></div>"
    assert strip_html(html) == "Hello world"


def test_python_file_op_relations():
    src = textwrap.dedent(
        """
        import json

        def loader():
            with open("config.json") as fh:
                data = json.load(fh)
            mode = open("data.bin", "rb")
            return data
        """
    )
    recs = parse_python_source("m.py", src)
    uses = {
        (r["from_entity"], r["to_entity"], r["import_type"])
        for r in recs
        if r["record_kind"] == "relation" and r["relation_type"] == "uses"
    }
    assert ("loader", "config.json", "open") in uses
    assert ("loader", "data.bin", "open") in uses
    # mode strings never become pseudo-files (F7)
    assert not any(t in ("r", "rb", "w") for _, t, _ in uses)
