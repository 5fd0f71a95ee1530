"""Parser registry: language → per-file record extractor (UD6).

Reference: ParserRegistry dispatch (analysis/parser.py:2109-2267) routes a
file to its language parser; here the registry is a plain dict consulted
inside ONE mapInPandas stage — all languages parse in the same Arrow
batch pass, so adding a parser never adds a scan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from claude_code_memory_spark.sources.config_parsers import (
    parse_csv_source,
    parse_ini_source,
    parse_toml_source,
    parse_json_source,
    parse_text_source,
    parse_yaml_source,
)
from claude_code_memory_spark.sources.javascript_parser import parse_javascript_source
from claude_code_memory_spark.sources.markdown_parser import parse_markdown_source
from claude_code_memory_spark.sources.web_parsers import parse_css_source, parse_html_source
from claude_code_memory_spark.sources.python_parser import (
    PARSED_SCHEMA,
    parse_python_source,
)

Parser = Callable[[str, str], list[dict]]

PARSERS: dict[str, Parser] = {
    "py": parse_python_source,
    "js": parse_javascript_source,
    "ts": parse_javascript_source,
    "md": parse_markdown_source,
    "json": parse_json_source,
    "yaml": parse_yaml_source,
    "txt": parse_text_source,
    "csv": parse_csv_source,
    "ini": parse_ini_source,
    "toml": parse_toml_source,
    "html": parse_html_source,
    "css": parse_css_source,
}


def register_parser(language: str, parser: Parser) -> None:
    PARSERS[language] = parser


def parse_files(files: DataFrame) -> DataFrame:
    """All registered languages in one mapInPandas pass → PARSED_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in PARSED_SCHEMA.split(", ")]
        for pdf in batches:
            all_recs: list[dict] = []
            for _, row in pdf.iterrows():
                parser = PARSERS.get(row.get("language"))
                if parser and row.get("content"):
                    try:
                        all_recs.extend(parser(row["relative_path"], row["content"]))
                    except Exception:
                        # graceful degradation parity: a crashing parser
                        # must not take down the batch (parser.py error
                        # handling; tests/unit/test_parser.py:210)
                        from claude_code_memory_spark.sources.python_parser import _entity_rec

                        all_recs.append(
                            _entity_rec(
                                row["relative_path"], "file", row["relative_path"], 1, 1,
                                [f"Unparseable file {row['relative_path']}"],
                            )
                        )
            if all_recs:
                yield pd.DataFrame(all_recs, columns=cols)

    return files.mapInPandas(run, schema=PARSED_SCHEMA)
