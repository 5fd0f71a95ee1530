"""Shared fixtures: one SparkSession per test run, a generated fixture
project (the reference's temp_repo pattern, tests/conftest.py:44-100)."""

from __future__ import annotations

import os
import sys
import textwrap

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from claude_code_memory_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def temp_repo(tmp_path):
    """A small Python project with the reference's test cases: functions,
    classes+methods, imports, tuple unpack, syntax errors, docstrings."""
    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / "main.py").write_text(
        textwrap.dedent(
            '''
            """Main module."""
            import os
            from pathlib import Path

            MAX_SIZE = 100
            x, y = 1, 2

            def helper(a, b):
                """Add two numbers."""
                return a + b

            def compute(items):
                """Compute with control flow."""
                total = 0
                for it in items:
                    if it > 0:
                        total += helper(it, 1)
                return total

            class Processor:
                """Processes things."""

                def run(self, data):
                    return compute(data)
            '''
        )
    )
    (proj / "util.py").write_text(
        textwrap.dedent(
            """
            class Base:
                pass

            class Derived(Base):
                def ping(self):
                    return "pong"
            """
        )
    )
    (proj / "broken.py").write_text("def broken(:\n    pass\n")
    (proj / "empty.py").write_text("")
    return str(proj)
