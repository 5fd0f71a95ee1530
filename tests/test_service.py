"""Multi-project service registry (ST6, reference service.py:22-340):
add/remove/status + one incremental pass over every enabled project on
a single SparkSession."""

import pytest
import os

from claude_code_memory_spark.service import IndexingService


def _mkproj(root, name, body):
    proj = root / name
    proj.mkdir()
    (proj / "mod.py").write_text(body)
    return str(proj)


def test_registry_add_remove_enable(spark, tmp_path):
    svc = IndexingService(spark, home=str(tmp_path / "home"))
    p1 = _mkproj(tmp_path, "alpha", "def a():\n    return 1\n")
    assert svc.add_project(p1, "col_alpha")
    assert not svc.add_project(p1, "col_alpha")  # duplicate path refused
    assert svc.set_enabled(p1, False)
    assert svc.load_config()["projects"][0]["enabled"] is False
    assert svc.remove_project(p1)
    assert not svc.remove_project(p1)
    assert svc.load_config()["projects"] == []


@pytest.mark.slow
def test_run_once_indexes_all_enabled(spark, tmp_path):
    svc = IndexingService(spark, home=str(tmp_path / "home"))
    p1 = _mkproj(tmp_path, "alpha", "def alpha_fn():\n    return 1\n")
    p2 = _mkproj(tmp_path, "beta", "def beta_fn():\n    return 2\n")
    p3 = _mkproj(tmp_path, "gamma", "def gamma_fn():\n    return 3\n")
    svc.add_project(p1, "col_a")
    svc.add_project(p2, "col_b")
    svc.add_project(p3, "col_c")
    svc.set_enabled(p3, False)

    results = svc.run_once()
    assert set(results) == {p1, p2}  # disabled project skipped
    assert all(r["files_changed"] == 1 for r in results.values())

    # collections are isolated: each engine sees only its own entities
    ents_a = {
        r["entity_name"] for r in svc.engine("col_a").store.read("entities").collect()
    }
    ents_b = {
        r["entity_name"] for r in svc.engine("col_b").store.read("entities").collect()
    }
    assert "alpha_fn" in ents_a and "alpha_fn" not in ents_b
    assert "beta_fn" in ents_b

    st = {s["collection"]: s for s in svc.status()}
    assert st["col_a"]["indexed"] and st["col_a"]["n_files"] == 1
    assert not st["col_c"]["indexed"]

    # second pass is a cheap no-op everywhere
    results2 = svc.run_once()
    assert all(r["files_changed"] == 0 for r in results2.values())


def test_config_survives_restart(spark, tmp_path):
    home = str(tmp_path / "home")
    p1 = _mkproj(tmp_path, "alpha", "def a():\n    return 1\n")
    IndexingService(spark, home=home).add_project(p1, "col_a")
    svc2 = IndexingService(spark, home=home)
    assert [p["collection"] for p in svc2.load_config()["projects"]] == ["col_a"]
    assert os.path.exists(os.path.join(home, "service.json"))
