"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on
(runtime re-plan + skew-join splitting), shuffle partitions sized to the
parallelism actually available, Arrow enabled for every pandas-UDF stage,
UTC session timezone so results are oracle-comparable (DuckDB timestamps
are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "claude_code_memory_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the default) writes timestamps with no usable min/max
        # stats, silently disabling row-group pruning on every time-range
        # predicate; micros restores it (measured: 60k → 16k rows scanned
        # on a range-clustered table, tests/test_layout.py)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Driver-side sys.path edits don't propagate to Spark's worker
    processes, so any UDF that references package code would die with
    ModuleNotFoundError when the consumer runs outside the repo root.
    Zipping the package and `addPyFile`-ing it is the standard deployment
    path and works identically on a real cluster."""
    if getattr(spark, "_ccms_shipped", False):
        return
    import tempfile
    import zipfile

    import claude_code_memory_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"claude_code_memory_spark-{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    spark._ccms_shipped = True


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Settings required for deterministic, DuckDB-comparable output.

    Safe to call on a session we did not create (the driver's): only
    runtime-settable SQL confs are touched.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
