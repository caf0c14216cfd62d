"""SparkSession factory with engine defaults.

Tuned for the sandbox (single JVM, ``local[32]``) but every setting is
the one we'd ship to a 1000-executor cluster: AQE on (runtime skew-join
splitting + partition coalescing), Arrow-batched Python exchange with a
bounded batch size so executor-python memory stays flat regardless of
input size, and UTC session time so time-bucket arithmetic matches any
SQL oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# tokens arrays are ~256 int32 ≈ 1 KB/row plus an int64 accumulator
# column (~2 KB); 4096 rows/batch ≈ 12 MB per Arrow batch per core —
# bounded python-worker memory even at 10^12-row scale (SURVEY.md §4).
# Env-overridable: smaller batches shrink the per-core working set
# (cache locality under memory-bus pressure at high core counts).
ARROW_BATCH_ROWS = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH_ROWS", "4096"))


def get_spark(
    app_name: str = "tinybrain-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cpus)

    # executor python workers import this package by name (pandas/Arrow
    # UDFs pickle references, not code).  A driver launched from an
    # arbitrary cwd has the repo root only on ITS OWN sys.path — the
    # workers inherit PYTHONPATH, not sys.path — so pin the package
    # root into the env BEFORE the JVM starts (on a real cluster the
    # same role is played by --py-files tinybrain_spark.zip).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{py_path}" if py_path else pkg_root
        )

    # keep the JVM heap modest: the heavy data lives in Arrow buffers on
    # the Python side, and >8g heaps trigger GC/huge-page stalls in this
    # sandbox (measured: 24g heap degrades a 1s scan to 18s)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local mode: driver JVM == executor; the 1g default heap starves
        # 32 concurrent tasks (on a real cluster this maps to executor mem)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.maxResultSize", "4g")
        # sandbox-scale split size so small benchmark files still fan out
        # across all cores; a real cluster with 100TB of >=128MB files
        # would keep the 128MB default (env-overridable)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "33554432"),
        )
        .config("spark.sql.files.openCostInBytes", "1048576")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-provided parquet table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
