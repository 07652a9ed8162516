"""SparkSession factory with the engine's standard configuration.

Local mode in the sandbox; on a real cluster the same builder is driven by
spark-submit conf. Session timezone is pinned to UTC so timestamp math is
deterministic, Arrow transfer is on (all UDFs are pandas/Arrow batched —
/root/repo/BASELINE.json input_hint mandates no per-row Python), and AQE
is enabled for runtime coalescing + skew-join handling (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _tune_malloc() -> None:
    """Keep glibc from returning pages to the OS.

    This VM's host reclaims freed guest pages (balloon/free-page
    reporting), so re-faulting a released page costs ~1 ms/MB — fresh
    numpy buffers in the Arrow workers would run 100x slower than warm
    ones, with huge run-to-run variance. Raising the mmap/trim thresholds
    makes glibc serve large buffers from a reused (warm) arena. Set in
    the driver environment BEFORE the JVM starts so pyspark.daemon and
    every forked worker inherit it."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 * 1024 * 1024))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(256 * 1024 * 1024))


def get_spark(
    master: str | None = None,
    app_name: str = "sits-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    _tune_malloc()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
