"""SparkSession factory.

Local-mode defaults tuned for the sandbox (local[N], one JVM); on a real
cluster the same code runs under ``spark-submit --py-files`` with
cluster-provided master/memory and proportionally larger
``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import default_parallelism


def get_spark(
    app_name: str = "cim-linkgraph",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    cores = default_parallelism()
    # Under spark-submit the gateway JVM already exists and its conf
    # carries the submitted --master; forcing .master() here would
    # override the cluster manager the user launched against. The
    # gateway env vars are the reliable submit signature.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    master = master or os.environ.get("SPARK_MASTER") or (
        None if under_submit else f"local[{cores}]"
    )
    shuffle_partitions = shuffle_partitions or cores
    driver_memory = driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "16g")
    # shuffle spill dir on tmpfs when available: local-mode shuffles are
    # disk-bound on the overlay fs and serialize under many threads
    # (measured local[32] slower than local[8] at 32M-edge shuffles).
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
    builder = (
        (SparkSession.builder.master(master) if master
         else SparkSession.builder)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
