"""SparkSession factory with the engine's tuned defaults.

Local-mode testing uses ``local[N]`` (single JVM); the configs below are the
ones that survive a move to a 1000-executor cluster unchanged: AQE with skew
join splitting, Arrow for the (rare) pandas-UDF paths, sane shuffle partition
counts, and broadcast threshold high enough that the admin-polygon dimension
(a few MB of packed covers) always broadcasts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "housenumbercore_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or ``*``. In local mode the
    driver is the only JVM, so driver memory is the only memory knob.
    """
    cores_s = str(cores) if cores else os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cores_s}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # modest library default; bench/driver entry points that need the
        # sandbox-host-sized heap export SPARK_GRAFT_DRIVER_MEM themselves
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # free durable checkpoint files of GC'd frames (the 'reliable'
        # pin strategy otherwise accumulates one per iterative round for
        # the life of the checkpoint dir — pinning.py)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
