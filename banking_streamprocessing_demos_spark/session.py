"""SparkSession construction with scale-aware defaults.

Local tests run on ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB deployment story:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- Arrow on (the stateful streaming operator and any pandas UDF cross the
  JVM/Python boundary in columnar batches, not rows)
- shuffle partitions sized to the local core count for tests; on a real
  cluster this is overridden to ~2-3x total cores (or left to AQE's
  coalescing with a high initial value)
- RocksDB state store for streaming state that exceeds heap
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "banking-streamprocessing-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster the caller passes None and lets spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # spill-aware scan sizing: 128 MB input splits keep per-task
        # memory bounded at any table size; override per deployment
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"),
        )
        # generous driver memory in local mode; ignored under spark-submit
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # the console progress bar redraws interleave with stdout and can
        # displace the bench harness's final JSON line from log tails
        .config("spark.ui.showConsoleProgress", "false")
    )
    if rocksdb_state:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
