"""SparkSession factory with scale-oriented defaults.

The same builder is used by tests (local[4]), bench.py (local[$SPARK_GRAFT_CPUS])
and a real ``spark-submit`` job — only master/shuffle-partitions differ.

Defaults chosen for the 100 TB target:
* AQE on (runtime coalescing + skew-join splitting),
* Arrow on (all pandas UDF traffic is Arrow batches, never per-row pickling),
* shuffle partitions sized to cores locally; on a cluster this is overridden to
  ~2-3x total cores (or left to AQE coalescing from a high initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "plume-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    master = master or os.environ.get("PLUME_SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps tiny-data latency low
        # while AQE coalesces further; on a cluster pass an explicit value.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("*", "") else int(n)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("PLUME_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
