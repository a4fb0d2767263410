"""SparkSession factory with scale-oriented defaults.

Tuned for the engine's workload shape: wide parquet scans + hash
aggregations + range joins on cell_id.  On a real cluster the same config
applies; only master/executor sizing changes (spark-submit flags).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = "s2spark", master: str | None = None,
                  shuffle_partitions: int | None = None, **extra) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # ~2x cores locally; on a cluster AQE coalesces anyway
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else "32"
        shuffle_partitions = 2 * cpus if n == "*" else max(8, 2 * int(n)) if n.isdigit() else 64
    b = (SparkSession.builder.appName(app_name).master(master)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.sql.parquet.filterPushdown", "true")
         .config("spark.sql.files.maxPartitionBytes", "134217728")
         .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
         .config("spark.sql.ansi.enabled", "false")
         .config("spark.ui.enabled", "false")
         # \r-animated console progress frames corrupt captured output
         # (bench JSON lines, plan-audit tables, driver logs)
         .config("spark.ui.showConsoleProgress", "false"))
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
