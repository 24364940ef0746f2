"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live, so tests / bench / prod use
identical plans. Defaults target a multi-executor cluster; in this
sandbox ``local[N]`` stands in (N vs 4N cores evidences the
north_rule's two-cluster-size scaling criterion).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "fkg", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~2× cores locally; on a real cluster this is set to
        # 2-3× total executor cores (or left to AQE coalescing).
        shuffle_partitions = max(cpus * 2, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        # AQE: runtime coalescing, skew-join splitting — required at
        # 100 TB where static planning can't see the data
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow is the UDF hot path (model-inference stand-ins)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # dims (taxonomy ~80 rows, catalog small at test scale) broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return b.getOrCreate()
