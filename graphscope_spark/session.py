"""SparkSession factory with scale-oriented defaults.

The reference engine's performance levers (columnar fragments, codegen,
overlapped comm/compute — SURVEY.md §4) map onto Spark built-ins; what
we configure here is the part Spark leaves to the user: AQE (runtime
re-planning + skew-join splitting), shuffle-partition sizing, and
Arrow-based pandas UDF transfer for the vectorized extraction path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "graphscope_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for iterative graph jobs.

    Settings chosen for 100TB-scale behavior, not just local tests:
    - AQE on: runtime coalescing of the per-superstep shuffles and
      automatic skew-join splitting for hub vertices (the reference has
      no skew handling at all — hash partition only,
      arrow_fragment_loader.h:351-390 — so this is a strict upgrade).
    - advisoryPartitionSizeInBytes sized for executor memory headroom.
    - Arrow enabled for pandas UDFs (the HTML→text extraction path).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
