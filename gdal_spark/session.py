"""SparkSession factory with scale-oriented defaults.

Defaults chosen for a 100 TB / 1000-executor deployment (AQE on, skew-join
handling on, Arrow enabled for the pandas-UDF refine path) but usable on
local[N] for tests/bench. Shuffle partitions are configurable because the
right number is cluster-sized, not constant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "gdal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    - AQE + skew-join: hot H3/tile cells in web-scale geotag data make
      skewed shuffle partitions the norm; AQE splits them at runtime.
    - Arrow execution for pandas UDFs: the geometry refine and raster
      kernels move data JVM<->Python in Arrow record batches (the
      reference's own columnar batch size is 65,536 rows,
      ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:1947).
    - ANSI off: the engine relies on wrap-around integer hash math
      (splitmix64-style) in column expressions.
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
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
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
