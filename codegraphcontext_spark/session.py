"""SparkSession construction with the engine's standard scale-oriented config.

Local testing runs on ``local[N]``; the same config block is what we would pass to
``spark-submit`` on a real cluster (AQE, skew-join handling, Arrow batching).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "codegraphcontext_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    cores: parallelism for local mode (default: $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: default 2x cores (small-local heuristic; on a real
    cluster this is sized so post-shuffle partitions are 100-200 MB).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n_cores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n_cores = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * n_cores)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalesce of small shuffle partitions, skew-join splitting,
        # dynamic broadcast conversion — core of the 100TB story.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for all pandas UDF / mapInPandas stages (the extraction path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Smaller input splits: html-heavy page corpora need scan-side
        # parallelism for the (narrow) extraction stage; 128 MB splits leave
        # cores idle on medium corpora. 32 MB is right for ~10 KB documents.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # Deterministic session timezone so timestamp round-trips are stable.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
