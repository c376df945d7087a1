"""SparkSession factory tuned for the KG-construction workload.

Local mode is a sandbox proxy for a multi-executor cluster; every config here
is chosen to also be the right default on a 1000-executor cluster reading
100 TB:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting — the
  explicit skew handling demanded by BASELINE.json north_rule),
- Arrow on (all Python UDFs in this engine are pandas/Arrow-vectorized;
  per-row Python is banned by the north_rule),
- UTC session timezone (oracle comparisons against DuckDB, whose timestamps
  are UTC-naive),
- shuffle partitions sized to cores locally; on a real cluster AQE coalesces
  from a high initial number instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "codepropertygraph_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env_sp:
            shuffle_partitions = int(env_sp)
        else:
            # local: one shuffle partition per core. Cluster: set high (e.g.
            # 2000) and let AQE coalesce at runtime.
            n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
            shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing targets max(total/parallelism, minPartitionSize);
        # the 1m default lets a few-MB shuffle collapse to 2-4 partitions,
        # which serializes any downstream stage whose work EXPANDS past its
        # input bytes (wedge enumeration, closure joins, walk probes —
        # measured 5x on the link-prediction wedge stage at sf0.1). 64k keeps
        # small-input/large-fanout stages at full parallelism; large shuffles
        # are unaffected (their total/parallelism target already dominates).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: the driver heap IS the executor heap — size it like an
        # executor fleet (the sandbox has 128 GiB; cluster mode sets
        # spark.executor.memory instead).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
