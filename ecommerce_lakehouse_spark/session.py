"""SparkSession construction tuned for the engine.

The reference relies on Databricks-managed sessions; here we own the
configuration. Defaults are chosen for correctness-at-scale first:

- AQE on (runtime shuffle coalescing + skew-join splitting) — the sandbox
  stand-in for the skew handling a 1000-executor cluster needs.
- Arrow execution on, so the only Python that ever touches rows is
  vectorized (pandas/Arrow UDFs); per-row Python is banned by construction
  (see tests/test_no_per_row_python.py).
- Shuffle partitions sized to cores by default; at real cluster scale this
  is overridden to ~2-3x total cores and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ecommerce-lakehouse-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None uses ``SPARK_GRAFT_CPUS`` env or ``local[*]``. On a real
    cluster, master comes from spark-submit and ``cores`` is ignored.
    """
    if cores is None:
        env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env_cpus}]" if env_cpus else "local[*]"
    else:
        master = f"local[{cores}]"

    if shuffle_partitions is None:
        if cores is not None:
            shuffle_partitions = max(cores, 4)
        else:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # (r6 audit: coalescePartitions.parallelismFirst=false was
        # measured across the full bench and REVERTED — merge improved
        # ~0.4s but the window/agg queries and the CDC mirror lost more
        # than that to under-parallelized mid-size shuffles.)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Reads of explicit file lists (MERGE discovery/rewrite, compaction
        # bins, Z-order scopes) otherwise launch a whole Spark job just to
        # stat >32 paths — ~0.2-0.4 s of overhead per read on a local FS
        # where getFileStatus is microseconds (measured r6: a 64-task
        # listing job per merge). Object-store deployments, where parallel
        # listing genuinely pays, lower this via the env override or
        # spark-submit conf.
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_PARALLEL_LISTING_THRESHOLD", "1024"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def warm_python_workers(spark: SparkSession, cores: int | None = None) -> None:
    """Spawn and warm one Python (Arrow) worker per core with a trivial
    mapInPandas job, so the first real pandas-UDF stage doesn't pay N
    concurrent cold pandas imports (~20s at 32 threads in local mode).
    Long-running clusters amortize this; benchmarks must not measure it.

    r6: also warms the generic JVM engine machinery the first real query
    would otherwise pay for — the noop sink's classloading, WindowExec,
    decimal hash aggregation, broadcast-join plumbing, and (above all) the
    first Janino whole-stage-codegen compilations, whose JIT'ing of the
    compiler itself dominates first-query latency. All of it runs over a
    16-row in-memory range: engine warm-up only, no input data touched.
    """
    import pandas as pd  # noqa: F401

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    n = cores or spark.sparkContext.defaultParallelism

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(0, n * 2, 1, n * 2).mapInPandas(_noop, "id long").count()

    base = spark.range(0, 16, 1, 4).select(
        F.col("id"),
        (F.col("id") % 3).alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    w = Window.partitionBy("k").orderBy("id")
    toy = (
        base.withColumn("prev", F.lag("v").over(w))
        .withColumn(
            "run", F.sum("id").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        )
        .join(F.broadcast(base.groupBy("k").count()), "k")
        .groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("s"),
            F.count_distinct("id").alias("d"),
            F.max(F.md5(F.concat_ws("_", "k", "id"))).alias("h"),
        )
    )
    toy.write.format("noop").mode("overwrite").save()
    # the merge path's join shapes: broadcast left-semi (discovery) and
    # left-anti (insert detection)
    keys = base.select("k").distinct()
    (
        base.join(F.broadcast(keys), "k", "left_semi")
        .unionByName(base.join(F.broadcast(keys), "k", "left_anti"))
        .write.format("noop").mode("overwrite").save()
    )
