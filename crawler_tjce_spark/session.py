"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]`` threads, but every config here is
chosen to also hold on a 1000-executor cluster: AQE for runtime
re-planning (skew joins, partition coalescing), shuffle partitions sized
explicitly, Arrow enabled for the vectorized-UDF slow path, and UTC
session time zone so results compare bit-for-bit against the DuckDB
oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "crawler_tjce_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` may be an int (→ ``local[n]``), ``"*"``, or ``None`` to use
    ``$SPARK_GRAFT_CPUS`` (default 32). On a real cluster the master URL
    comes from spark-submit and this factory only applies SQL confs.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, int(str(cores)))
        except ValueError:
            shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # dynamic partition overwrite: the bucketed seen index replays a
        # crashed wave by overwriting ONLY that wave's partition (static
        # mode would wipe the whole table on every insert-overwrite)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # FAIR scheduling: the crawl runner overlaps the big payload-fetch
        # job with small bookkeeping jobs (links/seen/frontier) from a
        # second thread; under FIFO the small jobs queue behind the payload
        # job's task set and the overlap is lost. Single-job workloads are
        # unaffected. The allocation file makes the *default pool itself*
        # FAIR — without it intra-pool scheduling is FIFO and the mode
        # alone changes nothing (ADVICE r2).
        .config("spark.scheduler.mode", "FAIR")
        .config(
            "spark.scheduler.allocation.file",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "fairscheduler.xml"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table (see TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
