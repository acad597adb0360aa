"""SparkSession factory with the engine's scale-oriented defaults.

Sandbox runs ``local[N]`` single-JVM; on a real cluster the same conf ships
via ``spark-submit --py-files`` (BASELINE.json north_rule). Everything here
is plain public Spark configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pypdfocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a session with AQE + Arrow enabled.

    * AQE: runtime coalescing of post-shuffle partitions and skew-join
      splitting complement the pipeline's manual page-salting (SURVEY §4).
    * Arrow batch size is bounded so multi-MB heavy-document payloads
      can't blow up a single mapInPandas batch (the reference's analog:
      merging text pages before the zip "to save memory", CHANGES.rst
      v0.8.1 — here it's a one-line conf).
    * ``spark.sql.files.maxPartitionBytes`` left at default 128 MB — right
      for the parquet scan side at 100 TB; input splits stay bounded.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # match the parallelism level so one wave of tasks covers a shuffle
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(int(n), 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Pin the session zone: timestamp semantics (date_trunc, NTZ casts,
        # collect() rendering) must not depend on the host's TZ — the
        # round-1 tumbling-window hash diverged exactly this way when the
        # driver ran with a non-UTC zone.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
