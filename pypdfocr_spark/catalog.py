"""Table I/O abstraction: Iceberg in production, parquet in this sandbox.

The north rule targets Iceberg tables (atomic snapshot commits, CDC for
the streaming modify-as-new-version case, sort orders for the size-class
pruning). The Iceberg runtime jar is not in this container, so the
functions below select the best available backend at session time and
keep the call sites backend-agnostic.

Production wiring (spark-submit):

    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.lake=org.apache.spark.sql.catalog.iceberg.SparkCatalog
    --conf spark.sql.catalog.lake.type=hive   # or rest/glue/hadoop

Then ``append(df, "lake.db.extracted")`` is an atomic Iceberg snapshot,
``read(spark, "lake.db.extracted")`` a snapshot-isolated scan, and
resume-from-snapshot is exactly lineage.resume_filter over the committed
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured and the runtime jar is
    on the classpath."""
    try:
        jvm_has_class = (
            spark._jvm.org.apache.spark.util.Utils.classForName(
                "org.apache.iceberg.spark.SparkCatalog", False, False
            )
            is not None
        )
    except Exception:
        return False
    confs = spark.sparkContext.getConf().getAll()
    return jvm_has_class and any(k.startswith("spark.sql.catalog.") for k, _ in confs)


def append(df: DataFrame, target: str) -> None:
    """Append rows to a table: Iceberg ``writeTo(...).append()`` (atomic
    snapshot) when available, parquet append otherwise."""
    if iceberg_available(df.sparkSession):
        df.writeTo(target).append()
    else:
        df.write.mode("append").parquet(target)


def read(spark: SparkSession, target: str) -> DataFrame:
    if iceberg_available(spark):
        return spark.read.table(target)
    return spark.read.parquet(target)
