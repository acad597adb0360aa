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


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32, sort: bool = True
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) by ``key``.

    Bucketing is the co-located-join primitive at 100 TB: two tables
    bucketed by the same key with the same bucket count join with ZERO
    exchange — each task zips bucket i with bucket i (sorted buckets also
    skip the sort of a sort-merge join). This is how the resume anti-join
    (committed urls vs incoming corpus) and repeated dedup self-joins
    avoid re-shuffling the big side on every run. Iceberg mapping: a
    ``bucket(N, key)`` partition transform on the table spec.

    Uses ``saveAsTable`` (bucketing metadata lives in the session
    catalog; plain ``.parquet(path)`` cannot record it).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by :func:`write_bucketed` with its bucketing
    metadata intact (the reader must come from the catalog, not the
    files, or the join planner won't see the bucket spec)."""
    return spark.read.table(table)
