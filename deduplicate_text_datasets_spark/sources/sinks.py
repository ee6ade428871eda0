"""Table sinks: Iceberg-first writers with a parquet fallback.

BASELINE.json ``input_hint`` specifies the canonical corpus as an Iceberg
table read with ``spark.read.format("iceberg")`` / written with
``df.writeTo(...)``. The sandbox container ships no Iceberg runtime jars,
so the dispatch is capability-based:

* an Iceberg (or any V2) catalog is configured  ->  ``df.writeTo(table)``
  (DataSourceV2 path: hidden-partition pruning, snapshot isolation,
  schema evolution come from the catalog);
* no catalog / filesystem path target           ->  parquet directory.

To enable the Iceberg path on a real cluster, configure e.g.::

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = hive            (or hadoop/rest)

and pass ``lake.db.documents`` as the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_path_target(target: str) -> bool:
    """Filesystem-ish targets (slash or URI scheme) go to parquet; dotted
    names go through the catalog."""
    return "/" in target or target.startswith(("file:", "s3:", "hdfs:", "gs:"))


def configured_catalogs(spark: SparkSession) -> list[str]:
    """Names of Spark SQL catalogs explicitly configured on this session
    (``spark.sql.catalog.<name>`` keys)."""
    prefix = "spark.sql.catalog."
    out = set()
    for key, _ in spark.sparkContext.getConf().getAll():
        if key.startswith(prefix):
            out.add(key[len(prefix) :].split(".", 1)[0])
    return sorted(out)


def write_table(
    df: DataFrame, target: str, mode: str = "overwrite"
) -> str:
    """Write ``df`` to ``target``; returns the physical route taken
    ('iceberg' or 'parquet') so pipelines can record it in lineage.

    ``mode``: 'overwrite' (create or replace) or 'append'.
    """
    spark = df.sparkSession
    if not is_path_target(target) and configured_catalogs(spark):
        writer = df.writeTo(target)
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return "iceberg"
    if not is_path_target(target):
        raise ValueError(
            f"table target {target!r} needs a configured V2 catalog "
            "(spark.sql.catalog.<name>); got none — pass a filesystem path "
            "for the parquet fallback"
        )
    df.write.mode("overwrite" if mode == "overwrite" else "append").parquet(
        target
    )
    return "parquet"


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Symmetric reader: catalog table via spark.table / path via parquet."""
    if not is_path_target(target) and configured_catalogs(spark):
        return spark.table(target)
    return spark.read.parquet(target)
