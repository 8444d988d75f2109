"""Format-abstracted warehouse: Parquet locally, Iceberg on a real cluster.

No Iceberg runtime jar ships in this sandbox and Maven Central is
unreachable (SURVEY.md environment facts), so the local implementation is
partitioned Parquet plus our own manifest table, behind an interface whose
Iceberg implementation differs only in DDL/DML strings
(``USING iceberg`` + MERGE for the manifest) — partition listing, pruning
and dynamic-partition overwrite have direct Iceberg equivalents.
"""

from __future__ import annotations

import os
import typing

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    """A directory of named tables.

    format='parquet' is the sandbox implementation; format='iceberg' is the
    cluster path (requires org.apache.iceberg:iceberg-spark-runtime on the
    classpath and a configured catalog) — write paths become saveAsTable /
    MERGE and reads become catalog lookups.
    """

    def __init__(self, root: str, fmt: str = "parquet"):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError("unsupported warehouse format {!r}".format(fmt))
        if fmt == "iceberg":
            raise NotImplementedError(
                "Iceberg catalog not available in this sandbox (no runtime jar, "
                "no network); on a cluster: spark.jars.packages="
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 and a catalog config"
            )
        self.root = root
        self.fmt = fmt

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and (
            any(f.endswith(".parquet") or f.startswith("bucket=") or f == "_SUCCESS"
                for f in os.listdir(p))
        )

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: typing.Sequence[str] = ()) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def append(self, df: DataFrame, name: str,
               partition_by: typing.Sequence[str] = ()) -> None:
        self.write(df, name, mode="append", partition_by=partition_by)

    def overwrite_partitions(self, df: DataFrame, name: str,
                             partition_by: typing.Sequence[str]) -> None:
        """Dynamic partition overwrite: replaces only the partitions present
        in df — the idempotence primitive for checkpoint re-runs (a killed
        batch's partial output is replaced wholesale on retry). Iceberg
        equivalent: INSERT OVERWRITE / replaceWhere."""
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*partition_by).parquet(self.path(name))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
