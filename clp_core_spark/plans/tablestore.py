"""Table-format abstraction: Iceberg when its Spark runtime is on the
classpath, partitioned parquet otherwise — ONE writer/reader interface so
the pipeline code never branches on the format.

SURVEY §1.5 maps CLP's archive structures onto table-format concepts:

- archive            -> table partition (``epoch_part``)
- segment            -> data files inside a partition (clustered writes)
- segment index      -> column stats (Iceberg manifests / parquet footers)
- incremental ingest -> idempotent partition overwrite (Iceberg
  ``overwritePartitions`` snapshot / parquet dynamic partition overwrite)

The sandbox image has no Iceberg runtime jar, so the Iceberg branch is
exercised only when ``iceberg_available()`` (tests guard on it); the
parquet branch is the CI path. Both satisfy the same contract:
``overwrite_partitions`` is idempotent per partition value and
``read(partition_filter=...)`` prunes unselected partitions from the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath AND a
    Spark catalog is configured for it."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:  # noqa: BLE001 — class not on classpath
        return False
    confs = spark.sparkContext.getConf().getAll()
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
        for k, v in confs
    )


class TableStore:
    """Format-agnostic partitioned table writer/reader rooted at ``root``
    (parquet) or under ``catalog.namespace`` (Iceberg).

    mode: ``"auto"`` picks Iceberg when available, else parquet;
    ``"parquet"`` / ``"iceberg"`` force a branch (forcing iceberg without
    the runtime raises)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        mode: str = "auto",
        catalog: str = "spark_catalog",
        namespace: str = "clp",
    ):
        self.spark = spark
        self.root = root
        self.catalog = catalog
        self.namespace = namespace
        if mode == "auto":
            self.format = "iceberg" if iceberg_available(spark) else "parquet"
        elif mode == "iceberg":
            if not iceberg_available(spark):
                raise RuntimeError("Iceberg runtime not on the classpath")
            self.format = "iceberg"
        else:
            self.format = "parquet"

    # -- naming --------------------------------------------------------------

    def table_path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def _qualified(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    # -- write ---------------------------------------------------------------

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_cols: list[str]
    ) -> None:
        """Replace exactly the partitions present in ``df`` (idempotent
        under retries; other partitions untouched). Iceberg: one
        ``overwritePartitions`` snapshot commit. Parquet: dynamic
        partition overwrite."""
        if self.format == "iceberg":
            name = self._qualified(table)
            if not self.spark.catalog.tableExists(name):
                (
                    df.writeTo(name)
                    .partitionedBy(*[F.col(c) for c in partition_cols])
                    .create()
                )
            else:
                df.writeTo(name).overwritePartitions()
            return
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(self.table_path(table))
        )

    # -- read ----------------------------------------------------------------

    def read(
        self,
        table: str,
        partition_filter: dict[str, list] | None = None,
    ) -> DataFrame:
        """Read the table; ``partition_filter={col: [values]}`` restricts
        the scan to those partitions. Iceberg prunes via manifests from
        the pushed ``IN`` predicate; parquet mode lists ONLY the selected
        first-level partition directories (structural pruning) when the
        filter's first key is the leading partition column, and pushes
        the rest as predicates."""
        if partition_filter and any(len(list(v)) == 0 for v in partition_filter.values()):
            # e.g. a time range overlapping no ledger epoch: zero selected
            # partitions must mean an EMPTY result, not a zero-path read
            # error — keep the table schema, let the optimizer collapse it
            return self.read(table).where(F.lit(False))
        if self.format == "iceberg":
            df = self.spark.read.table(self._qualified(table))
            for col, values in (partition_filter or {}).items():
                df = df.filter(F.col(col).isin(list(values)))
            return df
        base = self.table_path(table)
        if not partition_filter:
            return self.spark.read.parquet(base)
        items = list(partition_filter.items())
        lead_col, lead_vals = items[0]
        df = self.spark.read.option("basePath", base).parquet(
            *[f"{base}/{lead_col}={v}" for v in lead_vals]
        )
        for col, values in items[1:]:
            df = df.filter(F.col(col).isin(list(values)))
        return df
