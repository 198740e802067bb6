"""Iceberg catalog wiring — production path, import-gated locally.

The engine's target storage is Iceberg (hidden partitioning by
`source`, bucketed `doc_id`, snapshot-based incremental reads). The
runtime jars are not in this container, so every call degrades to a
clear error or the parquet fallback; the SQL we would run is emitted
verbatim for inspection.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ICEBERG_CONF = {
    "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.local.type": "hadoop",
}

CREATE_SEQUENCES_DDL = """
CREATE TABLE IF NOT EXISTS local.db.sequences (
    doc_id STRING,
    tokens ARRAY<INT>,
    n_tok INT,
    source STRING
) USING iceberg
PARTITIONED BY (source, bucket(64, doc_id))
TBLPROPERTIES ('write.target-file-size-bytes'='134217728')
"""


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def create_sequences_table(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime jars not on the classpath in this container; "
            "production DDL:\n" + CREATE_SEQUENCES_DDL
        )
    spark.sql(CREATE_SEQUENCES_DDL)
