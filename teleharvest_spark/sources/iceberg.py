"""Iceberg catalog wiring — production path, import-gated locally.

The engine's target storage is Iceberg (hidden partitioning by
`source`, bucketed `doc_id`, snapshot-based incremental reads). The
runtime jars are not in this container, so every call degrades to a
clear error or the parquet fallback; the SQL we would run is emitted
verbatim for inspection.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Base conf WITHOUT the warehouse path — see iceberg_conf(): a
# hadoop-type SparkCatalog REQUIRES spark.sql.catalog.local.warehouse
# and fails at first catalog use without it, so the complete dict can
# only be built once the deployment names its warehouse location.
ICEBERG_CONF = {
    "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.local.type": "hadoop",
}


def iceberg_conf(warehouse: str) -> dict:
    """The COMPLETE session conf for the local hadoop catalog: the
    static extension/catalog entries plus the mandatory warehouse
    path (an hdfs://, s3a://, or file:/ location). Apply at
    SparkSession build time — ``spark.sql.extensions`` is a static
    conf, inert if set on a running session."""
    return {**ICEBERG_CONF, "spark.sql.catalog.local.warehouse": warehouse}

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


# Maven coordinates of the runtime jar a deployment adds (match the
# artifact to the Spark minor + Scala version of the cluster):
#   spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0
# (for pyspark 4.1 use the 4.1 runtime artifact once published; the
# extension + catalog conf above is version-independent).
ICEBERG_JAR_HINT = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def runtime_jar_present() -> bool:
    """JVM-free availability probe: is an iceberg-spark-runtime jar on
    pyspark's jars dir or $SPARK_HOME/jars? Lets a test module decide
    skip-vs-run without paying a SparkSession start (the integration
    test needs a FRESH JVM anyway — ``spark.sql.extensions`` is a
    static conf, applied only at SparkContext construction)."""
    import glob
    import os

    roots = []
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except Exception:
        pass
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    extra = os.environ.get("ICEBERG_JARS_DIR")
    if extra:
        roots.append(extra)
    return any(
        glob.glob(os.path.join(r, "iceberg-spark-runtime*.jar")) for r in roots
    )


def current_snapshot_id(spark: SparkSession, table: str) -> int | None:
    """Current snapshot id of the main branch (None for an empty
    table) — the value the checkpoint manifest records as
    per-partition lineage. Read from the ``refs`` metadata table, NOT
    ``ORDER BY committed_at``: committed_at has millisecond grain, so
    two back-to-back commits can tie and make a timestamp sort pick
    the wrong 'latest', silently skewing every incremental window
    derived from it; the branch ref IS the lineage head."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime jars not on the classpath; production query:\n"
            f"SELECT snapshot_id FROM {table}.refs WHERE name = 'main'"
        )
    rows = spark.sql(
        f"SELECT snapshot_id FROM {table}.refs WHERE name = 'main'"
    ).collect()
    return int(rows[0][0]) if rows else None


def read_incremental(
    spark: SparkSession,
    table: str,
    start_snapshot_id: int,
    end_snapshot_id: int | None = None,
):
    """Rows APPENDED strictly after ``start_snapshot_id`` (exclusive)
    up to ``end_snapshot_id`` (inclusive; default current) — Iceberg's
    incremental scan. This is the production form of the engine's
    watermark-incremental source (operators/watermark.py): instead of
    filtering on a timestamp column, the table's own snapshot lineage
    bounds the scan, so a resumed validation reads exactly the files
    committed since the manifest's recorded snapshot — no full-table
    scan, no late-arrival ambiguity."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime jars not on the classpath; production read:\n"
            f"spark.read.format('iceberg')"
            f".option('start-snapshot-id', {start_snapshot_id}).load('{table}')"
        )
    reader = spark.read.format("iceberg").option(
        "start-snapshot-id", str(start_snapshot_id)
    )
    if end_snapshot_id is not None:
        reader = reader.option("end-snapshot-id", str(end_snapshot_id))
    return reader.load(table)


def create_sequences_table(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime jars not on the classpath in this container; "
            "production DDL:\n" + CREATE_SEQUENCES_DDL
        )
    spark.sql(CREATE_SEQUENCES_DDL)
