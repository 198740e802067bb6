"""Referential-integrity check — broadcast semi/anti join vs a dimension.

Reference analogue J3 (SURVEY.md §2.3): rows are processed only if
their channel is in the configured allowed list (processor.py:59,
settings.py:32-34). The allowed set is config-sized → ALWAYS the
broadcast side; the fact table never shuffles for this check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def allowed_rows(fact: DataFrame, dim: DataFrame, key: str = "source") -> DataFrame:
    """Rows whose key IS in the dimension (broadcast LEFT SEMI)."""
    return fact.join(F.broadcast(dim.select(key).distinct()), key, "left_semi")


def referential_violations(fact: DataFrame, dim: DataFrame, key: str = "source") -> DataFrame:
    """Rows whose key is NOT in the dimension (broadcast LEFT ANTI).

    NULL keys never match a semi OR anti join predicate the way the
    cascade's null_key check expects, so NULL/empty keys are included
    here explicitly — they are definitionally not members of the
    allowed set.
    """
    anti = fact.join(F.broadcast(dim.select(key).distinct()), key, "left_anti")
    return anti.select(
        (F.col("doc_id") if "doc_id" in fact.columns else F.lit(None).cast("string")).alias("doc_id"),
        F.col(key).alias("source"),
        F.lit("unknown_source").alias("check_name"),
        F.concat(
            F.lit(f"{key}="),
            F.coalesce(F.col(key), F.lit("NULL")),
            F.lit(" not in allowed dimension"),
        ).alias("reason"),
        (F.col("tokens") if "tokens" in fact.columns else F.lit(None).cast("array<int>")).alias("tokens"),
    )
