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

    NULL-key policy: a NULL key never equals any dimension value, so
    the anti join KEEPS NULL-key rows — they surface as
    unknown_source violations by construction (deliberate reliance on
    anti-join NULL semantics; no extra predicate needed).

    Empty-string keys are ordinary values here: '' rows are violations
    iff '' is absent from the dimension. Rejecting '' unconditionally
    is the cascade's null_key check (which runs BEFORE unknown_source
    in the suite ordering) — a '' row planted in the dimension cannot
    sneak past the suite, only past this standalone set-membership
    operator, which is the set semantics its callers ask for.
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
