"""Embedding-payload validation — the cascade contract applied to the
``embeddings`` table (vec_id, embedding array<float>, label).

Every consumer of the embedding column (ANN similarity.py, semantic
dedup semdedup.py, LSH near-dups dedup.py) assumes non-NULL,
fixed-dimension, finite, non-degenerate vectors — and each one handles
violations by silently routing rows to a "no bucket / cell −1" path.
A VALIDATION engine should surface those rows as first-class violation
rows *before* they silently vanish from similarity joins, exactly like
the sequences cascade surfaces NULL/short payloads (reference
analogue: the payload checks of ``_process_message``,
/root/reference/processor.py:97-109, applied to a vector payload).

All checks are per-row codegen expressions (HOF ``exists`` /
``aggregate`` — no UDFs, no shuffles); the per-source rollup is one
partial-agg pass, the same shape as stats.partition_stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .cascade import Check, apply_cascade, FIRST_FAIL_COL, REASON_COL

__all__ = ["embedding_checks", "validate_embeddings", "embedding_stats"]

_INF = float("inf")


def _nonfinite(x: Column) -> Column:
    return F.isnan(x) | (F.abs(x) == F.lit(_INF))


def _sq_norm(vec: Column) -> Column:
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def embedding_checks(
    dim: int | None,
    vec_col: str = "embedding",
    forbid_zero_norm: bool = True,
) -> list[Check]:
    """Ordered cascade for a vector payload: NULL vector, empty vector,
    wrong dimension (when ``dim`` given — callers of similarity/semdedup
    must pass the model dimension), non-finite element (NaN/±Inf —
    cosine against these poisons every score downstream), zero norm
    (cosine undefined; guarded-division consumers emit NULL/0 scores).

    Check order = diagnosis order: a NULL vector must not also report
    zero_norm, and a NaN vector reports the NaN, not the NaN-poisoned
    norm (the sum-of-squares of a non-finite vector is itself
    non-finite, never 0.0, so zero_norm stays well-defined).

    ``null_element`` precedes the numeric checks because a NULL
    element makes every downstream predicate three-valued: isnan(NULL)
    is NULL, so ``exists`` returns NULL and the cascade's
    NULL-means-pass coalesce would wave the row through every check —
    the exact malformed payload this module exists to surface. The
    ``x.isNull()`` lambda itself is never NULL, so this one predicate
    is immune to the trap it guards against."""
    vec = F.col(vec_col)
    checks = [
        Check("null_vector", vec.isNull(), F.lit(f"{vec_col} is NULL")),
        Check("empty_vector", F.size(vec) == 0, F.lit(f"{vec_col} is empty")),
        Check(
            "null_element",
            F.exists(vec, lambda x: x.isNull()),
            F.concat(
                F.size(F.filter(vec, lambda x: x.isNull())).cast("string"),
                F.lit(" NULL element(s)"),
            ),
        ),
    ]
    if dim is not None:
        checks.append(
            Check(
                "wrong_dim",
                F.size(vec) != F.lit(int(dim)),
                F.concat(
                    F.lit("dim="), F.size(vec).cast("string"), F.lit(f" != {int(dim)}")
                ),
            )
        )
    n_bad = F.size(F.filter(vec, _nonfinite))
    checks.append(
        Check(
            "nonfinite_element",
            F.exists(vec, _nonfinite),
            F.concat(n_bad.cast("string"), F.lit(" non-finite element(s)")),
        )
    )
    if forbid_zero_norm:
        checks.append(
            Check("zero_norm", _sq_norm(vec) == 0.0, F.lit("all-zero vector"))
        )
    return checks


def validate_embeddings(
    df: DataFrame,
    dim: int | None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    forbid_zero_norm: bool = True,
) -> DataFrame:
    """Violation rows (id, check_name, reason) for the embeddings
    table — the embeddings counterpart of the sequences violations
    table. One narrow scan, 0-or-1 output rows per input row."""
    annotated = apply_cascade(df, embedding_checks(dim, vec_col, forbid_zero_norm))
    return (
        annotated.where(F.col(FIRST_FAIL_COL).isNotNull())
        .select(
            F.col(id_col),
            F.col(FIRST_FAIL_COL).alias("check_name"),
            F.col(REASON_COL).alias("reason"),
        )
    )


def embedding_stats(
    df: DataFrame,
    dim: int | None,
    vec_col: str = "embedding",
    key: str | None = None,
    forbid_zero_norm: bool = True,
) -> DataFrame:
    """Per-``key`` (or global, key=None) anomaly counts — the
    partition_stats shape over the vector payload: one partial-agg
    scan, exact BIGINT counts (bit-stable across engines)."""
    annotated = apply_cascade(df, embedding_checks(dim, vec_col, forbid_zero_norm))
    fail = F.col(FIRST_FAIL_COL)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((fail == "null_vector").cast("long")).alias("n_null_vector"),
        F.sum((fail == "empty_vector").cast("long")).alias("n_empty_vector"),
        F.sum((fail == "null_element").cast("long")).alias("n_null_element"),
        F.sum((fail == "wrong_dim").cast("long")).alias("n_wrong_dim"),
        F.sum((fail == "nonfinite_element").cast("long")).alias("n_nonfinite"),
        F.sum((fail == "zero_norm").cast("long")).alias("n_zero_norm"),
        F.sum(fail.isNotNull().cast("long")).alias("n_violations"),
    ]
    return annotated.groupBy(key).agg(*aggs) if key else annotated.agg(*aggs)
