"""Deterministic synthetic `sequences` generator with planted violations.

Parallelism-independence is the hard requirement (SURVEY.md §7 hard
part (c)): every field derives from the global row index via
``xxhash64`` column expressions over ``spark.range``, so local[8] and
local[32] (or 1000 executors) produce byte-identical tables. No RNG
state, no Python loops — whole-stage-codegen JVM expressions only.

Planted violation classes mirror FIXTURES.md / the reference's edge
cases (tests/test_processor.py): duplicate keys, null/empty payload,
too-short/too-long, n_tok inconsistency, null/empty/unknown source,
banned tokens, one drifted partition, boundary values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import CheckSuite
from .session import local_df

VOCAB = 50257
SOURCES = [f"src_{i:02d}" for i in range(8)]
ROGUE_SOURCE = "src_rogue"
DRIFTED_SOURCE = "src_07"
# Default banned ids planted by the generator (T3 dimension).
BANNED_IDS = tuple(range(50000, 50020))

# Modulo slots for each planted violation class. Chosen co-prime so
# classes rarely overlap; each class's expected rate ~0.1%.
_SLOTS = {
    "dup": (1000, 999),       # duplicates the previous row's doc_id
    "null_tokens": (1009, 7),
    "empty_tokens": (1013, 11),
    "too_short": (977, 13),
    "too_long": (1021, 17),
    "inconsistent": (997, 19),
    "null_source": (1031, 23),
    "empty_source": (1033, 29),
    "rogue_source": (211, 31),
    "banned": (503, 37),
    "boundary_min": (1049, 41),  # n_tok exactly == min_n_tok (must PASS)
    "boundary_under": (1051, 43),  # n_tok == min_n_tok - 1 (must FAIL)
}


def _slot(name: str) -> F.Column:
    mod, rem = _SLOTS[name]
    return F.col("id") % mod == rem


def _h(salt: int) -> F.Column:
    """Deterministic per-row uniform hash in [0, 2^63)."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(salt)))


def generate_sequences(
    spark: SparkSession,
    n_rows: int,
    suite: CheckSuite | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the synthetic fact table (doc_id, tokens, n_tok, source).

    ~50% of rows land in the hot source ``src_00`` (skew/salting path);
    ``src_07`` carries a drifted n_tok distribution (mean ×2) for the
    KS/PSI checks.

    ``suite.min_n_tok`` must be ≥ 2: the planted too_short rows use
    max(1, min//3) and boundary_under uses min−1 — at min ≤ 1 both
    classes silently become PASSING rows (and sequence(1, 0) even
    auto-steps to a 2-element array), so fixture assertions on
    planted-violation counts would miscount with no error.
    """
    suite = suite or CheckSuite()
    if suite.min_n_tok < 2:
        raise ValueError(
            f"generate_sequences needs suite.min_n_tok >= 2 (got "
            f"{suite.min_n_tok}): the planted too_short/boundary_under "
            "rows degenerate into passing rows below that"
        )
    df = spark.range(0, n_rows, 1, num_partitions or max(8, n_rows // 250_000))

    # --- source: hot-key skew + planted bad keys -------------------------
    src_pick = _h(1) % 16  # 0-7 → src_00 (50%), 8-15 → src_01..src_07 + drift
    source = (
        F.when(_slot("null_source"), F.lit(None).cast("string"))
        .when(_slot("empty_source"), F.lit(""))
        .when(_slot("rogue_source"), F.lit(ROGUE_SOURCE))
        .when(src_pick < 8, F.lit(SOURCES[0]))
        .otherwise(F.concat(F.lit("src_0"), (src_pick % 7 + 1).cast("string")))
    )

    # --- n_tok: lognormal-ish in [min, ~4k]; drifted partition ×2 --------
    # Sum of two uniforms → triangular; squared shrinks toward the floor.
    u1 = (_h(2) % 1000).cast("double") / 1000.0
    u2 = (_h(3) % 1000).cast("double") / 1000.0
    base_len = (F.lit(suite.min_n_tok) + ((u1 * u2) * 4000).cast("int")).cast("int")
    n_tok = (
        F.when(_slot("too_short"), F.lit(max(1, suite.min_n_tok // 3)))
        .when(_slot("boundary_min"), F.lit(suite.min_n_tok))
        .when(_slot("boundary_under"), F.lit(suite.min_n_tok - 1))
        .when(_slot("too_long"), F.lit(suite.max_n_tok + 123))
        .when(F.col("source") == DRIFTED_SOURCE, base_len * 2)
        .otherwise(base_len)
    )

    # --- tokens: array derived from (id, position) hashes ----------------
    # transform(sequence(...)) is JVM-side; element j of row i is
    # xxhash64(i, j) % modulus — deterministic and partition-independent.
    # The drifted source draws from HALF the vocab (FIXTURES.md T1:
    # "token-id histogram reweighted") so PSI on token-id buckets flags
    # exactly that partition; both moduli stay below the banned-id
    # range [50000, 50020) so only the planted slot rows carry banned
    # tokens.
    tok_modulus = F.when(
        F.col("source") == DRIFTED_SOURCE, F.lit(24500)
    ).otherwise(F.lit(49000))
    tok_expr = F.transform(
        F.sequence(F.lit(1), F.col("n_tok")),
        lambda j: (F.abs(F.xxhash64(F.col("id"), j)) % tok_modulus).cast("int"),
    )
    banned_lit = F.lit(int(BANNED_IDS[0]))

    df = (
        df.withColumn("source", source)
        .withColumn("n_tok", n_tok)
        .withColumn(
            "tokens",
            F.when(_slot("null_tokens"), F.lit(None).cast("array<int>"))
            .when(_slot("empty_tokens"), F.array().cast("array<int>"))
            .when(_slot("banned"), F.concat(tok_expr, F.array(banned_lit)))
            .otherwise(tok_expr),
        )
    )
    # Keep n_tok consistent with the actual array (empty → 0, banned → +1)
    # EXCEPT on the planted-inconsistent slot.
    df = df.withColumn(
        "n_tok",
        F.when(_slot("null_tokens"), F.lit(None).cast("int"))
        .when(_slot("empty_tokens"), F.lit(0))
        .when(_slot("inconsistent"), F.size("tokens") + 1)
        .otherwise(F.coalesce(F.size("tokens"), F.col("n_tok"))),
    )
    # Duplicate key: slot rows reuse the previous row's doc_id.
    df = df.withColumn(
        "doc_id",
        F.when(_slot("dup"), F.concat(F.lit("doc_"), (F.col("id") - 1).cast("string")))
        .otherwise(F.concat(F.lit("doc_"), F.col("id").cast("string"))),
    )
    return df.select("doc_id", "tokens", "n_tok", "source")


def allowed_sources_dim(spark: SparkSession, suite: CheckSuite | None = None) -> DataFrame:
    """T2 — allowed-source dimension (excludes the rogue source)."""
    suite = suite or CheckSuite()
    rows = [(s, suite.min_n_tok, suite.max_n_tok) for s in SOURCES]
    return local_df(spark, rows, "source string, min_n_tok int, max_n_tok int")


def banned_tokens_dim(spark: SparkSession) -> DataFrame:
    """T3 — disallowed token ids."""
    rows = [(int(t), "planted_banned") for t in BANNED_IDS]
    return local_df(spark, rows, "token_id int, reason string")
