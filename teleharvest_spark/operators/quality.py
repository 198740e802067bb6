"""Repetition / structural quality signals over raw document text —
the Gopher-style "repetitious content" rules every LLM training-data
pipeline runs before tokenization (duplicate-line fraction, duplicate-
line *character* fraction, most-frequent-word-bigram coverage, bullet-
point and ellipsis line ratios; Rae et al. 2021, public).

Reference analogue: the reference gates rows on min-length and
stop-words (``/root/reference/processor.py:90-95,107``) — these
signals are the corpus-quality generalization of that gate stack, the
same way ``functions/text.py::quality_score`` generalizes its score
thresholds.

Shape (all exact, no sampling):

* lines: one ``explode(split(text, '\\n'))`` → two-level hash
  aggregate — ``(doc_id, line)`` first (map-side partials collapse
  repeated lines before the exchange; a doc's duplicate lines are
  BY DEFINITION collapsible), then ``doc_id``. Everything per-line is
  a codegen predicate computed in the exploded frame — no interpreted
  higher-order-function lambdas in the per-line path.
* word bigrams: the words array is built once with the shared
  whitespace split; adjacent pairs via ``zip_with(words[:-1],
  words[1:])`` (one interpreted concat per word — the array is built
  once per doc, then everything downstream is codegen) → the same
  two-level ``(doc_id, bigram)`` / ``doc_id`` aggregate. Only the
  *count* of the top bigram leaves the aggregate, so no tie-break
  ambiguity exists.
* both branches re-join the input on ``doc_id`` — shuffle joins of
  per-doc aggregates (no broadcast: both sides are corpus-sized), AQE
  coalesces the post-agg sides. At 100 TB each branch is the classic
  word-count shape: Zipf-hot lines/bigrams are spread by the
  composite ``(doc_id, ·)`` key, so no salt is needed.

Counts, not fractions, cross the engine boundary: integer counts are
bit-exact under the driver's value-hash gate and across engines;
``repetition_fractions`` derives the guarded-division ratios
(reference C4 idiom, ``processor.py:116``) for API users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import WS

__all__ = ["repetition_signals", "repetition_fractions", "repetition_checks", "repetition_gate"]

_BULLETS = ("-", "*", "•")  # '-', '*', '•'


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repetition/structure counts.

    Output: ``id_col`` plus BIGINT columns

    * ``n_lines`` — line count of ``split(text, '\\n')`` (empty text
      is one empty line — trailing empties kept, matching both
      engines' split semantics);
    * ``n_dup_lines`` — line occurrences beyond each line's first
      (``n_lines - distinct_lines``);
    * ``chars_lines`` / ``chars_dup`` — characters across all line
      occurrences / across occurrences of lines appearing >1 time
      (the Gopher "duplicate line character fraction" numerator);
    * ``n_bullet`` / ``n_ellipsis`` — lines starting with a bullet
      glyph (``-``, ``*``, ``•``) / ending with ``...``;
    * ``n_bigrams`` / ``top_bigram_cnt`` — word-bigram occurrences
      and the count of the most frequent one (0 for docs with <2
      words — the "top 2-gram coverage" numerator).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(F.col(id_col), text.alias("_t"))

    lines = base.select(
        id_col, F.explode(F.split(F.col("_t"), "\n", -1)).alias("_line")
    )
    per_line = lines.groupBy(id_col, "_line").agg(F.count("*").alias("_c"))
    line_sig = per_line.groupBy(id_col).agg(
        F.sum("_c").alias("n_lines"),
        (F.sum("_c") - F.count("*")).alias("n_dup_lines"),
        F.sum(F.length("_line") * F.col("_c")).alias("chars_lines"),
        F.sum(
            F.when(F.col("_c") > 1, F.length("_line") * F.col("_c")).otherwise(F.lit(0))
        ).alias("chars_dup"),
        F.sum(
            F.when(F.substring("_line", 1, 1).isin(*_BULLETS), F.col("_c")).otherwise(F.lit(0))
        ).alias("n_bullet"),
        F.sum(
            F.when(F.col("_line").endswith("..."), F.col("_c")).otherwise(F.lit(0))
        ).alias("n_ellipsis"),
    )

    trimmed = F.trim(F.col("_t"))
    words = F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, WS + "+")
    )
    n_w = F.size(words)
    bigrams = F.when(n_w < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(words, 1, n_w - 1),
            F.slice(words, 2, n_w - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    big = base.select(id_col, F.explode(bigrams).alias("_bg"))
    per_big = big.groupBy(id_col, "_bg").agg(F.count("*").alias("_c"))
    big_sig = per_big.groupBy(id_col).agg(
        F.sum("_c").alias("n_bigrams"),
        F.max("_c").alias("top_bigram_cnt"),
    )

    out = (
        base.select(id_col)
        .join(line_sig, id_col, "left")
        .join(big_sig, id_col, "left")
    )
    zero = F.lit(0).cast("bigint")
    return out.select(
        id_col,
        *[
            F.coalesce(F.col(c).cast("bigint"), zero).alias(c)
            for c in (
                "n_lines", "n_dup_lines", "chars_lines", "chars_dup",
                "n_bullet", "n_ellipsis", "n_bigrams", "top_bigram_cnt",
            )
        ],
    )


def repetition_fractions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``repetition_signals`` plus the guarded-division ratios a
    filter rule consumes (Gopher thresholds: dup_line_frac > 0.30,
    dup_line_char_frac > 0.20, top_bigram_frac > 0.20 → drop)."""
    sig = repetition_signals(df, text_col=text_col, id_col=id_col)

    def ratio(num: str, den: str) -> F.Column:
        d = F.col(den).cast("double")
        return F.when(d > 0, F.col(num).cast("double") / d).otherwise(F.lit(0.0))

    return sig.select(
        "*",
        ratio("n_dup_lines", "n_lines").alias("dup_line_frac"),
        ratio("chars_dup", "chars_lines").alias("dup_line_char_frac"),
        ratio("n_bullet", "n_lines").alias("bullet_line_frac"),
        ratio("n_ellipsis", "n_lines").alias("ellipsis_line_frac"),
        # word-coverage approximation of Gopher's top-2-gram fraction:
        # each occurrence covers 2 of the n_bigrams+1 words; clamped to
        # 1.0 because overlapping occurrences ("the the the …") double-
        # count words.
        F.least(
            F.when(F.col("n_bigrams") > 0,
                   F.col("top_bigram_cnt").cast("double") * 2.0
                   / (F.col("n_bigrams").cast("double") + 1.0))
            .otherwise(F.lit(0.0)),
            F.lit(1.0),
        ).alias("top_bigram_frac"),
    )


def repetition_checks(
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_bigram_frac: float = 0.20,
):
    """The Gopher repetition rules as cascade ``Check``s over the
    fraction columns of :func:`repetition_fractions` (public
    thresholds: Rae et al. 2021 Table A1 — dup-line 0.30, dup-line
    chars 0.20, top-2-gram 0.20). Composes with
    ``cascade.apply_cascade`` so repetition failures ride the same
    verdict / first-fail / violations contract as every other check
    (reference early-exit reporting, processor.py:97-145)."""
    from .cascade import Check

    def over(col: str, bound: float, label: str) -> Check:
        c = F.col(col)
        return Check(
            name=label,
            fails=c > F.lit(bound),
            reason=F.format_string(f"{col}=%.4f > {bound}", c),
        )

    return [
        over("dup_line_frac", max_dup_line_frac, "dup_line_frac"),
        over("dup_line_char_frac", max_dup_line_char_frac, "dup_line_char_frac"),
        over("top_bigram_frac", max_top_bigram_frac, "top_bigram_frac"),
    ]


def repetition_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """``df`` + fraction columns + cascade verdict columns: rows whose
    repetition signals exceed the (Gopher-default) thresholds carry
    ``check_verdict = False`` and the first exceeded rule's name /
    reason. Input columns pass through untouched (join on ``id_col``),
    so the gate drops into an existing pipeline before tokenization."""
    from .cascade import apply_cascade

    fr = repetition_fractions(df, text_col=text_col, id_col=id_col).select(
        id_col, "dup_line_frac", "dup_line_char_frac", "top_bigram_frac"
    )
    joined = df.join(fr, id_col, "left")
    return apply_cascade(joined, repetition_checks(**thresholds))
