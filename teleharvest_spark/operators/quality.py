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

__all__ = [
    "repetition_signals",
    "repetition_fractions",
    "repetition_checks",
    "repetition_gate",
    "gopher_word_signals",
    "gopher_word_checks",
    "gopher_word_gate",
    "c4_clean_lines",
    "c4_page_checks",
    "encoding_signals",
    "encoding_checks",
    "encoding_gate",
    "language_signals",
    "language_checks",
    "language_gate",
    "compression_signals",
    "compression_checks",
    "compression_gate",
    "quality_gate",
    "family_signal_cols",
    "QUALITY_FAMILIES",
    "GOPHER_STOPWORDS",
    "distinct_frac_expr",
    "max_token_run_expr",
    "token_degeneracy_signals",
    "token_degeneracy_checks",
]

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
    * ``n_dup_lines`` — NON-EMPTY line occurrences beyond each line's
      first. Empty lines are excluded from the duplicate numerator:
      blank paragraph separators repeat in perfectly ordinary prose
      ("p1\\n\\np2\\n\\np3\\n\\np4\\n\\np5" would otherwise count 3
      dups in 9 lines = 0.33 and fail the 0.30 Gopher gate), and
      ``chars_dup`` already weights them at zero;
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
        F.sum(
            F.when(F.col("_line") != "", F.col("_c") - 1).otherwise(F.lit(0))
        ).alias("n_dup_lines"),
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

    # non-empty pieces only (space-only F.trim would leave phantom ''
    # words around tabs/newlines at the text edges — see token_count)
    words = F.filter(
        F.split(F.col("_t"), WS + "+"), lambda w: w != ""
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


# Gopher's small stop list (Rae et al. 2021 Table A1: a document must
# contain >= 2 of these) — public constants.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_word_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document WORD-level Gopher quality counts (the word-shape
    complement of :func:`repetition_signals`): ``n_words``,
    ``chars_words`` (mean word length = chars_words / n_words),
    ``n_alpha_words`` (words containing an ASCII letter),
    ``n_symbol_words`` (hash / ellipsis words), ``n_stopword_kinds``
    (DISTINCT members of the 8-word Gopher stop list present).

    Same execution shape as the line branch: one
    ``explode(split(text))`` then a single hash aggregate with
    conditional sums — every per-word predicate is a codegen
    expression in the exploded frame, no interpreted lambdas; the
    distinct-stopword count is a tiny (≤8-element) collect_set per
    doc. Docs with NULL/empty text report all-zero (left join in the
    gate, coalesce here via the aggregate's absence)."""
    s = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    words = F.when(
        s == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(s), WS + "+"))
    ex = df.select(F.col(id_col), F.explode(words).alias("_w"))
    is_stop = F.col("_w").isin(*GOPHER_STOPWORDS)
    agg = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("_w")).alias("chars_words"),
        F.sum(F.when(F.col("_w").rlike("[a-zA-Z]"), 1).otherwise(0)).alias(
            "n_alpha_words"
        ),
        F.sum(
            F.when(
                (F.col("_w") == "#")
                | F.col("_w").contains("...")
                | F.col("_w").contains("…"),
                1,
            ).otherwise(0)
        ).alias("n_symbol_words"),
        F.size(
            F.collect_set(F.when(is_stop, F.col("_w")))
        ).alias("n_stopword_kinds"),
    )
    zero = [
        F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
        for c in (
            "n_words", "chars_words", "n_alpha_words",
            "n_symbol_words", "n_stopword_kinds",
        )
    ]
    return df.select(id_col).join(agg, id_col, "left").select(id_col, *zero)


def gopher_word_checks(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_frac: float = 0.10,
    min_alpha_word_frac: float = 0.80,
    min_stopword_kinds: int = 2,
):
    """The word-level Gopher rules as cascade ``Check``s over
    :func:`gopher_word_signals` columns (public thresholds, Rae et al.
    2021 Table A1). Guarded divisions throughout — a 0-word doc fails
    the word-count rule first (cascade order), never divides."""
    from .cascade import Check

    n = F.col("n_words").cast("double")
    mean_len = F.when(n > 0, F.col("chars_words") / n)
    sym = F.when(n > 0, F.col("n_symbol_words") / n).otherwise(F.lit(0.0))
    alpha = F.when(n > 0, F.col("n_alpha_words") / n).otherwise(F.lit(0.0))
    return [
        Check(
            name="word_count",
            fails=(F.col("n_words") < min_words) | (F.col("n_words") > max_words),
            reason=F.format_string(
                f"n_words=%d outside [{min_words}, {max_words}]", F.col("n_words")
            ),
        ),
        Check(
            name="mean_word_len",
            fails=(mean_len < min_mean_word_len) | (mean_len > max_mean_word_len),
            reason=F.format_string(
                f"mean_word_len=%.2f outside [{min_mean_word_len}, "
                f"{max_mean_word_len}]", mean_len,
            ),
        ),
        Check(
            name="symbol_word_frac",
            fails=sym > max_symbol_word_frac,
            reason=F.format_string(
                f"symbol_word_frac=%.4f > {max_symbol_word_frac}", sym
            ),
        ),
        Check(
            name="alpha_word_frac",
            fails=alpha < min_alpha_word_frac,
            reason=F.format_string(
                f"alpha_word_frac=%.4f < {min_alpha_word_frac}", alpha
            ),
        ),
        Check(
            name="stopword_kinds",
            fails=F.col("n_stopword_kinds") < min_stopword_kinds,
            reason=F.format_string(
                f"n_stopword_kinds=%d < {min_stopword_kinds}",
                F.col("n_stopword_kinds"),
            ),
        ),
    ]


def gopher_word_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """``df`` + word-signal columns + cascade verdicts for the word-
    level Gopher rules — same contract as :func:`repetition_gate`
    (compose the two for the full Gopher quality stack)."""
    from .cascade import apply_cascade

    sig = gopher_word_signals(df, text_col=text_col, id_col=id_col)
    joined = df.join(sig, id_col, "left")
    return apply_cascade(joined, gopher_word_checks(**thresholds))


# --- C4-style line cleaning (Raffel et al. 2020, public rules) -------

_TERMINAL = ('.', '!', '?', '"', "'")


def c4_clean_lines(
    col: F.Column,
    min_words_per_line: int = 3,
    drop_word: str = "javascript",
) -> F.Column:
    """C4's line-level cleanup as a TEXT PROJECTION: keep only lines
    that end in terminal punctuation, have ≥ ``min_words_per_line``
    words, and don't contain the boilerplate marker word; rebuild the
    text from the survivors.

    Implementation note: this uses higher-order ``filter`` lambdas,
    which Catalyst interprets per LINE (not per char) — lines per doc
    is small, and the alternative (posexplode → filter → re-aggregate
    ordered by position) adds a corpus-wide shuffle to keep line
    order. A cleanup projection that stays row-shaped is the better
    trade; the heavy per-line ANALYSIS paths (repetition counts) use
    the exploded-aggregate shape instead."""
    lines = F.split(F.coalesce(col, F.lit("")), "\n")
    kept = F.filter(
        lines,
        lambda l: (
            F.substring(F.rtrim(l), -1, 1).isin(*_TERMINAL)
            & (F.size(F.split(F.trim(l), WS + "+")) >= min_words_per_line)
            & ~F.lower(l).contains(drop_word)
        ),
    )
    return F.array_join(kept, "\n")


def c4_page_checks(min_lines: int = 3):
    """C4's page-level drops as cascade ``Check``s over the CLEANED
    text column (apply after :func:`c4_clean_lines`): 'lorem ipsum'
    anywhere, a curly brace (code), or too few surviving lines."""
    from .cascade import Check

    t = F.coalesce(F.col("clean_text"), F.lit(""))
    n_lines = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, "\n")))
    return [
        Check(
            name="lorem_ipsum",
            fails=F.lower(t).contains("lorem ipsum"),
            reason=F.lit("boilerplate marker 'lorem ipsum'"),
        ),
        Check(
            name="curly_brace",
            fails=t.contains("{"),
            reason=F.lit("curly brace (likely code)"),
        ),
        Check(
            name="too_few_lines",
            fails=n_lines < min_lines,
            reason=F.format_string(f"kept_lines=%d < {min_lines}", n_lines),
        ),
    ]


# ---------------------------------------------------------------------------
# encoding / mojibake quality rules

# Classic UTF-8-read-as-Latin-1 double-encoding markers: a multibyte
# UTF-8 sequence misdecoded one byte per char surfaces as U+00C3 or
# U+00C2 followed by a continuation-range char (U+0080-00BF), or as
# U+00E2 U+0080 (the three-byte punctuation block: curly quotes,
# dashes, ellipsis). Precision-over-recall like the PII patterns
# (functions/text.py): a legitimate A-tilde/A-circumflex followed by a
# continuation-range char is vanishingly rare in natural text; single
# accented letters NOT followed by one never match.
MOJIBAKE_RE = "(?:\u00C3[\u0080-\u00BF]|\u00C2[\u0080-\u00BF]|\u00E2\u0080)"
# C0 control chars except tab/newline/carriage-return.
CONTROL_RE = "[\x00-\x08\x0B\x0C\x0E-\x1F]"
REPLACEMENT_CHAR = "\uFFFD"


def encoding_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document encoding-noise counts and guarded fractions:
    ``n_replacement`` (U+FFFD — a decoder already gave up there),
    ``n_control`` (C0 controls except tab/LF/CR), ``n_mojibake``
    (double-encoding marker sequences), ``n_chars``, plus
    ``replacement_frac`` / ``control_frac`` over ``n_chars``. NULL text
    counts as empty (all zero). Pure codegen (``regexp_count``), zero
    shuffles — the cheapest check family in the engine.

    Reference analogue: the reference trusts telethon to hand it clean
    UTF-8 (models/message.py text column); a web-scale ingest cannot,
    so the gate moves into the engine.
    """
    s = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(s)
    n_repl = F.regexp_count(s, F.lit(REPLACEMENT_CHAR))
    n_ctrl = F.regexp_count(s, F.lit(CONTROL_RE))
    n_moji = F.regexp_count(s, F.lit(MOJIBAKE_RE))
    frac = lambda c: F.when(  # noqa: E731
        n_chars > 0, c.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        n_moji.alias("n_mojibake"),
        frac(n_repl).alias("replacement_frac"),
        frac(n_ctrl).alias("control_frac"),
    )


def encoding_checks(
    max_replacement: int = 0,
    max_control_frac: float = 0.001,
    max_mojibake: int = 2,
):
    """Encoding rules as cascade ``Check``s over the columns of
    :func:`encoding_signals`: any U+FFFD fails by default (its presence
    is proof of a decode error, not a style judgment), control chars
    fail by fraction (isolated artifacts in long docs survive), and
    more than ``max_mojibake`` marker sequences fails (a couple can be
    a legit foreign-text collision; a run of them is a misdecoded
    document)."""
    from .cascade import Check

    return [
        Check(
            name="replacement_chars",
            fails=F.col("n_replacement") > F.lit(max_replacement),
            reason=F.format_string(
                f"n_replacement=%d > {max_replacement}", F.col("n_replacement")
            ),
        ),
        Check(
            name="control_chars",
            fails=F.col("control_frac") > F.lit(max_control_frac),
            reason=F.format_string(
                f"control_frac=%.5f > {max_control_frac}", F.col("control_frac")
            ),
        ),
        Check(
            name="mojibake",
            fails=F.col("n_mojibake") > F.lit(max_mojibake),
            reason=F.format_string(
                f"n_mojibake=%d > {max_mojibake}", F.col("n_mojibake")
            ),
        ),
    ]


def encoding_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """``df`` + encoding-signal columns + cascade verdict columns —
    same contract as :func:`repetition_gate` / :func:`gopher_word_gate`
    so the families compose into one quality pass."""
    from .cascade import apply_cascade

    sig = encoding_signals(df, text_col=text_col, id_col=id_col).select(
        id_col, "n_replacement", "n_mojibake", "replacement_frac", "control_frac"
    )
    joined = df.join(sig, id_col, "left")
    return apply_cascade(joined, encoding_checks(**thresholds))


def language_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document language-routing signals: ``lang`` (the marker-
    stopword argmax from :func:`~..functions.text.lang_id`, 'und' when
    no marker hits) and ``lang_hit_frac`` — the winning language's
    marker hits over the whitespace word count, the heuristic's
    evidence density (the role fastText's confidence plays in the
    public C4/CCNet language routers; swap point for a real classifier
    is a pandas UDF with per-executor model init, the U1 idiom). Pure
    codegen regexp counts, zero shuffles."""
    from ..functions.text import _LANG_MARKERS, lang_id, stopword_hits, token_count

    s = F.coalesce(F.col(text_col), F.lit(""))
    best_hits = F.greatest(*[stopword_hits(s, lang) for lang in _LANG_MARKERS])
    n_words = token_count(s)
    return df.select(
        F.col(id_col),
        lang_id(s).alias("lang_pred"),
        F.when(
            n_words > 0, best_hits.cast("double") / n_words.cast("double")
        ).otherwise(F.lit(0.0)).alias("lang_hit_frac"),
    )


def language_checks(
    allowed=("en",),
    min_hit_frac: float = 0.0,
):
    """Language-routing rules as cascade ``Check``s over
    :func:`language_signals` columns: a doc fails unless its detected
    language is in ``allowed`` ('und' fails unless explicitly allowed
    — no evidence is not a pass), and fails when the evidence density
    is below ``min_hit_frac`` (0.0 = rule off; the C4 recipe keeps
    pages only above a confidence floor)."""
    from .cascade import Check

    return [
        Check(
            name="lang_allowed",
            fails=~F.col("lang_pred").isin(*allowed),
            reason=F.format_string(
                f"lang_pred=%s not in {','.join(allowed)}", F.col("lang_pred")
            ),
        ),
        Check(
            name="lang_evidence",
            fails=F.col("lang_hit_frac") < F.lit(min_hit_frac),
            reason=F.format_string(
                f"lang_hit_frac=%.4f < {min_hit_frac}", F.col("lang_hit_frac")
            ),
        ),
    ]


def language_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """``df`` + language-signal columns + cascade verdict columns —
    same contract as the other family gates so it composes into
    :func:`quality_gate`."""
    from .cascade import apply_cascade

    sig = language_signals(df, text_col=text_col, id_col=id_col).select(
        id_col, "lang_pred", "lang_hit_frac"
    )
    joined = df.join(sig, id_col, "left")
    return apply_cascade(joined, language_checks(**thresholds))


def compression_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — ``comp_ratio`` =
    compressed bytes / raw UTF-8 bytes (plus ``n_bytes``). The
    compression-ratio filter from public web-corpus pipelines
    (RefinedWeb / CulturaX lineage): natural language sits around
    0.3–0.6, BELOW that is machine-generated repetition the line/bigram
    rules can miss (non-line-aligned templating, long period-k loops),
    ABOVE ~1.0 is incompressible noise (random strings, base64 blobs,
    minified/encrypted payloads). NULL and empty text yield a NULL
    ratio (no evidence — the cascade's NULL-passes contract applies).

    Execution shape: this is the engine's one intentionally
    Python-bound quality family — zlib has no Catalyst expression. It
    is still the fast path of that boundary: ONE Arrow-batched pandas
    UDF whose per-row work is a C call (zlib), no shuffles, and only
    (id, text) crosses into the Python worker. That is why the family
    is opt-in rather than in :func:`quality_gate`'s default tuple,
    mirroring ``language``.

    Reference analogue: the reference has no corpus-noise gate at all
    (it trusts curated channels, processor.py:90-95); this family is
    the web-scale replacement for that trust.
    """
    import pandas as pd  # noqa: F401  (pandas_udf signature)

    @F.pandas_udf("double")
    def _ratio(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return None
            return len(zlib.compress(b, level)) / len(b)

        return texts.map(one)

    s = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.octet_length(F.coalesce(s, F.lit(""))).alias("n_bytes"),
        _ratio(s).alias("comp_ratio"),
    )


def compression_checks(
    min_comp_ratio: float = 0.10,
    max_comp_ratio: float = 1.05,
    min_bytes_for_ratio: int = 256,
):
    """Compression rules as cascade ``Check``s over
    :func:`compression_signals` columns. Both rules apply only at
    ``n_bytes >= min_bytes_for_ratio``: zlib's ~11-byte header and
    cold dictionary make ratios on short docs pure noise (a 20-byte
    doc "compresses" to 1.4× regardless of content), and short-doc
    quality already belongs to the length/word-count rules."""
    from .cascade import Check

    sized = F.col("n_bytes") >= F.lit(min_bytes_for_ratio)
    return [
        Check(
            name="too_compressible",
            fails=sized & (F.col("comp_ratio") < F.lit(min_comp_ratio)),
            reason=F.format_string(
                f"comp_ratio=%.4f < {min_comp_ratio}", F.col("comp_ratio")
            ),
        ),
        Check(
            name="incompressible",
            fails=sized & (F.col("comp_ratio") > F.lit(max_comp_ratio)),
            reason=F.format_string(
                f"comp_ratio=%.4f > {max_comp_ratio}", F.col("comp_ratio")
            ),
        ),
    ]


def compression_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """``df`` + compression-signal columns + cascade verdict columns —
    same contract as the other family gates so it composes into
    :func:`quality_gate`."""
    from .cascade import apply_cascade

    sig = compression_signals(df, text_col=text_col, id_col=id_col).select(
        id_col, "n_bytes", "comp_ratio"
    )
    joined = df.join(sig, id_col, "left")
    return apply_cascade(joined, compression_checks(**thresholds))


# ---------------------------------------------------------------------------
# composed gate over every family

# Family order is the cascade order: encoding first (a misdecoded doc's
# repetition/word stats are noise — triage should read the *root* cause
# in first_failed_check), then line-level repetition, then word-level
# Gopher rules. Signal-column lists drive both the join projection and
# the violation-row schema in cli.quality_pass.
QUALITY_FAMILIES: dict[str, dict] = {
    "encoding": {
        "signal_cols": (
            "n_replacement", "n_mojibake", "replacement_frac", "control_frac",
        ),
    },
    "repetition": {
        "signal_cols": (
            "dup_line_frac", "dup_line_char_frac", "top_bigram_frac",
        ),
    },
    "gopher_words": {
        "signal_cols": (
            "n_words", "chars_words", "n_alpha_words", "n_symbol_words",
            "n_stopword_kinds",
        ),
    },
    # opt-in (not in quality_gate's default tuple): the synthetic
    # fixtures aren't language-labeled, so routing by language is a
    # caller decision, not a default drop
    "language": {
        "signal_cols": ("lang_pred", "lang_hit_frac"),
    },
    # opt-in: the one family that crosses the Python-worker boundary
    # (zlib has no Catalyst expression) — callers buy the Arrow round
    # trip explicitly rather than the default gate paying it
    "compression": {
        "signal_cols": ("n_bytes", "comp_ratio"),
    },
}


def family_signal_cols(families) -> list[str]:
    """Signal columns a gate over ``families`` adds — the extra columns
    ``cli.quality_pass`` carries into violation rows."""
    out: list[str] = []
    for fam in families:
        out.extend(QUALITY_FAMILIES[fam]["signal_cols"])
    return out


def quality_gate(
    df: DataFrame,
    families=("encoding", "repetition", "gopher_words"),
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[str, dict] | None = None,
) -> DataFrame:
    """ALL requested quality families as ONE gate: each family's
    signals join onto ``df`` by ``id_col``, then a single
    ``apply_cascade`` over the concatenated check list — one verdict /
    first-fail / reason contract across encoding, repetition, and
    word-level rules, exactly what a training-data filter consumes.

    ``thresholds`` is keyed per family, e.g. ``{"repetition":
    {"max_dup_line_frac": 0.25}}`` — unknown family keys raise.

    Execution shape: the encoding branch is a pure projection (fuses
    into the join stage); repetition and gopher_words are each the
    two-level explode/aggregate documented on their signal functions.
    All three branches re-join on ``id_col`` — at 100 TB that is one
    shuffle per aggregate branch on the uniform doc-id key (AQE
    coalesces the post-agg sides), identical cost to running the
    family gates separately, but ONE pass over the verdict logic and
    one violations write instead of three.
    """
    thresholds = dict(thresholds or {})
    unknown = set(thresholds) - set(QUALITY_FAMILIES)
    if unknown:
        raise ValueError(f"unknown quality families in thresholds: {sorted(unknown)}")
    # thresholds for a family that is not running would be silently
    # ignored — a misconfigured gate (e.g. legacy flat repetition
    # overrides with families=('gopher_words',)) must fail loudly, not
    # build a corpus under default thresholds
    inactive = set(thresholds) - set(families)
    if inactive:
        raise ValueError(
            f"thresholds given for families not in this run: "
            f"{sorted(inactive)} (families={tuple(families)})"
        )
    from .cascade import apply_cascade

    signal_fns = {
        "encoding": (encoding_signals, encoding_checks),
        "repetition": (repetition_fractions, repetition_checks),
        "gopher_words": (gopher_word_signals, gopher_word_checks),
        "language": (language_signals, language_checks),
        "compression": (compression_signals, compression_checks),
    }
    joined = df
    checks = []
    for fam in families:
        if fam not in QUALITY_FAMILIES:
            raise ValueError(f"unknown quality family: {fam!r}")
        sig_fn, chk_fn = signal_fns[fam]
        sig = sig_fn(df, text_col=text_col, id_col=id_col).select(
            id_col, *QUALITY_FAMILIES[fam]["signal_cols"]
        )
        joined = joined.join(sig, id_col, "left")
        checks.extend(chk_fn(**thresholds.get(fam, {})))
    return apply_cascade(joined, checks)


# ---------------------------------------------------------------------------
# Token-level degeneracy — the post-tokenization repetition gate.
#
# The text families above can't see the north-rule payload (input_hint:
# tokens array<int>); a validation engine over PRE-tokenized sequences
# needs the same "repetitious content" rule expressed on token ids. A
# degenerate sequence (one id repeated for thousands of steps, or a
# 2-token loop) is the classic training-data failure the Gopher
# repetition rules catch pre-tokenization (Rae et al. 2021) — these two
# signals are its exact token-domain counterpart, and both are pure
# per-row codegen HOFs: zero shuffles, no UDFs, fuse into whatever scan
# the cascade already runs.
# ---------------------------------------------------------------------------


def distinct_frac_expr(tokens: Column) -> Column:
    """|distinct ids| / |ids| as a per-row expression.

    NULL array → NULL; empty array → NULL (no division by zero; the
    null/empty payload checks own those rows). NULL elements count as
    one distinct value (``array_distinct`` keeps a single NULL)."""
    n = F.size(tokens)
    return F.when(
        n > 0, F.size(F.array_distinct(tokens)).cast("double") / n.cast("double")
    )


def max_token_run_expr(tokens: Column) -> Column:
    """Longest run of one repeated token id, as a per-row fold.

    ``F.aggregate`` state = (prev id, current run, best run); NULL
    elements compare null-safely (a run of NULLs counts — it is exactly
    as degenerate as a run of a real id). NULL array → NULL; empty
    array → 0."""
    init = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, t: Column) -> Column:
        new_run = (
            F.when(t.cast("long").eqNullSafe(acc["prev"]) & (acc["run"] > 0), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            t.cast("long").alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    return F.aggregate(tokens, init, step, lambda acc: acc["best"])


def token_degeneracy_signals(
    df: DataFrame, tokens_col: str = "tokens"
) -> DataFrame:
    """``df`` + ``distinct_frac`` + ``max_token_run`` columns."""
    t = F.col(tokens_col)
    return df.withColumn("distinct_frac", distinct_frac_expr(t)).withColumn(
        "max_token_run", max_token_run_expr(t)
    )


def token_degeneracy_checks(
    min_distinct_frac: float | None = None,
    max_token_run: int | None = None,
):
    """The degeneracy rules as cascade ``Check``s over the signal
    columns of :func:`token_degeneracy_signals`. NULL signals (NULL
    payload rows) never fail here — the payload checks own them."""
    from .cascade import Check

    checks = []
    if min_distinct_frac is not None:
        c = F.col("distinct_frac")
        checks.append(
            Check(
                name="low_distinct_frac",
                fails=c < F.lit(float(min_distinct_frac)),
                reason=F.format_string(
                    f"distinct_frac=%.4f < {float(min_distinct_frac)}", c
                ),
            )
        )
    if max_token_run is not None:
        r = F.col("max_token_run")
        checks.append(
            Check(
                name="long_token_run",
                fails=r > F.lit(int(max_token_run)),
                reason=F.concat(
                    F.lit("max_token_run="),
                    r.cast("string"),
                    F.lit(f" > {int(max_token_run)}"),
                ),
            )
        )
    return checks
