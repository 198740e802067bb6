"""Text-analysis functions for training-data pipelines — all codegen.

Implements the reference's scalar surface (SURVEY.md §2.6: regex
search/replace C1-C2, length C3, guarded division C4) plus the
pipeline staples: language-ID heuristic, quality scoring, token
counting, rolling-hash fingerprinting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

# ONE portable whitespace definition for the whole engine. Java's \s
# (Spark's codegen regex) matches \x0B where RE2's (DuckDB, Go, many
# engines) does not — a bare `\s` silently forks engines on
# vertical-tab input (caught by the --unicode fuzz gate). Every
# whitespace regex in the engine spells the class out instead.
WS_CHARS = r" \t\n\x0B\f\r"
WS = f"[{WS_CHARS}]"

# Trailing-markdown-link strip — reference processor.py:106 semantics,
# with the whitespace class made explicit (the reference's Python \s
# additionally matches unicode spaces; the engine pins ASCII).
MARKDOWN_LINK_RE = rf"(?m){WS}*\[.*?\]\(https?://[^)]+\)$"

# Tiny per-language stopword lists for the n-gram language heuristic.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
}


def strip_trailing_link(col: Column) -> Column:
    """Reference F3 cleanup projection (processor.py:106)."""
    return F.regexp_replace(col, MARKDOWN_LINK_RE, "")


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for NULL/empty/whitespace-only).

    Counts NON-EMPTY split pieces rather than trimming first: F.trim
    strips only ASCII spaces, so 'hello\\n' would otherwise count a
    phantom trailing token and '\\t\\n' would count 2 instead of 0."""
    s = F.coalesce(col, F.lit(""))
    return F.size(F.filter(F.split(s, WS + "+"), lambda w: w != ""))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored token estimate: word pieces + punctuation as the
    regex `\\w+|[^\\w\\s]` would tokenize."""
    s = F.coalesce(col, F.lit(""))
    return F.size(F.regexp_extract_all(s, F.lit(rf"\w+|[^\w{WS_CHARS}]"), 0))


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of language-marker stopword occurrences (word-bounded)."""
    pat = r"\b(" + "|".join(_LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.coalesce(col, F.lit(""))), F.lit(pat), 0))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of marker-stopword hit counts,
    'und' when nothing matches. Deterministic tie-break by language
    order en > es > fr > de (greatest-first when chain)."""
    hits = {lang: stopword_hits(col, lang) for lang in _LANG_MARKERS}
    best = F.greatest(*hits.values())
    chain = F.when(best == 0, F.lit("und"))
    for lang in _LANG_MARKERS:  # insertion order = tie-break priority
        chain = chain.when(hits[lang] == best, F.lit(lang))
    return chain.otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score from cheap structural signals:
    length band, punctuation ratio, stopword ratio, mean word length.

    Mirrors the reference's gate stack (length processor.py:107, ER
    threshold 116-119, score thresholds 124-135) as one deterministic
    formula instead of an external LLM scorer (U3 is excluded from the
    engine core per SURVEY.md §2.7).
    """
    s = F.coalesce(col, F.lit(""))
    n_chars = F.length(s)
    n_words = token_count(s)
    n_punct = F.size(F.regexp_extract_all(s, F.lit(rf"[^\w{WS_CHARS}]"), 0))
    n_stop = stopword_hits(s, "en")
    len_component = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    # guarded divisions (reference C4: x/y if y else 0, processor.py:116)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    punct_component = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words.cast("double")).otherwise(F.lit(0.0))
    stop_component = F.least(stop_ratio * 4.0, F.lit(1.0))
    mean_wlen = F.when(n_words > 0, n_chars.cast("double") / n_words.cast("double")).otherwise(F.lit(0.0))
    wlen_component = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0)).otherwise(F.lit(0.3))
    return F.round(
        len_component * 0.4 + punct_component * 0.2 + stop_component * 0.2 + wlen_component * 0.2,
        6,
    )


def fingerprint(col: Column) -> Column:
    """Deterministic 64-bit document fingerprint (content hash of the
    whitespace-normalized lowercased text) — the cheap rolling-hash
    style identity used for shard-local dedup.

    Collapse-then-trim, in that order: trimming first (space-only
    F.trim) left a trailing '\\n' as a trailing ' ' after the
    collapse, so 'a b' and 'a b\\n' fingerprinted DIFFERENTLY — the
    single most common trivial variation in scraped text. After the
    collapse every whitespace run is a plain space, which trim does
    strip."""
    collapsed = F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), WS + "+", " ")
    return F.xxhash64(F.trim(collapsed))


def parse_score(col: Column) -> Column:
    """Reference C6: lenient scorer-reply parse —
    ``float(response.replace('"','').strip())``, None on ValueError
    (services/openai_service.py:56-59). ``try_cast`` gives the
    None-on-garbage semantics without ANSI exceptions."""
    return F.trim(F.regexp_replace(F.coalesce(col, F.lit("")), '"', "")).try_cast("float")


def stop_word_check(col: Column, stop_words: list[str]) -> Column:
    """First matching stop word or NULL (reference F5 semantics:
    contains_stop_words returns the matched word, processor.py:90-95).

    Words are matched as LITERALS via ``instr`` (plain substring
    search, no regex engine at all): the reference contract is
    substring containment, so a stop word holding regex
    metacharacters ('c++', '(paid)') must not throw
    PatternSyntaxException at task runtime or silently pattern-match
    ('a.c' matching 'abc'). The earlier ``\\Q...\\E`` quoting had one
    hole — a stop word containing the literal sequence ``\\E``
    terminated the quote early and the remainder ran as a regex
    (ADVICE r5); ``instr`` has no quoting to escape, and drops the
    regex engine from the per-row path as a bonus."""
    if not stop_words:
        return F.lit(None).cast("string")
    s = F.coalesce(col, F.lit(""))
    chain = F.when(F.instr(s, stop_words[0]) > 0, F.lit(stop_words[0]))
    for w in stop_words[1:]:
        chain = chain.when(F.instr(s, w) > 0, F.lit(w))
    return chain.otherwise(F.lit(None).cast("string"))


def format_ts(col: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Reference C7: ingest-boundary datetime formatting —
    ``msg.date.strftime("%Y-%m-%d %H:%M:%S")``
    (services/telegram_service.py:55). Pure codegen expression."""
    return F.date_format(col, fmt)


def hash_tokens(col: Column, vocab_size: int = 50257) -> Column:
    """Deterministic tokenizer stub: lowercase whitespace words →
    md5-of-word mod ``vocab_size`` as ``array<int>`` — the same
    derivation both engines share bit-for-bit (used by the graded
    ``token_jaccard`` query). Pure codegen (split + transform of a
    cheap hash), so tokenization rides the same scan as every other
    projection — no Python boundary.

    This is the swap point for a real BPE tokenizer in a deployment:
    replace with an Arrow ``pandas_udf`` holding the tokenizer as a
    per-executor singleton (the U1 embedding-stub pattern,
    functions/vectors.py) — the pipeline contract (``tokens
    array<int>`` + ``n_tok``) is unchanged.

    NULL / empty / whitespace-only text tokenizes to an EMPTY array,
    and NO position yields a phantom token: empty split pieces are
    filtered out rather than trim-guarded (F.trim strips only ASCII
    spaces, so 'hello\\n' would otherwise tokenize a trailing '' into
    a bogus md5('')-derived id that inflates n_tok, charges sampling
    budgets, and pollutes the k-gram/LM pipelines)."""
    words = F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), WS + "+"),
        lambda w: w != "",
    )
    return F.transform(
        words,
        lambda w: (
            F.conv(F.substring(F.md5(w), 1, 6), 16, 10).cast("long")
            % F.lit(vocab_size)
        ).cast("int"),
    )


# PII scrubbing — conservative, auditable regexes. Codegen-side
# regexp_replace, so redaction rides the same scan as the rest of the
# cleanup projection (reference F3 idiom, processor.py:106, applied to
# privacy). Patterns favor precision on unambiguous shapes (emails,
# IPv4, long digit runs) — entity-level NER-grade PII is a model call,
# which sits OUTSIDE the engine core like U3/U4 scoring (SURVEY §2.7).
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — the one high-precision PII shape
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted quad, each octet 1-3 digits, not embedded in longer digits
    "ip": r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])",
    # phone: optional +CC and (area), then 3-4+3-4(+2-4) digit groups
    # with a REQUIRED separator between core groups — the separator
    # requirement is what keeps version strings ("1.2.3.4.5") and long
    # numeric literals (π digits, IDs) unredacted; a contiguous
    # 7-digit run is deliberately not matched (precision over recall —
    # an engine-level scrubber must not eat ordinary numbers)
    "phone": (
        r"(?<![0-9A-Za-z])(?:\+?[0-9]{1,3}[ .-]?)?(?:\([0-9]{2,4}\)[ .-]?)?"
        r"[0-9]{3,4}[ .-][0-9]{3,4}(?:[ .-][0-9]{2,4})?(?![0-9A-Za-z])"
    ),
}


def redact_pii(
    col: Column, kinds: tuple[str, ...] = ("email", "ip", "phone")
) -> Column:
    """Replace each matched PII kind with its ``<KIND>`` placeholder —
    order matters (emails first, so their digits never half-match the
    phone pattern). NULL stays NULL (regexp_replace passes it)."""
    out = col
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


# Invisible characters a tokenizer should never see: zero-width
# space/non-joiner/joiner, BOM-as-ZWNBSP, soft hyphen. Kept as a
# codegen regexp class — no UDF needed for the strip.
_ZERO_WIDTH_CLASS = "[\u200b\u200c\u200d\ufeff\u00ad]"


def normalize_text(
    col: Column,
    form: str | None = "NFC",
    strip_zero_width: bool = True,
    collapse_spaces: bool = False,
) -> Column:
    """Unicode text normalization as a REPAIR step (clean stage).

    Scraped corpora mix composed and decomposed forms of the same
    grapheme ("é" as U+00E9 vs e+U+0301) — exact dedup, shingling, and
    stop-word matching all silently fork on the byte difference.
    ``form`` applies ``unicodedata.normalize`` (NFC default; NFKC folds
    compatibility characters — ligatures, full-width forms — which is
    lossier but what most tokenizer pipelines want); ``None`` skips it
    and the whole expression stays codegen. Zero-width characters and
    soft hyphens are stripped by a regexp class; ``collapse_spaces``
    additionally folds horizontal whitespace runs to one space and
    trims line edges (line STRUCTURE is preserved — C4 line rules and
    line dedup key on it). NULL stays NULL.

    Execution shape: the strips are regexp_replace (whole-stage
    codegen); the normalize itself is one Arrow-batched pandas UDF
    whose per-row work is CPython's C-level unicodedata — the same
    deliberate C-call boundary as the compression family
    (operators/quality.py), zero shuffles either way.
    """
    out = col
    # form FIRST: NFKC maps NBSP / U+2000-200A / U+3000 to plain
    # spaces — strips and collapse must see those, or whitespace-
    # variant twins survive the very repair meant to unify them
    if form is not None:
        if form not in ("NFC", "NFD", "NFKC", "NFKD"):
            raise ValueError(f"unknown unicode normalization form {form!r}")
        out = _unicode_normalize_udf(form)(out)
    if strip_zero_width:
        out = F.regexp_replace(out, _ZERO_WIDTH_CLASS, "")
    if collapse_spaces:
        # horizontal whitespace = module WS class minus \n, spelled
        # out (bare \s/\S forks regex engines on \x0B — module policy)
        hws = "[" + WS_CHARS.replace(r"\n", "") + "]"
        out = F.regexp_replace(out, hws + "+", " ")
        out = F.regexp_replace(out, r" ?\n ?", "\n")
        # F.trim strips ONLY ' ' — spell the class out (module policy)
        out = F.regexp_replace(out, rf"^{WS}+|{WS}+$", "")
    return out


def _unicode_normalize_udf(form: str):
    @F.pandas_udf("string")
    def fn(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return fn


def pii_counts(col: Column, kinds: tuple[str, ...] = ("email", "ip", "phone")) -> list[Column]:
    """Per-kind match counts for the privacy audit report — one
    ``regexp_count`` per kind over the same scan.

    Each kind counts on the string with all EARLIER kinds already
    redacted — the same progressive view :func:`redact_pii` replaces
    on — so the counts reconcile exactly with the substitutions made
    (an email's digits must not double-report as a phantom phone)."""
    s = F.coalesce(col, F.lit(""))
    out = []
    for k in kinds:
        out.append(F.regexp_count(s, F.lit(PII_PATTERNS[k])).alias(f"n_{k}"))
        s = F.regexp_replace(s, PII_PATTERNS[k], f"<{k.upper()}>")
    return out
