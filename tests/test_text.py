from __future__ import annotations

import pyspark.sql.functions as F

from teleharvest_spark.functions import text as TXT


def _one(spark, s, col):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_strip_trailing_link_matches_reference(spark):
    """Exact semantics of processor.py:106 — trailing markdown link
    (and only trailing) removed, multiline anchored."""
    assert _one(spark, "hello [x](https://a.b)", TXT.strip_trailing_link(F.col("text"))) == "hello"
    assert (
        _one(spark, "keep [x](https://a.b) middle", TXT.strip_trailing_link(F.col("text")))
        == "keep [x](https://a.b) middle"
    )
    assert _one(spark, "no link at all", TXT.strip_trailing_link(F.col("text"))) == "no link at all"


def test_token_count(spark):
    assert _one(spark, "a b  c", TXT.token_count(F.col("text"))) == 3
    assert _one(spark, "", TXT.token_count(F.col("text"))) == 0
    assert _one(spark, None, TXT.token_count(F.col("text"))) == 0
    assert _one(spark, "  x  ", TXT.token_count(F.col("text"))) == 1


def test_bpe_ish_token_count(spark):
    assert _one(spark, "don't stop!", TXT.bpe_ish_token_count(F.col("text"))) == 5
    # don / ' / t / stop / !


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog of the house", TXT.lang_id(F.col("text"))) == "en"
    assert _one(spark, "el gato de la casa que una", TXT.lang_id(F.col("text"))) == "es"
    assert _one(spark, "der hund und die katze ist ein", TXT.lang_id(F.col("text"))) == "de"
    assert _one(spark, "zzz qqq www", TXT.lang_id(F.col("text"))) == "und"


def test_stop_word_first_match(spark):
    """Reference F5: the FIRST configured word that matches is the
    reason (processor.py:90-95)."""
    col = TXT.stop_word_check(F.col("text"), ["alpha", "beta"])
    assert _one(spark, "has beta and alpha", col) == "alpha"  # list order, not text order
    assert _one(spark, "has beta only", col) == "beta"
    assert _one(spark, "clean", col) is None


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [("the cat and the dog walked to the park and that was nice " * 10,), ("!!!???",), (None,)],
        "text string",
    )
    vals = [r["q"] for r in df.select(TXT.quality_score(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[1]  # prose beats punctuation soup


def test_fingerprint_normalizes_whitespace(spark):
    a = _one(spark, "Hello   World", TXT.fingerprint(F.col("text")))
    b = _one(spark, "  hello world ", TXT.fingerprint(F.col("text")))
    c = _one(spark, "hello worlds", TXT.fingerprint(F.col("text")))
    assert a == b
    assert a != c


def test_parse_score_lenient(spark):
    """C6: quote-strip + trim + float parse, None on garbage
    (openai_service.py:56-59; reference tests 57-74)."""
    col = TXT.parse_score(F.col("text"))
    assert _one(spark, '"85"', col) == 85.0
    assert _one(spark, "  90 ", col) == 90.0
    assert _one(spark, "not a number", col) is None
    assert _one(spark, None, col) is None


def test_redact_pii_and_counts(spark):
    """Privacy scrubbing: unambiguous shapes redact, ordinary numbers
    survive (precision-over-recall contract in PII_PATTERNS)."""
    from teleharvest_spark.functions.text import pii_counts, redact_pii

    rows = [
        ("mail bob.smith+x@corp.example.co now",),
        ("ip 10.0.255.7 end",),
        ("call +1 (415) 555-0100 or 415 555 0100",),
        ("version 1.2.3.4.5 and pi=3.14159265358979 stay",),
        ("id 5550100 is not a phone (no separator)",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = df.select(
        F.col("text"),
        redact_pii(F.col("text")).alias("r"),
        *pii_counts(F.col("text")),
    ).collect()
    by = {r["text"]: r for r in got}

    assert by["mail bob.smith+x@corp.example.co now"]["r"] == "mail <EMAIL> now"
    assert by["mail bob.smith+x@corp.example.co now"]["n_email"] == 1
    assert by["ip 10.0.255.7 end"]["r"] == "ip <IP> end"
    r3 = by["call +1 (415) 555-0100 or 415 555 0100"]
    assert r3["r"] == "call <PHONE> or <PHONE>" and r3["n_phone"] == 2
    # false-positive guards: versions, long literals, contiguous runs
    clean = by["version 1.2.3.4.5 and pi=3.14159265358979 stay"]
    assert clean["r"] == clean["text"]
    assert clean["n_phone"] == 0 and clean["n_ip"] == 0
    assert by["id 5550100 is not a phone (no separator)"]["n_phone"] == 0
    assert by[None]["r"] is None


def test_pii_counts_reconcile_with_sequential_redaction(spark):
    """Counts are taken on the progressively-redacted string, so an
    email's digits never double-report as a phantom phone."""
    from teleharvest_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame([("reach me: 415-555-0100@example.com",)], "text string")
    r = df.select(
        redact_pii(F.col("text")).alias("r"), *pii_counts(F.col("text"))
    ).collect()[0]
    assert r["r"] == "reach me: <EMAIL>"
    assert r["n_email"] == 1 and r["n_phone"] == 0 and r["n_ip"] == 0


def test_hash_tokens_empty_text(spark):
    """NULL / '' / whitespace-only text tokenizes to an EMPTY array —
    no phantom token inflating counts, budgets, or packs."""
    from teleharvest_spark.functions.text import hash_tokens

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "one two")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(hash_tokens(F.col("text"))).alias("n")
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 2}


def test_normalize_text_nfc_and_zero_width(spark):
    """Decomposed e+combining-acute folds to the composed form, zero-
    width chars and soft hyphens vanish, NULL stays NULL."""
    rows = [
        ("decomp", "café"),            # NFD é
        ("zw", "a​b‌c‍d﻿e­f"),
        ("plain", "hello"),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    out = {
        r["k"]: r["t"]
        for r in df.select("k", TXT.normalize_text(F.col("text")).alias("t")).collect()
    }
    assert out["decomp"] == "café"
    assert out["zw"] == "abcdef"
    assert out["plain"] == "hello"
    assert out["null"] is None

    # NFKC folds compatibility chars (ligature fi, full-width A)
    df2 = spark.createDataFrame([("x", "ﬁ Ａ")], "k string, text string")
    got = df2.select(TXT.normalize_text(F.col("text"), form="NFKC").alias("t")).collect()
    assert got[0]["t"] == "fi A"

    # form=None keeps the expression UDF-free and only strips
    got2 = (
        spark.createDataFrame([("x", "a​b")], "k string, text string")
        .select(TXT.normalize_text(F.col("text"), form=None).alias("t"))
        .collect()
    )
    assert got2[0]["t"] == "ab"

    # collapse_spaces folds runs but PRESERVES line structure
    got3 = (
        spark.createDataFrame([("x", "a   b\t c \n  d  e\n")], "k string, text string")
        .select(
            TXT.normalize_text(
                F.col("text"), form=None, collapse_spaces=True
            ).alias("t")
        )
        .collect()
    )
    assert got3[0]["t"] == "a b c\nd e"

    import pytest as _pt

    with _pt.raises(ValueError, match="normalization form"):
        TXT.normalize_text(F.col("text"), form="NFX")


def test_normalize_text_nfkc_spaces_are_collapsed(spark):
    """NFKC maps NBSP/U+3000 to plain spaces — the collapse must see
    them (form runs FIRST), or whitespace-variant twins survive."""
    df = spark.createDataFrame([("x", "a  b　")], "k string, text string")
    got = df.select(
        TXT.normalize_text(
            F.col("text"), form="NFKC", collapse_spaces=True
        ).alias("t")
    ).collect()
    assert got[0]["t"] == "a b"
