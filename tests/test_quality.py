"""operators/quality.py — Gopher-style repetition signals.

Planted-fixture tests: every count is hand-computable. The oracle
parity of the same signals over the synthetic corpus is covered by
the graded ``token_stats`` query (scripts/check_oracles.py).
"""

from __future__ import annotations

from pyspark.sql import Row

from teleharvest_spark.operators import quality


def _rows(spark, docs):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(docs)])
    out = quality.repetition_signals(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_duplicate_lines_and_chars(spark):
    # 4 lines: "aa" x2 (dup, 2 chars each), "b", "cc" — no trailing \n
    r = _rows(spark, ["aa\nb\naa\ncc"])[0]
    assert r["n_lines"] == 4
    assert r["n_dup_lines"] == 1          # one occurrence beyond first
    assert r["chars_lines"] == 2 + 1 + 2 + 2
    assert r["chars_dup"] == 4            # both "aa" occurrences
    assert r["n_bullet"] == 0 and r["n_ellipsis"] == 0


def test_bullets_ellipsis_and_trailing_newline(spark):
    # trailing \n yields a final empty line (split keeps trailing empties)
    r = _rows(spark, ["- item one\n* item two\n• item three\nwait...\n"])[0]
    assert r["n_lines"] == 5
    assert r["n_bullet"] == 3
    assert r["n_ellipsis"] == 1
    # the lone empty trailing line is unique -> no dup counted
    assert r["n_dup_lines"] == 0


def test_top_bigram_counts(spark):
    # words: the cat the cat the -> bigrams: "the cat" x2, "cat the" x2
    r = _rows(spark, ["the cat the cat the"])[0]
    assert r["n_bigrams"] == 4
    assert r["top_bigram_cnt"] == 2


def test_degenerate_docs(spark):
    rows = _rows(spark, [None, "", "   ", "one"])
    for i in range(4):
        r = rows[i]
        assert r["n_bigrams"] == 0 and r["top_bigram_cnt"] == 0
    # NULL/empty text is one empty line; "   " is one 3-char line
    assert rows[0]["n_lines"] == 1 and rows[0]["chars_lines"] == 0
    assert rows[1]["n_lines"] == 1
    assert rows[2]["chars_lines"] == 3
    assert rows[3]["n_lines"] == 1 and rows[3]["chars_lines"] == 3


def test_fractions_thresholds(spark):
    df = spark.range(1).selectExpr(
        "cast(id as long) as doc_id",
        r"'x\nx\nx\ny' as text",
    ).selectExpr("doc_id", "replace(text, '\\\\n', chr(10)) as text")
    out = quality.repetition_fractions(df).collect()[0]
    assert out["n_lines"] == 4 and out["n_dup_lines"] == 2
    assert abs(out["dup_line_frac"] - 0.5) < 1e-12
    assert abs(out["dup_line_char_frac"] - 0.75) < 1e-12
    assert out["bullet_line_frac"] == 0.0


def test_repetition_gate_verdicts(spark):
    from teleharvest_spark.operators.cascade import FIRST_FAIL_COL, VERDICT_COL

    df = spark.createDataFrame(
        [
            # 15 distinct words: unique bigrams -> top_bigram_frac
            # 2/15 < 0.20 (short docs legitimately sit above the Gopher
            # bigram threshold; a real pipeline orders min-length first)
            Row(doc_id=0, text="one two three four five\nsix seven eight nine ten\neleven twelve thirteen fourteen fifteen"),
            # 3 of 4 lines are dups -> dup_line_frac 0.5 > 0.30
            Row(doc_id=1, text="x\nx\nx\ny"),
            # overlapping top bigram -> frac clamped 1.0 > 0.20
            Row(doc_id=2, text="spam spam spam spam spam"),
            Row(doc_id=3, text=None),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in quality.repetition_gate(df).select(
            "doc_id", "text", VERDICT_COL, FIRST_FAIL_COL
        ).collect()
    }
    assert out[0][VERDICT_COL] is True and out[0][FIRST_FAIL_COL] is None
    assert out[1][VERDICT_COL] is False and out[1][FIRST_FAIL_COL] == "dup_line_frac"
    assert out[2][VERDICT_COL] is False and out[2][FIRST_FAIL_COL] == "top_bigram_frac"
    assert out[3][VERDICT_COL] is True          # NULL text: nothing to flag
    assert out[3]["text"] is None               # input columns pass through


def test_top_bigram_frac_clamped(spark):
    # overlapping occurrences would give 2*4/5 = 1.6 -> clamped to 1.0
    df = spark.createDataFrame([Row(doc_id=0, text="the the the the the")])
    out = quality.repetition_fractions(df).collect()[0]
    assert out["top_bigram_cnt"] == 4
    assert out["top_bigram_frac"] == 1.0


def test_gopher_word_signals_hand_computed(spark):
    from pyspark.sql import functions as F

    docs = [
        "The cat runs. The dog.",          # 5 words, stop kinds {the}
        "# x ... y …z",                    # 3 of 5 symbol words
        None,
        "",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in quality.gopher_word_signals(df).collect()
    }
    assert got[0]["n_words"] == 5
    assert got[0]["chars_words"] == len("thecatruns.thedog.")
    assert got[0]["n_alpha_words"] == 5
    assert got[0]["n_stopword_kinds"] == 1
    assert got[1]["n_symbol_words"] == 3 and got[1]["n_words"] == 5
    for i in (2, 3):
        assert got[i] == {
            "doc_id": i, "n_words": 0, "chars_words": 0,
            "n_alpha_words": 0, "n_symbol_words": 0, "n_stopword_kinds": 0,
        }


def test_gopher_word_gate_rules(spark):
    good = (
        "the quick brown fox jumps over that lazy dog with style and grace "
        * 5
    )  # 60 words, >=2 stop kinds, mean len ~4
    docs = [
        Row(doc_id=0, text=good),
        Row(doc_id=1, text="too short"),                        # word_count
        # 50 good words + 7 'abc...' -> symbol frac 7/57 > 0.1 while
        # word count / mean length / alpha / stopwords all pass
        Row(doc_id=2, text=good.rsplit(" ", 10)[0] + " abc... " * 7),
        Row(doc_id=3, text="the of " + "12345 " * 60),          # alpha frac
        Row(doc_id=4, text=" ".join(f"word{i}" for i in range(60))),  # stopwords
    ]
    out = {
        r["doc_id"]: (r["check_verdict"], r["first_failed_check"])
        for r in quality.gopher_word_gate(spark.createDataFrame(docs))
        .select("doc_id", "check_verdict", "first_failed_check")
        .collect()
    }
    assert out[0] == (True, None)
    assert out[1] == (False, "word_count")
    assert out[2] == (False, "symbol_word_frac")
    assert out[3] == (False, "alpha_word_frac")
    assert out[4] == (False, "stopword_kinds")


def test_c4_clean_lines_and_page_checks(spark):
    from pyspark.sql import functions as F
    from teleharvest_spark.operators.cascade import apply_cascade

    text = "\n".join([
        "This sentence ends properly.",     # keep
        "short.",                           # < 3 words -> drop
        "No terminal punctuation here",     # drop
        "Enable javascript to continue.",   # marker word -> drop
        "Another perfectly fine line!",     # keep
    ])
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    cleaned = df.select(
        "doc_id", quality.c4_clean_lines(F.col("text")).alias("clean_text")
    )
    got = cleaned.collect()[0]["clean_text"]
    assert got == "This sentence ends properly.\nAnother perfectly fine line!"

    pages = spark.createDataFrame([
        Row(doc_id=0, clean_text="One fine line.\nTwo lines.\nThree here."),
        Row(doc_id=1, clean_text="Lorem Ipsum dolor sit.\nx.\ny.\nz."),
        Row(doc_id=2, clean_text="code { brace }.\na.\nb.\nc."),
        Row(doc_id=3, clean_text="Only one line."),
        Row(doc_id=4, clean_text=""),
    ])
    out = {
        r["doc_id"]: (r["check_verdict"], r["first_failed_check"])
        for r in apply_cascade(pages, quality.c4_page_checks())
        .select("doc_id", "check_verdict", "first_failed_check")
        .collect()
    }
    assert out[0] == (True, None)
    assert out[1] == (False, "lorem_ipsum")
    assert out[2] == (False, "curly_brace")
    assert out[3] == (False, "too_few_lines")
    assert out[4] == (False, "too_few_lines")


def test_encoding_signals_hand_computed(spark):
    docs = [
        Row(doc_id=0, text="clean text, nothing wrong here."),
        Row(doc_id=1, text="bad � decode � twice"),
        Row(doc_id=2, text="ctrl\x00here\x07and\x1fmore"),
        # three mojibake markers: A-tilde+continuation x2, a-circ+U+0080
        Row(doc_id=3, text="cafÃ© naÃ¯ \u00e2\u0080x"),
        Row(doc_id=4, text=None),
        # tab / LF / CR are NOT control-flagged
        Row(doc_id=5, text="tabs\tand\nnewlines\rok"),
        # bare accented letters (no continuation-range follower): clean
        Row(doc_id=6, text="café naïve Ärger"),
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in quality.encoding_signals(spark.createDataFrame(docs)).collect()
    }
    assert got[0] == {
        "doc_id": 0, "n_chars": 31, "n_replacement": 0, "n_control": 0,
        "n_mojibake": 0, "replacement_frac": 0.0, "control_frac": 0.0,
    }
    assert got[1]["n_replacement"] == 2
    assert abs(got[1]["replacement_frac"] - 2 / 20) < 1e-12
    assert got[2]["n_control"] == 3
    assert abs(got[2]["control_frac"] - 3 / 18) < 1e-12
    assert got[3]["n_mojibake"] == 3 and got[3]["n_control"] == 0
    assert got[4] == {
        "doc_id": 4, "n_chars": 0, "n_replacement": 0, "n_control": 0,
        "n_mojibake": 0, "replacement_frac": 0.0, "control_frac": 0.0,
    }
    assert got[5]["n_control"] == 0
    assert got[6]["n_mojibake"] == 0


def test_encoding_gate_verdicts(spark):
    from teleharvest_spark.operators.cascade import FIRST_FAIL_COL, VERDICT_COL

    long_clean = "x" * 2000
    docs = [
        Row(doc_id=0, text="perfectly fine prose."),
        Row(doc_id=1, text="one bad � char"),      # any U+FFFD fails
        # 1 control char in 2001 chars: frac 1/2001 < 0.001 -> passes
        Row(doc_id=2, text=long_clean + "\x07"),
        # 3 control chars in 10 chars: frac 0.3 -> fails
        Row(doc_id=3, text="ab\x00cd\x01ef\x02gh"),
        # exactly max_mojibake=2 markers -> passes; 3 -> fails
        Row(doc_id=4, text="aÃ©bÃ©c"),
        Row(doc_id=5, text="aÃ©bÃ©cÃ©d"),
        Row(doc_id=6, text=None),
    ]
    out = {
        r["doc_id"]: (r[VERDICT_COL], r[FIRST_FAIL_COL], r["text"])
        for r in quality.encoding_gate(spark.createDataFrame(docs))
        .select("doc_id", VERDICT_COL, FIRST_FAIL_COL, "text")
        .collect()
    }
    assert out[0][:2] == (True, None)
    assert out[1][:2] == (False, "replacement_chars")
    assert out[2][:2] == (True, None)
    assert out[3][:2] == (False, "control_chars")
    assert out[4][:2] == (True, None)
    assert out[5][:2] == (False, "mojibake")
    assert out[6][:2] == (True, None) and out[6][2] is None  # passthrough


def test_quality_gate_composed_family_order(spark):
    import pytest
    from teleharvest_spark.operators.cascade import FIRST_FAIL_COL, VERDICT_COL

    good = (
        "the quick brown fox jumps over that lazy dog with style and grace "
        * 5
    )
    docs = [
        Row(doc_id=0, text=good),                         # passes all three
        # fails encoding AND repetition -> encoding family wins (order)
        Row(doc_id=1, text="� spam spam\n" * 40),
        # fails repetition AND gopher word_count -> repetition wins
        Row(doc_id=2, text="x\nx\nx\ny"),
        # passes encoding+repetition (15 distinct words: top_bigram
        # 2/15 < 0.2), fails only gopher word_count (15 < 50)
        Row(doc_id=3, text="one two three four five six seven eight "
                           "nine ten eleven twelve thirteen fourteen fifteen"),
    ]
    df = spark.createDataFrame(docs)
    out = {
        r["doc_id"]: (r[VERDICT_COL], r[FIRST_FAIL_COL])
        for r in quality.quality_gate(df)
        .select("doc_id", VERDICT_COL, FIRST_FAIL_COL)
        .collect()
    }
    assert out[0] == (True, None)
    assert out[1] == (False, "replacement_chars")
    assert out[2] == (False, "dup_line_frac")
    assert out[3] == (False, "word_count")

    # signal columns from every family ride along
    cols = set(quality.quality_gate(df).columns)
    assert set(quality.family_signal_cols(
        ("encoding", "repetition", "gopher_words")
    )) <= cols

    # per-family threshold override: unique-bigram doc fails only when
    # the repetition threshold is tightened
    uniq = spark.createDataFrame([Row(
        doc_id=0,
        text="one two three four five six seven eight nine ten "
             "eleven twelve thirteen fourteen fifteen",
    )])
    loose = quality.quality_gate(uniq, families=("repetition",)).collect()[0]
    assert loose[VERDICT_COL] is True
    tight = quality.quality_gate(
        uniq, families=("repetition",),
        thresholds={"repetition": {"max_top_bigram_frac": 0.05}},
    ).collect()[0]
    assert tight[VERDICT_COL] is False
    assert tight[FIRST_FAIL_COL] == "top_bigram_frac"

    with pytest.raises(ValueError, match="unknown quality family"):
        quality.quality_gate(uniq, families=("nope",)).collect()
    with pytest.raises(ValueError, match="unknown quality families"):
        quality.quality_gate(uniq, thresholds={"nope": {}})
    # thresholds for a family NOT in this run would be silently
    # ignored — must fail loudly instead
    with pytest.raises(ValueError, match="not in this run"):
        quality.quality_gate(
            uniq, families=("repetition",),
            thresholds={"gopher_words": {"min_word_count": 10}},
        )


def test_language_family_detection_and_gate(spark):
    """Language family: marker-argmax detection, 'und' fails by
    default, allowed-set widening, evidence floor, and composition
    into the quality_gate cascade (opt-in — not in the default
    families tuple)."""
    import pytest
    from teleharvest_spark.operators.cascade import FIRST_FAIL_COL, VERDICT_COL

    docs = [
        Row(doc_id=0, text="the cat and the dog of that house is here "
                           "and the mouse is there to stay"),
        Row(doc_id=1, text="el perro de la casa que vive con los gatos "
                           "es una maravilla de verdad"),
        Row(doc_id=2, text="der hund und die katze das ist ein haus "
                           "und der garten ist hier"),
        Row(doc_id=3, text="zzz qqq www rrr ttt yyy"),   # no markers -> und
        Row(doc_id=4, text=None),                        # NULL -> und
    ]
    df = spark.createDataFrame(docs)

    sig = {
        r["doc_id"]: (r["lang_pred"], r["lang_hit_frac"])
        for r in quality.language_signals(df).collect()
    }
    assert sig[0][0] == "en" and sig[0][1] > 0.2
    assert sig[1][0] == "es"
    assert sig[2][0] == "de"
    assert sig[3] == ("und", 0.0)
    assert sig[4] == ("und", 0.0)

    # default gate: English only; 'und' is a fail, not a pass
    out = {
        r["doc_id"]: (r[VERDICT_COL], r[FIRST_FAIL_COL])
        for r in quality.language_gate(df).collect()
    }
    assert out[0] == (True, None)
    assert out[1] == (False, "lang_allowed")
    assert out[2] == (False, "lang_allowed")
    assert out[3] == (False, "lang_allowed")
    assert out[4] == (False, "lang_allowed")

    # widened allowed set admits es/de; evidence floor cuts thin docs
    out2 = {
        r["doc_id"]: r[VERDICT_COL]
        for r in quality.language_gate(
            df, allowed=("en", "es", "de"), min_hit_frac=0.15
        ).collect()
    }
    assert out2[0] and out2[1] and out2[2]
    assert not out2[3] and not out2[4]

    # composes into quality_gate as an opt-in family; default tuple
    # unchanged (no lang column without opting in)
    assert "lang_pred" not in quality.quality_gate(df).columns
    comp = quality.quality_gate(
        df,
        families=("encoding", "language"),
        thresholds={"language": {"allowed": ["en", "es"]}},
    )
    got = {r["doc_id"]: (r[VERDICT_COL], r[FIRST_FAIL_COL])
           for r in comp.collect()}
    assert got[0] == (True, None)
    assert got[1] == (True, None)
    assert got[2] == (False, "lang_allowed")
    assert set(quality.family_signal_cols(("language",))) <= set(comp.columns)


def test_compression_signals_match_local_zlib(spark):
    """comp_ratio is bit-exactly len(zlib.compress(utf8, 6))/len(utf8)
    — the Arrow batch path computes the same number the plain library
    call does; NULL and empty text yield NULL (no evidence)."""
    import zlib

    texts = {
        0: "ordinary prose with some variety in it, like real text has.",
        1: "spam spam spam " * 200,
        2: "",
        3: None,
        4: "unicode café — bytes != chars ü" * 20,
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in texts.items()]
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["comp_ratio"])
        for r in quality.compression_signals(df).collect()
    }
    for k, t in texts.items():
        if not t:
            assert got[k][1] is None
            assert got[k][0] == 0
            continue
        b = t.encode("utf-8")
        assert got[k][0] == len(b)
        assert abs(got[k][1] - len(zlib.compress(b, 6)) / len(b)) < 1e-12
    assert got[1][1] < 0.05          # heavy repetition compresses away
    assert 0.3 < got[0][1] <= 1.05   # prose sits in the natural band


def test_compression_gate_verdicts(spark):
    """Default thresholds: templated repetition fails too_compressible,
    incompressible noise fails incompressible, prose and short/NULL
    docs pass (short docs are exempt below min_bytes_for_ratio)."""
    import hashlib
    from teleharvest_spark.operators.cascade import FIRST_FAIL_COL, VERDICT_COL

    # deterministic incompressible bytes: chained sha256 hex
    h, noise = b"seed", []
    for _ in range(40):
        h = hashlib.sha256(h).digest()
        noise.append(h.hex())
    prose = (
        "It was a bright cold day in April and the clocks were striking "
        "thirteen while a man slipped quickly through the glass doors, "
        "though not quickly enough to prevent a swirl of gritty dust from "
        "entering along with him. Outside, even through the shut window "
        "pane, the world looked cold; down in the street little eddies of "
        "wind were whirling dust and torn paper into spirals, and though "
        "the sun was shining the light seemed harsh and flat."
    )  # 434 bytes, ratio 0.60 — the natural-language band
    docs = [
        Row(doc_id=0, text=prose),
        Row(doc_id=1, text="buy now " * 500),            # too compressible
        Row(doc_id=2, text="".join(noise)),              # hex noise ~0.55, passes
        Row(doc_id=3, text="hi"),                        # short: exempt
        Row(doc_id=4, text=None),                        # NULL: passes
    ]
    df = spark.createDataFrame(docs)
    out = {
        r["doc_id"]: (r[VERDICT_COL], r[FIRST_FAIL_COL])
        for r in quality.compression_gate(df).collect()
    }
    assert out[0] == (True, None)
    assert out[1] == (False, "too_compressible")
    assert out[2] == (True, None)
    assert out[3] == (True, None)
    assert out[4] == (True, None)

    # tightened ceiling turns the hex noise into a failure
    out2 = {
        r["doc_id"]: (r[VERDICT_COL], r[FIRST_FAIL_COL])
        for r in quality.compression_gate(df, max_comp_ratio=0.50).collect()
    }
    assert out2[2] == (False, "incompressible")

    # composes into quality_gate as an opt-in family
    assert "comp_ratio" not in quality.quality_gate(df).columns
    comp = quality.quality_gate(
        df,
        families=("encoding", "compression"),
        thresholds={"compression": {"min_comp_ratio": 0.005}},
    )
    got = {r["doc_id"]: r[VERDICT_COL] for r in comp.collect()}
    assert got[1] is True  # loosened floor admits the template doc
    assert set(quality.family_signal_cols(("compression",))) <= set(comp.columns)
