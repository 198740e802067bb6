"""Check-cascade semantics — mirrors the reference's edge-case tests
(tests/test_processor.py: short text 108-112, no text 147-151, no
channel 199-203, stop word 207-211, boundary strictness 155-168)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from teleharvest_spark.config import CheckSuite
from teleharvest_spark.operators import cascade

SUITE = CheckSuite(min_n_tok=4, max_n_tok=10, banned_tokens=(99,), allowed_sources=("a", "b"))

ROWS = [
    # doc_id, tokens, n_tok, source, expected_first_fail
    ("ok", [1, 2, 3, 4], 4, "a", None),                      # boundary: == min passes
    ("null_tok", None, None, "a", "null_payload"),
    ("empty_tok", [], 0, "a", "empty_payload"),
    ("null_src", [1, 2, 3, 4], 4, None, "null_key"),
    ("empty_src", [1, 2, 3, 4], 4, "", "null_key"),
    ("short", [1, 2, 3], 3, "a", "too_short"),               # min-1 fails (strict <)
    ("long", list(range(11)), 11, "a", "too_long"),
    ("badcount", [1, 2, 3, 4], 5, "a", "inconsistent_n_tok"),
    ("banned", [1, 99, 3, 4], 4, "a", "banned_token"),
    ("rogue", [1, 2, 3, 4], 4, "zz", "unknown_source"),
    # ordering: null payload wins over bad source (processor.py:98 first)
    ("order1", None, None, "zz", "null_payload"),
    # ordering: too_short reported before banned (F4 before F5)
    ("order2", [99, 1], 2, "a", "too_short"),
]


@pytest.fixture(scope="module")
def annotated(spark):
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in ROWS],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    return cascade.apply_cascade(df, cascade.sequence_checks(SUITE)).collect()


def test_first_fail_reasons(annotated):
    got = {r["doc_id"]: r[cascade.FIRST_FAIL_COL] for r in annotated}
    want = {r[0]: r[4] for r in ROWS}
    assert got == want


def test_verdict_is_conjunction(annotated):
    for r in annotated:
        assert r[cascade.VERDICT_COL] == (r[cascade.FIRST_FAIL_COL] is None)


def test_failed_checks_collects_all(annotated):
    by_id = {r["doc_id"]: r for r in annotated}
    # 'order2' fails too_short AND banned_token — both collected
    assert set(by_id["order2"][cascade.FAILED_ALL_COL]) == {"too_short", "banned_token"}
    assert by_id["ok"][cascade.FAILED_ALL_COL] == []


def test_violations_preserve_token_arrays(spark):
    """Per-row invariant vs reference: token-array equality on
    violation rows (BASELINE.json input_hint)."""
    df = spark.createDataFrame(
        [("banned", [1, 99, 3, 4], 4, "a")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    v = cascade.violations(df, cascade.sequence_checks(SUITE)).collect()
    assert len(v) == 1
    assert v[0]["tokens"] == [1, 99, 3, 4]
    assert v[0]["check_name"] == "banned_token"
    assert v[0]["reason"] == "banned token 99"


def test_boundary_strictness(spark):
    """n_tok == min passes, min-1 fails; == max passes, max+1 fails —
    matches the reference's strict `<=`-fails semantics
    (processor.py:125, tests 155-168 analogue)."""
    df = spark.createDataFrame(
        [
            ("eq_min", [1] * 4, 4, "a"),
            ("under", [1] * 3, 3, "a"),
            ("eq_max", [1] * 10, 10, "a"),
            ("over", [1] * 11, 11, "a"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {
        r["doc_id"]: r[cascade.FIRST_FAIL_COL]
        for r in cascade.apply_cascade(df, cascade.sequence_checks(SUITE)).collect()
    }
    assert got == {"eq_min": None, "under": "too_short", "eq_max": None, "over": "too_long"}


SCORED_ROWS = [
    # doc_id, score, score_alt, expected_first_fail (suite defaults 80/85)
    ("pass", 81, 86, None),
    ("eq_min_fails", 80, 86, "low_score"),        # strict <=: exactly 80 FAILS
    ("null_score_fails", None, 86, "low_score"),  # score is None → fail
    ("eq_alt_fails", 81, 85, "low_score_alt"),
    ("null_alt_fails", 81, None, "low_score_alt"),
    ("order", 10, 10, "low_score"),               # F7 reported before F8
]


def test_scored_checks_strict_le_and_null_fails(spark):
    """F7/F8 exact semantics (processor.py:124-135, settings.py:15-16;
    reference tests 155-185: exactly-80 fails, None fails)."""
    df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in SCORED_ROWS],
        "doc_id string, score int, score_alt int",
    )
    got = {
        r["doc_id"]: r[cascade.FIRST_FAIL_COL]
        for r in cascade.apply_cascade(df, cascade.scored_checks(CheckSuite())).collect()
    }
    assert got == {r[0]: r[3] for r in SCORED_ROWS}


def test_degraded_mode_rows_pass_with_null_scores(spark):
    """F9: scorer unavailable → score checks excluded; rows with NULL
    scores PASS (processor.py:121-122, tests/test_processor.py:410-475
    — easy to get wrong as verdict=fail, SURVEY.md §7)."""
    suite = CheckSuite(scorer_available=False)
    assert cascade.scored_checks(suite) == []
    df = spark.createDataFrame(
        [("d1", None, None)], "doc_id string, score int, score_alt int"
    )
    rows = cascade.apply_cascade(df, cascade.scored_checks(suite)).collect()
    assert rows[0][cascade.VERDICT_COL] is True
    assert rows[0][cascade.FIRST_FAIL_COL] is None


def test_degraded_mode_suite_hash_changes():
    """F9: scorer availability is suite config; hash must change so the
    manifest re-validates (processor.py:121-122 analogue)."""
    on = CheckSuite(scorer_available=True)
    off = CheckSuite(scorer_available=False)
    assert on.suite_hash() != off.suite_hash()


def test_suite_hash_stable_under_field_addition():
    """suite_hash covers only NON-default fields, so adding a new
    (default-disabled) check field in a later release cannot change
    the hash of existing suites — which would anti-join-miss every
    stored manifest row and re-validate the whole warehouse on
    upgrade. Simulated by the equivalent observable: explicitly
    passing a default value hashes identically to omitting the field,
    while any non-default value re-hashes."""
    base = CheckSuite()
    assert CheckSuite(vocab_size=None, forbid_null_token=False).suite_hash() == \
        base.suite_hash()
    assert CheckSuite(min_n_tok=16).suite_hash() == base.suite_hash()
    assert CheckSuite(vocab_size=50_000).suite_hash() != base.suite_hash()
    assert CheckSuite(forbid_null_token=True).suite_hash() != base.suite_hash()
    assert CheckSuite(min_n_tok=17).suite_hash() != base.suite_hash()


def test_per_source_bound_overrides(spark):
    """FIXTURES.md T2: the allowed-source dimension carries per-source
    min/max_n_tok; rows compare against their source's bound, falling
    back to the suite global for sources absent from the dimension."""
    suite = CheckSuite(min_n_tok=4, max_n_tok=100)
    dim = spark.createDataFrame(
        [("a", 10, 100), ("b", 4, 20)],
        "source string, min_n_tok int, max_n_tok int",
    )
    df = spark.createDataFrame(
        [
            ("a_under", [1] * 5, 5, "a"),     # 5 < a's min 10 → fail
            ("b_ok", [1] * 5, 5, "b"),        # 5 ≥ b's min 4 → pass
            ("b_over", [1] * 21, 21, "b"),    # 21 > b's max 20 → fail
            ("zz_global", [1] * 5, 5, "zz"),  # no dim row → global min 4 → pass
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    joined = cascade.with_source_bounds(df, dim)
    got = {
        r["doc_id"]: (r[cascade.FIRST_FAIL_COL], r[cascade.REASON_COL])
        for r in cascade.apply_cascade(
            joined, cascade.sequence_checks(suite, per_source_bounds=True)
        ).collect()
    }
    assert got["a_under"] == ("too_short", "n_tok=5 < 10")
    assert got["b_ok"][0] is None
    assert got["b_over"] == ("too_long", "n_tok=21 > 20")
    assert got["zz_global"][0] is None


def test_run_suite_with_source_dim(spark, suite):
    """End-to-end: run_suite(source_dim=...) applies the per-source
    bounds and the violations table drops the helper columns."""
    from teleharvest_spark.plans import suite as suite_plan

    dim = spark.createDataFrame(
        [("a", 10, 100)], "source string, min_n_tok int, max_n_tok int"
    )
    df = spark.createDataFrame(
        [("d1", [1] * 5, 5, "a"), ("d2", [1] * 50, 50, "a")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    loose = CheckSuite(min_n_tok=1, max_n_tok=1000, allowed_sources=("a",))
    res = suite_plan.run_suite(df, loose, source_dim=dim)
    viol = res.violations.collect()
    res.cleanup()
    assert [ (v["doc_id"], v["check_name"]) for v in viol ] == [("d1", "too_short")]
    assert set(res.violations.columns) == {"doc_id", "source", "check_name", "reason", "tokens"}


def test_token_domain_checks(spark):
    """Suite-gated token-domain checks: NULL elements inside the array
    and ids outside [0, vocab). Default-off (DEFAULT_SUITE emits
    neither check); enabling either changes suite_hash (manifest
    re-queue, exactly like a threshold change)."""
    suite = CheckSuite(
        min_n_tok=1, max_n_tok=100, vocab_size=50, forbid_null_token=True
    )
    base = CheckSuite(min_n_tok=1, max_n_tok=100)
    assert suite.suite_hash() != base.suite_hash()
    names = [c.name for c in cascade.sequence_checks(base)]
    assert "out_of_vocab" not in names and "null_token_element" not in names

    df = spark.createDataFrame(
        [
            ("ok", [0, 1, 49], 3, "a"),
            ("neg", [1, -2, 3], 3, "a"),         # -2 < 0
            ("over", [1, 50, 2], 3, "a"),        # 50 >= vocab 50
            ("null_el", [1, None, 2], 3, "a"),   # NULL element
            # NULL element AND oov: null_token_element wins (cascade order)
            ("both", [None, 99], 2, "a"),
            ("null_payload", None, None, "a"),   # payload check owns it
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {
        r["doc_id"]: (r[cascade.FIRST_FAIL_COL], r[cascade.REASON_COL])
        for r in cascade.apply_cascade(df, cascade.sequence_checks(suite)).collect()
    }
    assert got["ok"][0] is None
    assert got["neg"] == ("out_of_vocab", "token -2 outside [0, 50)")
    assert got["over"] == ("out_of_vocab", "token 50 outside [0, 50)")
    assert got["null_el"] == ("null_token_element", "1 NULL token element(s)")
    assert got["both"][0] == "null_token_element"
    assert got["null_payload"][0] == "null_payload"


def test_token_degeneracy_checks(spark):
    """Suite-gated degeneracy gate: distinct-token fraction and longest
    same-id run, computed inline as codegen HOFs (no join, no UDF)."""
    suite = CheckSuite(
        min_n_tok=1, max_n_tok=1000, min_distinct_frac=0.25, max_token_run=3
    )
    df = spark.createDataFrame(
        [
            ("varied", [1, 2, 3, 4], 4, "a"),          # 1.0 distinct, run 1
            ("loop", [7, 7, 7, 7, 7, 7, 7, 8], 8, "a"),  # run 7 > 3
            # 2 distinct / 12 = 0.1667 < 0.25, but runs of 3 pass the
            # run rule → low_distinct_frac is the reported reason
            ("lowdist", [1, 1, 1, 2, 2, 2, 1, 1, 1, 2, 2, 2], 12, "a"),
            ("edge_run", [5, 5, 5, 6], 4, "a"),        # run 3 == max → pass
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {
        r["doc_id"]: (r[cascade.FIRST_FAIL_COL], r[cascade.REASON_COL])
        for r in cascade.apply_cascade(df, cascade.sequence_checks(suite)).collect()
    }
    assert got["varied"][0] is None
    assert got["loop"] == ("long_token_run", "max_token_run=7 > 3")
    assert got["lowdist"][0] == "low_distinct_frac"
    assert "0.1667 < 0.25" in got["lowdist"][1]
    assert got["edge_run"][0] is None


def test_token_degeneracy_signals(spark):
    """quality.token_degeneracy_signals column semantics: NULL array →
    NULL/NULL; empty → NULL frac, run 0; NULL elements run null-safely."""
    from teleharvest_spark.operators import quality as Q

    df = spark.createDataFrame(
        [
            ("a", [1, 1, 2, 2, 2]),
            ("b", []),
            ("c", None),
            ("d", [None, None, 5]),
            ("e", [3]),
        ],
        "doc_id string, tokens array<int>",
    )
    got = {
        r["doc_id"]: (r["distinct_frac"], r["max_token_run"])
        for r in Q.token_degeneracy_signals(df).collect()
    }
    assert got["a"] == (0.4, 3)           # distinct {1,2} = 2/5; run of 2s = 3
    assert got["b"] == (None, 0)
    assert got["c"] == (None, None)
    # NULL counts as one distinct value: {NULL, 5} = 2/3; NULL run = 2
    assert abs(got["d"][0] - 2 / 3) < 1e-9 and got["d"][1] == 2
    assert got["e"] == (1.0, 1)


def test_sequence_framing_checks(spark):
    """Suite-gated BOS/EOS framing contracts: first token must be BOS,
    last must be EOS, interior EOS bounded (packed-document
    separators). Default-off; enabling changes suite_hash."""
    import pytest

    suite = CheckSuite(
        min_n_tok=1, max_n_tok=100, bos_id=1, eos_id=2, max_interior_eos=1
    )
    base = CheckSuite(min_n_tok=1, max_n_tok=100)
    assert suite.suite_hash() != base.suite_hash()
    names = [c.name for c in cascade.sequence_checks(base)]
    assert "missing_bos" not in names and "missing_eos" not in names

    df = spark.createDataFrame(
        [
            ("ok", [1, 7, 2], 3, "a"),
            ("ok_one_sep", [1, 7, 2, 8, 2], 5, "a"),  # 1 interior eos ≤ 1
            ("no_bos", [7, 8, 2], 3, "a"),
            ("no_eos", [1, 7, 8], 3, "a"),
            ("two_sep", [1, 2, 7, 2, 8, 2], 6, "a"),  # 2 interior eos > 1
            ("single", [1], 1, "a"),  # first==bos, last==1 != eos
            ("null_payload", None, None, "a"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {
        r["doc_id"]: (r[cascade.FIRST_FAIL_COL], r[cascade.REASON_COL])
        for r in cascade.apply_cascade(df, cascade.sequence_checks(suite)).collect()
    }
    assert got["ok"][0] is None
    assert got["ok_one_sep"][0] is None
    assert got["no_bos"] == ("missing_bos", "first token 7 != bos 1")
    assert got["no_eos"] == ("missing_eos", "last token 8 != eos 2")
    assert got["two_sep"] == ("excess_interior_eos", "interior eos count 2 > 1")
    assert got["single"][0] == "missing_eos"
    assert got["null_payload"][0] == "null_payload"

    # eos-only suite: bos checks absent
    eos_only = CheckSuite(min_n_tok=1, eos_id=2)
    names = [c.name for c in cascade.sequence_checks(eos_only)]
    assert "missing_eos" in names and "missing_bos" not in names
    # misconfiguration: interior bound without eos_id
    with pytest.raises(ValueError, match="max_interior_eos"):
        cascade.sequence_checks(CheckSuite(max_interior_eos=0))


def test_duplicate_keys_composite(spark):
    """Composite-key uniqueness (reference: composite PK (id, channel),
    models/message.py:34-36): the same doc_id under two sources is NOT
    a duplicate of the composite key; two rows of the same (doc_id,
    source) are."""
    from teleharvest_spark.operators import uniqueness

    df = spark.createDataFrame(
        [
            ("d1", "a"), ("d1", "b"),          # same id, different source
            ("d2", "a"), ("d2", "a"),          # true composite dup
            (None, "a"), (None, "a"),          # NULL keys group together
        ],
        "doc_id string, source string",
    )
    single = {r.doc_id for r in uniqueness.duplicate_keys(df, "doc_id").collect()}
    assert single == {"d1", "d2", None}
    comp = {
        (r.doc_id, r.source): r.dup_count
        for r in uniqueness.duplicate_keys(df, ("doc_id", "source")).collect()
    }
    assert comp == {("d2", "a"): 2, (None, "a"): 2}
