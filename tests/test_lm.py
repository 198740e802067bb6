"""operators/lm.py — corpus-trained unigram LM scoring.

Hand-computed Lidstone arithmetic on a planted token corpus; the
broadcast-join scoring path is exercised on both seen and unseen ids.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from teleharvest_spark.operators.lm import (
    ppl_buckets,
    read_lm_store,
    score_bigram_lm,
    score_unigram_lm,
    train_bigram_lm,
    train_unigram_lm,
    write_lm_store,
)


def test_train_and_score_hand_computed(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, tokens=[1, 1, 2]),
        Row(doc_id=1, tokens=[2, 3]),
    ])
    lm, meta = train_unigram_lm(df, alpha=0.5)
    # counts: 1->2, 2->2, 3->1; total=5, V=3; denom = 5 + 0.5*(3+1) = 7
    assert meta["total_tokens"] == 5 and meta["vocab_size"] == 3
    got = {r["token"]: r["logp"] for r in lm.collect()}
    assert got[1] == pytest.approx(math.log(2.5 / 7))
    assert got[2] == pytest.approx(math.log(2.5 / 7))
    assert got[3] == pytest.approx(math.log(1.5 / 7))
    assert meta["unseen_logp"] == pytest.approx(math.log(0.5 / 7))

    score_df = spark.createDataFrame([
        Row(doc_id=0, tokens=[1, 1, 2]),          # all at logp ln(2.5/7)
        Row(doc_id=1, tokens=[2, 3]),
        Row(doc_id=2, tokens=[9]),                # unseen id
        Row(doc_id=3, tokens=[]),
        Row(doc_id=4, tokens=None),
    ])
    out = {
        r["doc_id"]: r
        for r in score_unigram_lm(
            score_df, lm, meta["unseen_logp"]
        ).collect()
    }
    assert out[0]["mean_logp"] == pytest.approx(math.log(2.5 / 7))
    assert out[0]["ppl"] == pytest.approx(7 / 2.5)
    assert out[0]["n_unseen"] == 0
    m1 = (math.log(2.5 / 7) + math.log(1.5 / 7)) / 2
    assert out[1]["mean_logp"] == pytest.approx(m1)
    assert out[1]["ppl"] == pytest.approx(math.exp(-m1))
    assert out[2]["n_unseen"] == 1
    assert out[2]["mean_logp"] == pytest.approx(math.log(0.5 / 7))
    for i in (3, 4):
        assert out[i]["n_tok"] == 0
        assert out[i]["mean_logp"] is None and out[i]["ppl"] is None

    # a boring repetitive doc scores LOWER ppl than a rare-token doc —
    # the ordering the filter relies on
    assert out[0]["ppl"] < out[2]["ppl"]


def test_train_rejects_bad_alpha_and_empty_corpus(spark):
    df = spark.createDataFrame([Row(doc_id=0, tokens=[1])])
    with pytest.raises(ValueError, match="alpha"):
        train_unigram_lm(df, alpha=0.0)

    # an empty training corpus is refused: its unseen_logp degenerates
    # to 0 (p(unseen)=1), so every later document would score
    # perplexity 1 — confidently wrong, fail-open filtering with no
    # hint the model is vacuous (misconfigured tokens_col, empty
    # training partition)
    empty = spark.createDataFrame(
        [Row(doc_id=0, tokens=None)], "doc_id long, tokens array<int>"
    )
    with pytest.raises(ValueError, match="no tokens"):
        train_unigram_lm(empty)


def _bi_fixture(spark):
    """Corpus d1=[1,2,3], d2=[1,2]: unigram counts 1->2, 2->2, 3->1
    (total 5, V=3, denom 7 at alpha .5); bigrams (1,2)->2, (2,3)->1;
    contexts c(1)=2, c(2)=1."""
    df = spark.createDataFrame([
        Row(doc_id=0, tokens=[1, 2, 3]),
        Row(doc_id=1, tokens=[1, 2]),
    ])
    lm, meta = train_unigram_lm(df, alpha=0.5)
    bigram = train_bigram_lm(df)
    return df, lm, meta, bigram


def test_bigram_counts_hand_computed(spark):
    _, _, _, bigram = _bi_fixture(spark)
    got = {(r["prev"], r["cur"]): r["c_bi"] for r in bigram.collect()}
    assert got == {(1, 2): 2, (2, 3): 1}


def test_bigram_score_hand_computed(spark):
    _, lm, meta, bigram = _bi_fixture(spark)
    lam = 0.8
    p1, p2, p3, pu = 2.5 / 7, 2.5 / 7, 1.5 / 7, 0.5 / 7

    score_df = spark.createDataFrame([
        Row(doc_id=0, tokens=[1, 2, 3]),   # both pairs seen
        Row(doc_id=1, tokens=[3, 1]),      # context 3 unseen -> full backoff
        Row(doc_id=2, tokens=[2, 2]),      # context seen, pair (2,2) novel
        Row(doc_id=3, tokens=[9]),         # unseen token, no pairs
        Row(doc_id=4, tokens=[]),
        Row(doc_id=5, tokens=None),
    ])
    out = {
        r["doc_id"]: r
        for r in score_bigram_lm(
            score_df, lm, bigram, meta["unseen_logp"], lam=lam
        ).collect()
    }

    m0 = (
        math.log(p1)
        + math.log(lam * 2 / 2 + (1 - lam) * p2)
        + math.log(lam * 1 / 1 + (1 - lam) * p3)
    ) / 3
    assert out[0]["mean_logp"] == pytest.approx(m0)
    assert out[0]["ppl"] == pytest.approx(math.exp(-m0))
    assert out[0]["n_unseen_bi"] == 0

    m1 = (math.log(p3) + math.log(p1)) / 2  # backoff = plain unigram
    assert out[1]["mean_logp"] == pytest.approx(m1)
    assert out[1]["n_unseen_bi"] == 1

    m2 = (math.log(p2) + math.log(lam * 0 / 1 + (1 - lam) * p2)) / 2
    assert out[2]["mean_logp"] == pytest.approx(m2)
    assert out[2]["n_unseen_bi"] == 1

    assert out[3]["mean_logp"] == pytest.approx(math.log(pu))
    assert out[3]["n_unseen_bi"] == 0

    for i in (4, 5):
        assert out[i]["n_tok"] == 0
        assert out[i]["mean_logp"] is None and out[i]["ppl"] is None

    # the fluent in-distribution doc beats the backoff doc
    assert out[0]["ppl"] < out[1]["ppl"]


def test_bigram_score_matches_on_shuffle_join_path(spark):
    """broadcast_rows_max=0 forces the shuffle-join arm — results must
    be IDENTICAL to the broadcast arm (strategy, not semantics)."""
    _, lm, meta, bigram = _bi_fixture(spark)
    score_df = spark.createDataFrame([
        Row(doc_id=0, tokens=[1, 2, 3]),
        Row(doc_id=1, tokens=[3, 1]),
    ])
    a = sorted(map(tuple, score_bigram_lm(
        score_df, lm, bigram, meta["unseen_logp"]
    ).collect()))
    b = sorted(map(tuple, score_bigram_lm(
        score_df, lm, bigram, meta["unseen_logp"], broadcast_rows_max=0
    ).collect()))
    # ints (id, n_tok, n_unseen_bi) must be identical; the float sum of
    # per-position log-probs accumulates in partition order, and the
    # shuffle arm orders rows differently than the broadcast arm — a
    # last-ulp difference is a plan property, not a semantics change
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[:3] == rb[:3]
        assert ra[3:] == pytest.approx(rb[3:], rel=1e-12)


def test_bigram_lam_validation_and_pairless_corpus(spark):
    df, lm, meta, bigram = _bi_fixture(spark)
    for bad in (0.0, 1.0, -1, 2):
        with pytest.raises(ValueError, match="lam"):
            score_bigram_lm(df, lm, bigram, meta["unseen_logp"], lam=bad)

    # single-token corpus: no bigrams at all -> scoring == pure backoff
    singles = spark.createDataFrame([Row(doc_id=0, tokens=[1])])
    bi0 = train_bigram_lm(singles)
    assert bi0.count() == 0
    out = score_bigram_lm(
        spark.createDataFrame([Row(doc_id=0, tokens=[1, 2])]),
        lm, bi0, meta["unseen_logp"],
    ).collect()[0]
    uni = {r["token"]: r["logp"] for r in lm.collect()}
    assert out["mean_logp"] == pytest.approx((uni[1] + uni[2]) / 2)


def test_lm_store_roundtrip(spark, tmp_path):
    df, lm, meta, bigram = _bi_fixture(spark)
    path = str(tmp_path / "lm_store")
    write_lm_store(lm, meta, path, bigram=bigram)
    lm2, bi2, meta2 = read_lm_store(spark, path)
    assert meta2["total_tokens"] == meta["total_tokens"]
    assert meta2["unseen_logp"] == pytest.approx(meta["unseen_logp"])
    assert meta2["has_bigram"] is True
    assert sorted(map(tuple, lm.collect())) == sorted(map(tuple, lm2.collect()))
    assert sorted(map(tuple, bigram.collect())) == sorted(map(tuple, bi2.collect()))

    # scoring a NEW batch against the stored model == against the live one
    batch = spark.createDataFrame([Row(doc_id=7, tokens=[1, 2, 9])])
    live = score_bigram_lm(batch, lm, bigram, meta["unseen_logp"]).collect()
    stored = score_bigram_lm(batch, lm2, bi2, meta2["unseen_logp"]).collect()
    assert sorted(map(tuple, live)) == sorted(map(tuple, stored))

    # unigram-only store
    path2 = str(tmp_path / "lm_uni")
    write_lm_store(lm, meta, path2)
    _, bi_none, meta3 = read_lm_store(spark, path2)
    assert bi_none is None and meta3["has_bigram"] is False

    with pytest.raises(FileNotFoundError):
        read_lm_store(spark, str(tmp_path / "never_written"))


def test_ppl_buckets_per_source_and_global(spark):
    rows = [
        Row(doc_id=i, source="a", ppl=float(i + 1)) for i in range(6)
    ] + [
        # source b sits at a 100x ppl scale — per-source thresholds must
        # still split it 2/2/2, not dump it all into 'tail'
        Row(doc_id=10 + i, source="b", ppl=100.0 * (i + 1)) for i in range(6)
    ] + [Row(doc_id=99, source="a", ppl=None)]
    df = spark.createDataFrame(rows)
    out = {r["doc_id"]: r["ppl_bucket"] for r in ppl_buckets(df).collect()}
    # percentile_approx over 1..6 at (1/3, 2/3) -> thresholds 2 and 4
    for base in (0, 10):
        vals = [out[base + i] for i in range(6)]
        assert vals == ["head", "head", "middle", "middle", "tail", "tail"]
    assert out[99] is None

    g = {r["doc_id"]: r["ppl_bucket"] for r in ppl_buckets(df, by=None).collect()}
    # globally, all of source a (ppl <= 6) lands in head/middle
    assert g[14] == "tail" and g[15] == "tail"
    assert g[0] == "head"

    with pytest.raises(ValueError, match="low_q"):
        ppl_buckets(df, low_q=0.9, high_q=0.1)


def test_plan_bigram_scoring_joins_are_broadcast(spark):
    """The 100 TB contract: the scored corpus streams through
    broadcast hash joins against the vocab-bounded unigram/context
    dimensions and (under the row gate) the bigram dimension — no
    corpus shuffle on the token keys, no cartesian anywhere. The
    over-threshold arm may shuffle-join the bigram dimension ONLY."""
    df, lm, meta, bigram = _bi_fixture(spark)
    out = score_bigram_lm(df, lm, bigram, meta["unseen_logp"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # under the gate the bigram join is broadcast too: the only
    # exchanges are the per-doc aggregate's (and AQE coalescing)
    assert "SortMergeJoin" not in plan

    forced = score_bigram_lm(
        df, lm, bigram, meta["unseen_logp"], broadcast_rows_max=0
    )
    plan2 = forced._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2


def test_null_array_elements_score_as_unseen_not_empty(spark):
    """A genuine NULL ELEMENT inside tokens is a real token slot that
    scores as unseen — only the empty/NULL ARRAY means 'no evidence'
    (NULL ppl). Both scorers must agree on n_tok for the same input."""
    _, lm, meta, bigram = _bi_fixture(spark)
    df = spark.createDataFrame(
        [Row(doc_id=0, tokens=[None, 1]), Row(doc_id=1, tokens=[None])],
        "doc_id long, tokens array<int>",
    )
    uni = {r["doc_id"]: r for r in score_unigram_lm(df, lm, meta["unseen_logp"]).collect()}
    assert uni[0]["n_tok"] == 2 and uni[0]["n_unseen"] == 1
    m0 = (meta["unseen_logp"] + math.log(2.5 / 7)) / 2
    assert uni[0]["mean_logp"] == pytest.approx(m0)
    assert uni[1]["n_tok"] == 1
    assert uni[1]["mean_logp"] == pytest.approx(meta["unseen_logp"])

    bi = {r["doc_id"]: r for r in score_bigram_lm(df, lm, bigram, meta["unseen_logp"]).collect()}
    assert bi[0]["n_tok"] == 2 and bi[1]["n_tok"] == 1
