"""operators/lm.py — corpus-trained unigram LM scoring.

Hand-computed Lidstone arithmetic on a planted token corpus; the
broadcast-join scoring path is exercised on both seen and unseen ids.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from teleharvest_spark.operators.lm import score_unigram_lm, train_unigram_lm


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

    empty = spark.createDataFrame(
        [Row(doc_id=0, tokens=None)], "doc_id long, tokens array<int>"
    )
    lm, meta = train_unigram_lm(empty)
    assert meta["total_tokens"] == 0 and meta["vocab_size"] == 0
    assert lm.count() == 0
    # scoring against an empty lm: every token is unseen, ppl finite
    out = score_unigram_lm(
        spark.createDataFrame([Row(doc_id=0, tokens=[5, 6])]),
        lm, meta["unseen_logp"],
    ).collect()[0]
    assert out["n_unseen"] == 2
    assert out["mean_logp"] == pytest.approx(meta["unseen_logp"])
