"""Train/eval contamination scan (VERDICT r3 item 7)."""

from __future__ import annotations

import pyspark.sql.functions as F

from teleharvest_spark.operators import contamination

TRAIN = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # contains the eval benchmark verbatim mid-document:
    (2, "noise prefix words the exact benchmark question and answer text here suffix noise"),
    (3, "totally unrelated content about spark catalyst and tungsten engines"),
    (4, None),
]
EVAL = [
    (100, "the exact benchmark question and answer text here"),
    (101, "some other eval item with no training twin whatsoever today"),
]


def _dfs(spark):
    t = spark.createDataFrame(TRAIN, "doc_id long, text string")
    e = spark.createDataFrame(EVAL, "doc_id long, text string")
    return t, e


def test_planted_contamination_found(spark):
    t, e = _dfs(spark)
    rows = {
        (r["doc_id"], r["eval_id"]): r
        for r in contamination.contamination_scan(t, e, k=3, min_overlap=2).collect()
    }
    assert (2, 100) in rows
    hit = rows[(2, 100)]
    # eval doc 100 has 8 words -> 6 distinct 3-shingles, ALL inside doc 2
    assert hit["n_eval"] == 6
    assert hit["n_overlap"] == 6
    assert hit["overlap_frac"] == 1.0
    # the clean eval item matches nothing; unrelated/NULL train rows clean
    assert not any(eid == 101 for (_, eid) in rows)
    assert not any(d in (1, 3, 4) for (d, _) in rows)


def test_min_overlap_gates_single_shingle_noise(spark):
    t, e = _dfs(spark)
    # with min_overlap=1 a single shared shingle would flag; default 2 must not
    one = contamination.contamination_scan(
        spark.createDataFrame(
            [(9, "zz qq ww the exact benchmark rr tt yy uu ii")],
            "doc_id long, text string",
        ),
        e,
        k=3,
        min_overlap=2,
    ).collect()
    assert one == []


def test_plan_broadcasts_eval_dimension(spark):
    """The 100 TB contract: the train side streams through a broadcast
    hash join — no shuffle of the corpus on the join."""
    t, e = _dfs(spark)
    plan = contamination.contamination_scan(t, e)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fixture_split_non_vacuous(spark):
    """The driver-gated query's mod-97 split yields real contamination
    pairs on the fixture (the oracle checks values, this pins the
    scenario isn't empty)."""
    import __spark_entry__ as E

    assert E.q_contamination(spark, "/root/testdata/sf0.001").count() > 0


# ---------------------------------------------------------------------------
# token-level decontamination (span removal)

def _tok_dfs(spark):
    """Train docs as token arrays: doc 1 clean, doc 2 embeds eval 200's
    13-gram run [100..117] at positions 5..23, doc 3 IS an eval doc
    verbatim, doc 4 shorter than k, doc 5 NULL tokens."""
    eval_seq = list(range(100, 118))           # 18 tokens -> 6 13-grams
    train = [
        (1, list(range(1, 40))),
        (2, list(range(50, 55)) + eval_seq + list(range(70, 90))),
        (3, list(eval_seq)),
        (4, [100, 101, 102]),
        (5, None),
    ]
    ev = [(200, eval_seq), (201, list(range(900, 930)))]
    t = spark.createDataFrame(train, "doc_id long, tokens array<int>")
    e = spark.createDataFrame(ev, "doc_id long, tokens array<int>")
    return t, e


def test_decontamination_spans_exact(spark):
    t, e = _tok_dfs(spark)
    spans = {
        r["doc_id"]: (r["start"], r["end"])
        for r in contamination.decontamination_spans(t, e, k=13).collect()
    }
    # doc 2: eval run occupies positions 5..22 inclusive -> span [5, 23)
    assert spans[2] == (5, 23)
    # doc 3 is wholly an eval doc -> span covers everything
    assert spans[3] == (0, 18)
    # clean / short / NULL docs produce no spans
    assert set(spans) == {2, 3}


def test_decontaminate_removes_exact_tokens(spark):
    t, e = _tok_dfs(spark)
    out = {r["doc_id"]: r for r in contamination.decontaminate(t, e, k=13).collect()}
    assert out[1]["tokens"] == list(range(1, 40)) and out[1]["n_removed_tok"] == 0
    assert out[2]["tokens"] == list(range(50, 55)) + list(range(70, 90))
    assert out[2]["n_removed_tok"] == 18
    assert out[3]["tokens"] == [] and out[3]["n_removed_tok"] == 18
    assert out[4]["tokens"] == [100, 101, 102]     # sub-k: not evidence
    assert out[5]["tokens"] is None and out[5]["n_removed_tok"] == 0


def test_decontamination_pad_expands_and_clamps(spark):
    t, e = _tok_dfs(spark)
    spans = {
        r["doc_id"]: (r["start"], r["end"])
        for r in contamination.decontamination_spans(t, e, k=13, pad=10).collect()
    }
    assert spans[2] == (0, 33)      # 5-10 clamps to 0; 23+10=33
    assert spans[3] == (0, 28)      # end runs past doc length (18) by design
    out = {r["doc_id"]: r for r in contamination.decontaminate(t, e, k=13, pad=10).collect()}
    # remove_spans clamps the padded end: doc 2 keeps tokens from pos 33 on
    assert out[2]["tokens"] == (list(range(50, 55)) + list(range(100, 118)) + list(range(70, 90)))[33:]
    assert out[3]["tokens"] == []


def test_decontamination_partitioning_invariant(spark):
    t, e = _tok_dfs(spark)
    a = sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in contamination.decontamination_spans(t, e, k=13).collect()
    )
    b = sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in contamination.decontamination_spans(t.repartition(7), e.coalesce(1), k=13).collect()
    )
    assert a == b


def test_remove_spans_trims_duplicated_passages(spark):
    """remove_spans composes with duplicated_ngram_spans too: the
    boilerplate passage shared by two docs is cut from both."""
    from teleharvest_spark.operators import dedup

    boiler = list(range(500, 520))
    docs = spark.createDataFrame(
        [(1, list(range(10)) + boiler), (2, boiler + list(range(30, 45)))],
        "doc_id long, tokens array<int>",
    )
    spans = dedup.duplicated_ngram_spans(docs, k=20, min_count=2)
    out = {r["doc_id"]: r["tokens"] for r in dedup.remove_spans(docs, spans).collect()}
    assert out[1] == list(range(10))
    assert out[2] == list(range(30, 45))


def _unit(seed: int, dim: int = 8, flip: int | None = None) -> list[float]:
    """Deterministic unit vector; `flip` perturbs one coordinate so the
    pair is near-but-not-equal."""
    import hashlib
    import math

    v = [
        int.from_bytes(hashlib.sha256(f"{seed}:{i}".encode()).digest()[:4], "big")
        / 2**32
        - 0.5
        for i in range(dim)
    ]
    if flip is not None:
        v[flip] += 0.15
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_semantic_contamination_planted_hits(spark):
    """Exact copy hits at cosine 1, a jittered paraphrase hits above
    tau, far vectors / NULL / wrong-dim rows never hit; the reported
    eval_id is the argmax neighbor; zero shuffles in the scan side."""
    import numpy as np

    dim = 8
    ev = [("ev_a", _unit(1, dim)), ("ev_b", _unit(2, dim))]
    train = [
        (10, _unit(1, dim)),            # exact copy of ev_a
        (11, _unit(2, dim, flip=3)),    # near ev_b
        (12, _unit(99, dim)),           # unrelated
        (13, None),                     # NULL: skipped
        (14, _unit(5, dim)[:4]),        # wrong dim: skipped
    ]
    t = spark.createDataFrame(train, "doc_id long, embedding array<float>")
    e = spark.createDataFrame(ev, "eval_id string, embedding array<float>")
    got = {
        r["doc_id"]: (r["eval_id"], r["cosine"])
        for r in contamination.semantic_contamination(
            t, e, tau=0.9, dim=dim
        ).collect()
    }
    assert set(got) == {10, 11}
    assert got[10][0] == "ev_a" and got[10][1] > 0.9999
    assert got[11][0] == "ev_b" and 0.9 <= got[11][1] < 1.0
    # parity with plain numpy for the near pair
    E = np.array(ev[1][1]); V = np.array(train[1][1])
    want = float(E @ V / (np.linalg.norm(E) * np.linalg.norm(V)))
    assert abs(got[11][1] - want) < 1e-6


def test_semantic_contamination_guards(spark):
    import pytest

    t = spark.createDataFrame(
        [(1, _unit(1))], "doc_id long, embedding array<float>"
    )
    e_null = spark.createDataFrame(
        [("e", None)], "eval_id string, embedding array<float>"
    )
    with pytest.raises(ValueError, match="no non-NULL"):
        contamination.semantic_contamination(t, e_null, dim=8)
    e_big = spark.createDataFrame(
        [(f"e{i}", _unit(i)) for i in range(5)],
        "eval_id string, embedding array<float>",
    )
    with pytest.raises(ValueError, match="max_eval_rows"):
        contamination.semantic_contamination(t, e_big, dim=8, max_eval_rows=3)
    # dim inferred off the first eval row when omitted
    out = contamination.semantic_contamination(t, e_big.limit(2), tau=2.0)
    assert out.count() == 0  # tau above 1: nothing can hit


def test_semantic_contamination_no_shuffle_scan(spark):
    """The train side is projection+filter feeding a broadcast id join
    — no SortMergeJoin, no Exchange hashpartitioning on the scan."""
    t = spark.createDataFrame(
        [(i, _unit(i)) for i in range(50)], "doc_id long, embedding array<float>"
    )
    e = spark.createDataFrame(
        [("e0", _unit(1))], "eval_id string, embedding array<float>"
    )
    plan = contamination.semantic_contamination(
        t, e, tau=0.99, dim=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
