"""prep_corpus optional stages: clean (PII / C4 lines / cross-doc line
dedup), decontaminate (eval 13-gram cut), mixture (budgets +
upsampling) — activation, semantics, and the digest-chain resume
contract for each."""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F

from teleharvest_spark import pipeline
from teleharvest_spark.functions.text import hash_tokens
from teleharvest_spark.operators.contamination import decontamination_spans

BOILER = "subscribe to our newsletter today please."
EVAL_PASSAGE = (
    "the quick brown fox jumps over the lazy dog while the eager "
    "rabbit watches the quiet river flow past the old stone mill."
)


def _sent(i, j):
    return f"unique sentence s{i}w{j} carries enough words to pass checks."


def _doc(i, n_sent=12, with_boiler=True, with_pii=False, with_eval=False):
    lines = [_sent(i, j) for j in range(n_sent)]
    if with_boiler:
        lines.insert(1, BOILER)
    if with_pii:
        # "topic t{i}" keeps the line distinct AFTER redaction — else
        # the redacted lines are identical and line-dedup (correctly)
        # eats them as corpus-wide boilerplate
        lines[2] = f"contact person{i}@example.com about topic t{i} now."
    if with_eval:
        lines[3] = EVAL_PASSAGE
    return "\n".join(lines)


def _varied_doc(i, n_sent=12, with_pii=False, with_eval=False):
    """Alternating sentence templates: stays clearly under the Gopher
    top-bigram threshold even with a pii/eval line mixed in."""
    lines = [
        (f"unique sentence s{i}w{j} carries enough words to pass checks."
         if j % 2 else
         f"another thought t{i}x{j} brings fresh material for review here.")
        for j in range(n_sent)
    ]
    if with_pii:
        lines[2] = f"contact person{i}@example.com about topic t{i} now."
    if with_eval:
        lines[3] = EVAL_PASSAGE
    return "\n".join(lines)


def _corpus(spark):
    rows = [
        Row(doc_id=i, text=_doc(i, with_pii=(i % 3 == 0), with_eval=(i in (2, 5))),
            source="web" if i % 2 else "books")
        for i in range(12)
    ]
    # one doc WITHOUT boilerplate (control) and one junk-lines doc
    rows.append(Row(doc_id=20, text=_doc(20, with_boiler=False), source="web"))
    rows.append(Row(
        doc_id=21,
        text="no punct line here\n" + _doc(21, with_boiler=False),
        source="web",
    ))
    return spark.createDataFrame(rows)


def _eval_df(spark):
    return (
        spark.createDataFrame([Row(doc_id="e0", text=EVAL_PASSAGE)])
        .select("doc_id", hash_tokens(F.col("text")).alias("tokens"))
    )


CLEAN = {"pii": True, "c4_lines": True, "line_dedup": {"min_count": 3}}


def _run(spark, inp, out, eval_path, **kw):
    return pipeline.prep_corpus(
        spark, inp, out, run_id=kw.pop("run_id", "x1"), capacity=64,
        clean_params=CLEAN, decontam_eval_path=eval_path,
        decontam_min_tok=5,
        mixture_weights={"books": 2.0}, token_budgets=None,
        **kw,
    )


def test_prep_extended_end_to_end(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    evalp = str(tmp_path / "eval")
    _corpus(spark).write.parquet(inp)
    _eval_df(spark).write.parquet(evalp)

    rep = _run(spark, inp, out, evalp)
    st = rep["stages"]

    # clean: boilerplate line cut corpus-wide, PII gone, junk line gone
    cleaned = spark.read.parquet(f"{out}/cleaned_docs")
    assert st["clean"]["hot_lines_removed"] >= 12
    assert cleaned.where(F.col("text").contains("newsletter")).count() == 0
    assert cleaned.where(F.col("text").contains("@example.com")).count() == 0
    assert cleaned.where(F.col("text").contains("<EMAIL>")).count() >= 4
    junk = cleaned.where(F.col("doc_id") == 21).collect()[0]["text"]
    assert "no punct line here" not in junk  # C4 terminal-punct rule

    # control doc unchanged apart from cleanup no-ops
    ctl = cleaned.where(F.col("doc_id") == 20).collect()[0]["text"]
    assert "s20w0" in ctl

    # decontaminate: zero 13-token-gram overlap with the eval set remains
    corpus = spark.read.parquet(f"{out}/corpus")
    hits = decontamination_spans(
        corpus.select("doc_id", "tokens"), _eval_df(spark), k=13
    )
    assert hits.count() == 0
    assert st["decontaminate"]["removed_tokens"] > 0
    # contaminated docs survived with the passage cut (still ≥5 tokens)
    assert corpus.where(F.col("doc_id").isin(2, 5)).count() == 2

    # mixture: every train books doc has exactly 2 copies; web has 1;
    # val/test untouched with copy=0
    mixed = spark.read.parquet(f"{out}/corpus_mixed")
    tr = mixed.where(F.col("split") == "train")
    per = tr.groupBy("doc_id", "source").agg(F.count("*").alias("n")).collect()
    for r in per:
        assert r["n"] == (2 if r["source"] == "books" else 1), r
    rest = mixed.where(F.col("split") != "train")
    assert rest.where(F.col("copy") != 0).count() == 0

    # pack consumes the weighted multiset: pack rows == mixed rows
    packs = spark.read.parquet(f"{out}/packs")
    assert packs.count() == mixed.count()


def test_prep_extended_resume_all_skip_and_eval_change_cascades(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    evalp = str(tmp_path / "eval")
    _corpus(spark).write.parquet(inp)
    _eval_df(spark).write.parquet(evalp)

    _run(spark, inp, out, evalp)
    rep2 = _run(spark, inp, out, evalp, run_id="x2")
    assert all(v == {"skipped": True} for v in rep2["stages"].values()), rep2

    # a new eval set: upstream stages skip, decontaminate + downstream rerun
    ev2 = spark.createDataFrame(
        [Row(doc_id="e1", text=" ".join(_sent(0, j) for j in range(4)))]
    ).select("doc_id", hash_tokens(F.col("text")).alias("tokens"))
    evalp2 = str(tmp_path / "eval2")
    ev2.write.parquet(evalp2)
    rep3 = _run(spark, inp, out, evalp2, run_id="x3")
    st = rep3["stages"]
    assert st["clean"] == {"skipped": True}
    assert st["quality"] == {"skipped": True}
    assert st["dedup"] == {"skipped": True}
    assert st["tokenize"] == {"skipped": True}
    assert "skipped" not in st["decontaminate"]
    assert "skipped" not in st["split"]

    # doc 0's sentences are now eval-contaminated → its tokens shrink
    corpus = spark.read.parquet(f"{out}/corpus")
    hits = decontamination_spans(corpus.select("doc_id", "tokens"), ev2, k=13)
    assert hits.count() == 0


def test_prep_default_params_leave_layout_unchanged(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)
    pipeline.prep_corpus(spark, inp, out, run_id="plain", capacity=64)
    assert not os.path.exists(f"{out}/cleaned_docs")
    assert not os.path.exists(f"{out}/corpus_flat_decontam")
    assert not os.path.exists(f"{out}/corpus_mixed")
    # packs read the un-mixed corpus
    assert spark.read.parquet(f"{out}/packs").count() == \
        spark.read.parquet(f"{out}/corpus").count()


def test_prep_mixture_requires_source(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _corpus(spark).drop("source").write.parquet(inp)
    import pytest

    with pytest.raises(ValueError, match="source"):
        pipeline.prep_corpus(
            spark, inp, out, run_id="nosrc", capacity=64,
            mixture_weights={"books": 2.0},
        )


def test_prep_semdedup_stage_drops_shadowed_docs(spark, tmp_path):
    """semdedup stage: docs whose embeddings are near-identical collapse
    to one survivor; docs without embeddings pass through; resume skips."""
    import numpy as np

    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)

    # embeddings: docs (2i, 2i+1) share a near-identical vector pair;
    # docs 20/21 have NO embedding row. Which docs survive the quality
    # gate upstream is a gate concern, so the expectation is derived
    # from dedup_docs, not hardcoded.
    rng = np.random.RandomState(7)
    rows = []
    for i in range(6):
        base = rng.randn(16)
        for j in (2 * i, 2 * i + 1):
            v = base + 0.001 * rng.randn(16)
            v = v / np.linalg.norm(v)
            rows.append(Row(doc_id=j, embedding=[float(x) for x in v]))
    embp = str(tmp_path / "emb")
    spark.createDataFrame(rows).write.parquet(embp)

    rep = pipeline.prep_corpus(
        spark, inp, out, run_id="sd1", capacity=64,
        semdedup_embeddings_path=embp, semdedup_tau=0.95,
        semdedup_n_cells=2, semdedup_dim=16,
    )
    st = rep["stages"]
    lex = {r["doc_id"] for r in
           spark.read.parquet(f"{out}/dedup_docs").select("doc_id").collect()}
    pairs = [(2 * i, 2 * i + 1) for i in range(6)
             if {2 * i, 2 * i + 1} <= lex]
    assert pairs, "fixture must leave at least one full embedding pair"
    assert st["semdedup"]["dropped"] == len(pairs)
    kept = {r["doc_id"] for r in
            spark.read.parquet(f"{out}/semdedup_docs").select("doc_id").collect()}
    for a, b in pairs:
        assert len({a, b} & kept) == 1   # exactly one survivor per pair
    assert {20, 21} & lex <= kept        # no-embedding docs kept verbatim
    # downstream corpus excludes the semantic dups
    corpus_ids = {r["doc_id"] for r in
                  spark.read.parquet(f"{out}/corpus").select("doc_id").collect()}
    for a, b in pairs:
        assert len({a, b} & corpus_ids) == 1

    rep2 = pipeline.prep_corpus(
        spark, inp, out, run_id="sd2", capacity=64,
        semdedup_embeddings_path=embp, semdedup_tau=0.95,
        semdedup_n_cells=2, semdedup_dim=16,
    )
    assert rep2["stages"]["semdedup"] == {"skipped": True}
    assert rep2["stages"]["tokenize"] == {"skipped": True}


def test_prep_semdedup_duplicate_embedding_rows_do_not_self_shadow(spark, tmp_path):
    """Review fix: a doubled (doc_id, embedding) row must not make the
    doc shadow itself out of the corpus."""
    import numpy as np

    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)
    rng = np.random.RandomState(3)
    rows = []
    for i in range(12):
        v = rng.randn(16)
        v = v / np.linalg.norm(v)
        rows.append(Row(doc_id=i, embedding=[float(x) for x in v]))
    rows.append(rows[0])  # duplicated row for doc 0
    embp = str(tmp_path / "emb")
    spark.createDataFrame(rows).write.parquet(embp)

    rep = pipeline.prep_corpus(
        spark, inp, out, run_id="dup1", capacity=64,
        semdedup_embeddings_path=embp, semdedup_tau=0.95,
        semdedup_n_cells=2, semdedup_dim=16,
    )
    lex = {r["doc_id"] for r in
           spark.read.parquet(f"{out}/dedup_docs").select("doc_id").collect()}
    kept = {r["doc_id"] for r in
            spark.read.parquet(f"{out}/semdedup_docs").select("doc_id").collect()}
    assert kept == lex  # spread vectors: nothing drops, incl. doc 0
    assert rep["stages"]["semdedup"]["dropped"] == 0


def test_prep_batch_honors_clean_and_decontam(spark, tmp_path):
    """Review fix: batches into a cleaned/decontaminated warehouse must
    re-apply PII redaction and the eval cut (and refuse line_dedup)."""
    import pytest

    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    evalp = str(tmp_path / "eval")
    _corpus(spark).write.parquet(inp)
    _eval_df(spark).write.parquet(evalp)
    _run(spark, inp, out, evalp)

    batch = spark.createDataFrame([
        Row(doc_id=100 + i,
            text=_varied_doc(100 + i, with_pii=True, with_eval=(i == 0)),
            source="web")
        for i in range(3)
    ])
    bp = str(tmp_path / "batch")
    batch.write.parquet(bp)

    rep = pipeline.prep_batch(
        spark, bp, out, run_id="b1", capacity=64,
        clean_params={"pii": True, "c4_lines": True},
        decontam_eval_path=evalp, decontam_min_tok=5,
    )
    assert rep["kept"] == 3
    inc = pipeline.read_prep_corpus(spark, out).where(F.col("doc_id") >= 100)
    assert inc.where(F.col("text").contains("@example.com")).count() == 0
    hits = decontamination_spans(
        inc.select("doc_id", "tokens"), _eval_df(spark), k=13
    )
    assert hits.count() == 0

    with pytest.raises(ValueError, match="line_dedup"):
        pipeline.prep_batch(
            spark, bp, out, run_id="b2",
            clean_params={"line_dedup": True},
        )


def test_prep_mixture_token_budget_keeps_null_source_rows(spark, tmp_path):
    """Review fix: token_budgets must not silently delete NULL-source
    train docs (they pack into '__null__' like everywhere else)."""
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    rows = [Row(doc_id=i, text=_varied_doc(i),
                source=(None if i % 4 == 0 else ("web" if i % 2 else "books")))
            for i in range(16)]
    spark.createDataFrame(rows).write.parquet(inp)

    pipeline.prep_corpus(
        spark, inp, out, run_id="nb1", capacity=64,
        token_budgets={"web": 10**9, "books": 10**9},
    )
    corpus = spark.read.parquet(f"{out}/corpus")
    mixed = spark.read.parquet(f"{out}/corpus_mixed")
    n_null_train = corpus.where(
        (F.col("split") == "train") & F.col("source").isNull()
    ).count()
    assert n_null_train > 0, "fixture must land a NULL-source train doc"
    assert mixed.where(
        (F.col("split") == "train") & F.col("source").isNull()
    ).count() == n_null_train


def test_prep_dedup_keep_by_selects_best_cluster_member(spark, tmp_path):
    """dedup_keep_by: the duplicate cluster's survivor is the doc with
    the highest quality column, not the min id."""
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    dup_text = _varied_doc(500)
    rows = [
        Row(doc_id=1, text=dup_text, source="web", score=0.2),
        Row(doc_id=2, text=dup_text, source="web", score=0.9),   # best
        Row(doc_id=3, text=dup_text, source="web", score=0.5),
    ]
    rows += [Row(doc_id=10 + i, text=_varied_doc(10 + i), source="web",
                 score=0.5) for i in range(6)]
    spark.createDataFrame(rows).write.parquet(inp)

    pipeline.prep_corpus(
        spark, inp, out, run_id="kb1", capacity=64, dedup_keep_by="score",
    )
    kept = {r["doc_id"] for r in
            spark.read.parquet(f"{out}/dedup_docs").select("doc_id").collect()}
    assert 2 in kept and 1 not in kept and 3 not in kept
    assert {10, 11, 12, 13, 14, 15} <= kept  # singletons untouched

    # default (no keep_by) keeps the min-id canonical instead
    out2 = str(tmp_path / "wh2")
    pipeline.prep_corpus(spark, inp, out2, run_id="kb2", capacity=64)
    kept2 = {r["doc_id"] for r in
             spark.read.parquet(f"{out2}/dedup_docs").select("doc_id").collect()}
    assert 1 in kept2 and 2 not in kept2


def test_prep_chunk_to_capacity_no_overflowing_packs(spark, tmp_path):
    """chunk_to_capacity: docs longer than capacity are windowed so no
    pack exceeds capacity, every token stays covered, and the packs
    table records (doc_id, chunk_id)."""
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    # one very long doc (~50 sentences ≈ 450 tokens) + normal docs
    rows = [Row(doc_id=1, text=_varied_doc(1, n_sent=50), source="web")]
    rows += [Row(doc_id=10 + i, text=_varied_doc(10 + i), source="web")
             for i in range(6)]
    spark.createDataFrame(rows).write.parquet(inp)

    cap = 64
    pipeline.prep_corpus(
        spark, inp, out, run_id="ch1", capacity=cap, chunk_to_capacity=True,
    )
    packs = spark.read.parquet(f"{out}/packs")
    assert "chunk_id" in packs.columns
    long_chunks = packs.where(F.col("doc_id") == 1)
    assert long_chunks.count() >= 7  # ≈450 tokens / 64 per window
    # chunk coverage: concatenated chunk sizes == original n_tok, and
    # no chunk exceeds capacity
    corpus = spark.read.parquet(f"{out}/corpus")
    n_orig = corpus.where(F.col("doc_id") == 1).collect()[0]["n_tok"]
    from teleharvest_spark.operators.packing import chunk_tokens

    ch = chunk_tokens(
        corpus.where(F.col("doc_id") == 1).select("doc_id", "tokens"),
        chunk_len=cap,
    ).collect()
    assert all(c["n_tok"] <= cap for c in ch)
    covered = set()
    # disjoint stride with end-aligned last window: union of windows
    # covers [0, n_orig)
    starts = sorted(r["chunk_id"] for r in ch)
    assert len(ch) == long_chunks.count()
    # no pack's total size exceeds capacity (the whole point). Note the
    # fixture's "normal" docs (~108 tokens) exceed cap=64 too, so EVERY
    # doc is chunked — size lookup must be per (doc, chunk)
    all_ch = chunk_tokens(
        corpus.select("doc_id", "tokens"), chunk_len=cap
    ).collect()
    sizes = {(r["doc_id"], r["chunk_id"]): r["n_tok"] for r in all_ch}
    per_pack = {}
    for r in packs.collect():
        n = sizes[(r["doc_id"], r["chunk_id"])]
        assert n <= cap
        per_pack.setdefault((r["source_dir"], r["split"], r["pack_id"]), 0)
        per_pack[(r["source_dir"], r["split"], r["pack_id"])] += n
    assert all(v <= cap for v in per_pack.values()), per_pack


def test_prep_chunk_with_upsampled_copies_no_cross_product(spark, tmp_path):
    """chunking runs on distinct docs and rejoins per copy: an
    upsampled long doc contributes copies x chunks rows, not squared."""
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    rows = [Row(doc_id=i, text=_varied_doc(i, n_sent=40), source="books")
            for i in range(8)]
    spark.createDataFrame(rows).write.parquet(inp)
    cap = 64
    pipeline.prep_corpus(
        spark, inp, out, run_id="chm1", capacity=cap, chunk_to_capacity=True,
        mixture_weights={"books": 2.0},
    )
    packs = spark.read.parquet(f"{out}/packs")
    corpus = spark.read.parquet(f"{out}/corpus")
    from teleharvest_spark.operators.packing import chunk_tokens

    n_chunks = {
        r["doc_id"]: r["n"]
        for r in chunk_tokens(corpus.select("doc_id", "tokens"), chunk_len=cap)
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["doc_id"]: r["n"]
        for r in packs.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    train_ids = {
        r["doc_id"]
        for r in corpus.where(F.col("split") == "train").collect()
    }
    for d, n in got.items():
        copies = 2 if d in train_ids else 1  # books x2 on train only
        assert n == copies * n_chunks[d], (d, n, copies, n_chunks[d])


def test_prep_batch_incremental_semantic_dedup(spark, tmp_path):
    """prep_batch semantic dedup vs the stored index: batch docs near a
    corpus survivor drop; novel docs survive and extend the index so
    the NEXT batch dedups against them."""
    import numpy as np

    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    rows = [Row(doc_id=i, text=_varied_doc(i), source="web") for i in range(8)]
    spark.createDataFrame(rows).write.parquet(inp)

    rng = np.random.RandomState(43)
    base_vecs = rng.randn(8, 16)
    base_vecs /= np.linalg.norm(base_vecs, axis=1, keepdims=True)
    embp = str(tmp_path / "emb")
    spark.createDataFrame(
        [Row(doc_id=i, embedding=[float(x) for x in base_vecs[i]])
         for i in range(8)]
    ).write.parquet(embp)

    pipeline.prep_corpus(
        spark, inp, out, run_id="sb0", capacity=64,
        semdedup_embeddings_path=embp, semdedup_tau=0.95,
        semdedup_n_cells=2, semdedup_dim=16,
    )
    assert os.path.isdir(f"{out}/semdedup_index/centroids")
    assert os.path.isdir(f"{out}/semdedup_index/kept_vectors/b_base")

    def jit(v):
        w = v + 0.001 * rng.randn(16)
        return [float(x) for x in w / np.linalg.norm(w)]

    novel = rng.randn(16); novel /= np.linalg.norm(novel)
    b1 = spark.createDataFrame([
        Row(doc_id=100, text=_varied_doc(100), source="web"),  # near base 0
        Row(doc_id=101, text=_varied_doc(101), source="web"),  # novel
    ])
    b1p = str(tmp_path / "b1"); b1.write.parquet(b1p)
    e1p = str(tmp_path / "e1")
    spark.createDataFrame([
        Row(doc_id=100, embedding=jit(base_vecs[0])),
        Row(doc_id=101, embedding=[float(x) for x in novel]),
    ]).write.parquet(e1p)

    r1 = pipeline.prep_batch(
        spark, b1p, out, run_id="sb1", capacity=64,
        semdedup_embeddings_path=e1p, semdedup_tau=0.95, semdedup_dim=16,
    )
    assert r1["sem_dropped"] == 1 and r1["kept"] == 1
    inc_ids = {r["doc_id"] for r in
               pipeline.read_prep_corpus(spark, out)
               .where(F.col("doc_id") >= 100).collect()}
    assert inc_ids == {101}

    # batch 2: a doc near batch 1's survivor must now drop too
    b2 = spark.createDataFrame([
        Row(doc_id=200, text=_varied_doc(200), source="web"),
    ])
    b2p = str(tmp_path / "b2"); b2.write.parquet(b2p)
    e2p = str(tmp_path / "e2")
    spark.createDataFrame([
        Row(doc_id=200, embedding=jit(novel)),
    ]).write.parquet(e2p)
    r2 = pipeline.prep_batch(
        spark, b2p, out, run_id="sb2", capacity=64,
        semdedup_embeddings_path=e2p, semdedup_tau=0.95, semdedup_dim=16,
    )
    assert r2["sem_dropped"] == 1 and r2["kept"] == 0

    # missing base index -> clear error
    out2 = str(tmp_path / "wh2")
    pipeline.prep_corpus(spark, inp, out2, run_id="nosem", capacity=64)
    import pytest

    with pytest.raises(ValueError, match="semdedup_index"):
        pipeline.prep_batch(
            spark, b1p, out2, run_id="sbx", capacity=64,
            semdedup_embeddings_path=e1p, semdedup_dim=16,
        )


def test_compact_indexes_folds_dirs_and_preserves_dedup(spark, tmp_path):
    """compact_indexes: per-ingest index dirs fold to one; a batch of
    exact dups of already-ingested docs still drops entirely against
    the compacted MinHash + semantic indexes."""
    import numpy as np

    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    rows = [Row(doc_id=i, text=_varied_doc(i), source="web") for i in range(8)]
    spark.createDataFrame(rows).write.parquet(inp)
    rng = np.random.RandomState(47)
    vecs = rng.randn(8, 16); vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    embp = str(tmp_path / "emb")
    spark.createDataFrame(
        [Row(doc_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(8)]
    ).write.parquet(embp)
    pipeline.prep_corpus(
        spark, inp, out, run_id="c0", capacity=64,
        semdedup_embeddings_path=embp, semdedup_tau=0.95,
        semdedup_n_cells=2, semdedup_dim=16,
    )

    novel = rng.randn(16); novel /= np.linalg.norm(novel)
    b1 = spark.createDataFrame(
        [Row(doc_id=100, text=_varied_doc(100), source="web")]
    )
    b1p = str(tmp_path / "b1"); b1.write.parquet(b1p)
    e1p = str(tmp_path / "e1")
    spark.createDataFrame(
        [Row(doc_id=100, embedding=[float(x) for x in novel])]
    ).write.parquet(e1p)
    pipeline.prep_batch(
        spark, b1p, out, run_id="c1", capacity=64,
        semdedup_embeddings_path=e1p, semdedup_dim=16,
    )
    assert len(os.listdir(f"{out}/dedup_index")) == 2
    assert len(os.listdir(f"{out}/semdedup_index/kept_vectors")) == 2

    rep = pipeline.compact_indexes(spark, out)
    assert rep["dedup_index"]["folded"] == 2
    assert rep["semdedup_index"]["folded"] == 2
    assert len(os.listdir(f"{out}/dedup_index")) == 1
    assert len(os.listdir(f"{out}/semdedup_index/kept_vectors")) == 1

    # a batch that exactly duplicates base doc 0's text AND batch 1's
    # vector must drop on both axes against the compacted index
    b2 = spark.createDataFrame([
        Row(doc_id=200, text=_varied_doc(0), source="web"),   # lexical dup
        Row(doc_id=201, text=_varied_doc(201), source="web"), # semantic dup
    ])
    b2p = str(tmp_path / "b2"); b2.write.parquet(b2p)
    e2p = str(tmp_path / "e2")
    jit = novel + 0.001 * rng.randn(16); jit /= np.linalg.norm(jit)
    spark.createDataFrame([
        Row(doc_id=201, embedding=[float(x) for x in jit]),
    ]).write.parquet(e2p)
    r2 = pipeline.prep_batch(
        spark, b2p, out, run_id="c2", capacity=64,
        semdedup_embeddings_path=e2p, semdedup_dim=16,
    )
    assert r2["dropped_dups"] == 1       # 200 vs compacted MinHash index
    assert r2["sem_dropped"] == 1        # 201 vs compacted kept_vectors
    assert r2["kept"] == 0


def test_corpus_report_chunked_and_optional_stage_lines(spark, tmp_path):
    """Datasheet: chunked warehouses report per-CHUNK pack fill (mean
    pack tokens ≤ capacity), and optional-stage lines appear only when
    the stage ran."""
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    evalp = str(tmp_path / "eval")
    rows = [Row(doc_id=i, text=_varied_doc(i, n_sent=40, with_eval=(i == 0)),
                source="web") for i in range(8)]
    spark.createDataFrame(rows).write.parquet(inp)
    _eval_df(spark).write.parquet(evalp)

    cap = 64
    pipeline.prep_corpus(
        spark, inp, out, run_id="dr1", capacity=cap, chunk_to_capacity=True,
        clean_params={"pii": True}, decontam_eval_path=evalp,
        decontam_min_tok=5,
    )
    rep = pipeline.corpus_report(spark, out)
    assert rep["mean_pack_tokens"] <= cap
    assert rep["max_pack_tokens"] <= cap
    assert rep["clean_stage"]["rows"] == 8
    assert rep["decontamination"]["removed_tokens"] > 0
    assert "semdedup" not in rep and "mixture_counts" not in rep

    # un-chunked, no optional stages: no stage lines, doc-level fill
    out2 = str(tmp_path / "wh2")
    pipeline.prep_corpus(spark, inp, out2, run_id="dr2", capacity=4096)
    rep2 = pipeline.corpus_report(spark, out2)
    assert "clean_stage" not in rep2 and "decontamination" not in rep2


def test_clean_normalize_unifies_unicode_twins(spark, tmp_path):
    """normalize in clean_params: a composed/decomposed pair of the
    same text (plus zero-width junk) becomes an EXACT duplicate, so
    lexical dedup drops one; without normalize both survive."""
    base = " ".join(f"caféw{j}" for j in range(30))          # NFC é
    decomp = " ".join(f"caféw{j}" for j in range(30))       # e + U+0301
    decomp = "​" + decomp                                     # zero-width
    rows = [
        Row(doc_id=1, text=base, source="web"),
        Row(doc_id=2, text=decomp, source="web"),
    ] + [
        Row(doc_id=10 + i, text=" ".join(f"n{i}w{j}" for j in range(30)),
            source="web")
        for i in range(6)
    ]
    inp, out_a, out_b = (str(tmp_path / d) for d in ("docs", "wa", "wb"))
    spark.createDataFrame(rows).write.parquet(inp)

    plain = pipeline.prep_corpus(spark, inp, out_a, run_id="n0", capacity=64)
    assert plain["stages"]["dedup"]["kept"] == 8  # twins NOT merged

    rep = pipeline.prep_corpus(
        spark, inp, out_b, run_id="n1", capacity=64,
        clean_params={"normalize": True},
    )
    assert rep["stages"]["dedup"]["kept"] == 7  # one twin dropped
    cleaned = spark.read.parquet(f"{out_b}/cleaned_docs")
    texts = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert texts[1] == texts[2]  # byte-identical after repair
    assert "​" not in texts[2] and "́" not in texts[2]
