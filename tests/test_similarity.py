from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from teleharvest_spark.operators import similarity


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_max_similarity_matches_numpy(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(20, 8).astype(np.float32)
    probes = rng.randn(5, 8).astype(np.float32)
    bdf = _emb(spark, [(i, base[i].tolist(), 0) for i in range(20)])
    pdf = _emb(spark, [(100 + i, probes[i].tolist(), 1) for i in range(5)])
    got = {r["probe_id"]: r["max_sim"] for r in similarity.max_similarity(pdf, bdf).collect()}

    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    pn = probes / np.linalg.norm(probes, axis=1, keepdims=True)
    want = (pn @ bn.T).max(axis=1)
    for i in range(5):
        assert abs(got[100 + i] - want[i]) < 1e-5


def test_empty_baseline_yields_zero(spark):
    """Reference: empty published set → similarity 0.0
    (embedding_service.py:35-37, tests/services/test_embedding_service.py:57-73)."""
    pdf = _emb(spark, [(1, [1.0, 0.0], 1)])
    empty = _emb(spark, []).where(F.lit(False))
    got = similarity.max_similarity(pdf, empty).collect()
    assert got[0]["max_sim"] == 0.0


def test_brute_force_topk_excludes_self_and_ranks(spark):
    vs = _emb(
        spark,
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [0.0, 1.0], 0),
            (4, [1.0, 0.05], 0),
        ],
    )
    top = similarity.brute_force_topk(vs.where(F.col("vec_id") == 1), vs, k=2).collect()
    assert [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])] == [4, 2]
    assert all(r["neighbor_id"] != 1 for r in top)


def test_ivf_topk_recall_on_tight_clusters(spark):
    """IVF with n_probe close to n_cells must retrieve same-cluster
    siblings of near-identical vectors (the near-dup retrieval use)."""
    rng = np.random.RandomState(13)
    centers = rng.randn(8, 16).astype(np.float32)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(3):
            rows.append((vid, (c + rng.randn(16).astype(np.float32) * 0.01).tolist(), 0))
            vid += 1
    df = _emb(spark, rows)
    top = similarity.ivf_topk(df, df, dim=16, k=2, n_cells=4, n_probe=2)
    got = {(r["probe_id"], r["neighbor_id"]) for r in top.collect()}
    hits = 0
    for pid in range(vid):
        cluster = pid // 3
        sibs = {cluster * 3 + j for j in range(3)} - {pid}
        if any((pid, s) in got for s in sibs):
            hits += 1
    assert hits / vid >= 0.9


def test_ivf_topk_sims_match_exact_cosine(spark):
    """Returned sims must equal the exact cosine — IVF approximates the
    candidate set, never the metric."""
    rng = np.random.RandomState(17)
    mat = rng.randn(12, 8).astype(np.float32)
    df = _emb(spark, [(i, mat[i].tolist(), 0) for i in range(12)])
    got = similarity.ivf_topk(df, df, dim=8, k=3, n_cells=3, n_probe=3).collect()
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mn @ mn.T
    assert len(got) > 0
    for r in got:
        assert abs(r["sim"] - sims[r["probe_id"], r["neighbor_id"]]) < 1e-4
        assert r["probe_id"] != r["neighbor_id"]


def test_lsh_topk_recall_on_tight_clusters(spark):
    """Near-identical vectors land in the same bucket — LSH must find
    them (the designed use: near-dup retrieval, not far-field ANN)."""
    rng = np.random.RandomState(11)
    centers = rng.randn(10, 16).astype(np.float32)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(3):  # 3 members per tight cluster
            rows.append((vid, (c + rng.randn(16).astype(np.float32) * 0.01).tolist(), 0))
            vid += 1
    df = _emb(spark, rows)
    top = similarity.lsh_topk(df, df, dim=16, k=2, n_planes=8)
    got = {(r["probe_id"], r["neighbor_id"]) for r in top.collect()}
    # every member should retrieve at least one same-cluster sibling
    hits = 0
    for pid in range(vid):
        cluster = pid // 3
        sibs = {cluster * 3 + j for j in range(3)} - {pid}
        if any((pid, s) in got for s in sibs):
            hits += 1
    assert hits / vid >= 0.9


def test_lsh_topk_tolerates_null_and_malformed_embeddings(spark):
    """NULL / wrong-dim embeddings get an empty bucket set and silently
    drop out of the candidate join instead of crashing the Arrow kernel
    (ADVICE r2: np.stack on a 0-d None aborted the query)."""
    rng = np.random.RandomState(3)
    good = [(int(i), rng.randn(8).astype(np.float32).tolist(), 0) for i in range(20)]
    bad = [(100, None, 1), (101, [1.0, 2.0], 1)]  # NULL + wrong dim
    df = _emb(spark, good + bad)
    out = similarity.lsh_topk(df, df, dim=8, k=3, n_planes=2, n_tables=4).collect()
    probe_ids = {r["probe_id"] for r in out}
    neighbor_ids = {r["neighbor_id"] for r in out}
    assert 100 not in probe_ids and 101 not in probe_ids
    assert 100 not in neighbor_ids and 101 not in neighbor_ids
    assert len(probe_ids) > 0  # the good rows still produce neighbors


def test_ivf_spill_superset_and_degenerate(spark):
    """Boundary-spilled IVF: (a) with eps=2.0 every corpus vector is
    dual-assigned, so n_probe=n_cells must still equal brute force
    (dropDuplicates absorbs the replicas); (b) spill recall is >= the
    unspilled recall at equal (n_cells, n_probe) on the fixture."""
    import pyspark.sql.functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 10)
    exact = {(r["probe_id"], r["neighbor_id"]) for r in
             similarity.brute_force_topk(probes, emb, k=5).collect()}
    full_spill = {(r["probe_id"], r["neighbor_id"]) for r in
                  similarity.ivf_topk(probes, emb, dim=64, k=5, n_cells=8,
                                      n_probe=8, spill_eps=2.0).collect()}
    assert full_spill == exact

    def recall(eps):
        got = {(r["probe_id"], r["neighbor_id"]) for r in
               similarity.ivf_topk(probes, emb, dim=64, k=5, n_cells=16,
                                   n_probe=6, spill_eps=eps).collect()}
        return len(got & exact)

    assert recall(0.08) >= recall(0.0)


def test_lsh_multiprobe_superset_of_exact_bucket(spark):
    """Multi-probe only ADDS probe keys: its candidate pair set is a
    superset of the exact-bucket run at equal (b, L), so recall can
    only rise; and with n_planes=0 (no bits to flip) it degrades to
    the exact full-scan behavior."""
    import pyspark.sql.functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 10)
    base = {(r["probe_id"], r["neighbor_id"]) for r in
            similarity.lsh_topk(probes, emb, dim=64, k=50, n_planes=10,
                                n_tables=2).collect()}
    multi = {(r["probe_id"], r["neighbor_id"]) for r in
             similarity.lsh_topk(probes, emb, dim=64, k=50, n_planes=10,
                                 n_tables=2, multiprobe=1).collect()}
    # every probe's exact-bucket candidates survive under multi-probe
    # (k=50 is far above candidate counts at b=10 L=2 on 2k vectors)
    assert base <= multi

    exact = {(r["probe_id"], r["neighbor_id"]) for r in
             similarity.brute_force_topk(probes, emb, k=5).collect()}
    degen = {(r["probe_id"], r["neighbor_id"]) for r in
             similarity.lsh_topk(probes, emb, dim=64, k=5, n_planes=0,
                                 n_tables=1, multiprobe=1).collect()}
    assert degen == exact


def test_ivf_index_build_query_matches_inline(spark, tmp_path):
    """Stored-index query ≡ the inline ivf_topk at the same params
    (train_centroids is seed-deterministic, so both paths share the
    exact cell geometry)."""
    rng = np.random.RandomState(21)
    rows = [(i, rng.randn(8).astype(np.float32).tolist(), 0) for i in range(60)]
    df = _emb(spark, rows)
    idx = str(tmp_path / "ivf")
    meta = similarity.build_ivf_index(df, idx, dim=8, n_cells=4)
    assert meta["rows_indexed"] == 60 and meta["n_cells"] == 4

    inline = {
        (r["probe_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ivf_topk(df, df, dim=8, k=3, n_cells=4, n_probe=2).collect()
    }
    stored = {
        (r["probe_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.query_ivf_index(df, idx, k=3, n_probe=2).collect()
    }
    assert stored == inline

    # degenerate: probing every cell ≡ brute force
    brute = {
        (r["probe_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.brute_force_topk(df, df, k=3).collect()
    }
    full = {
        (r["probe_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.query_ivf_index(df, idx, k=3, n_probe=4).collect()
    }
    assert full == brute


def test_ivf_index_partition_pruning_and_extend(spark, tmp_path):
    """The probed-cell filter must reach the parquet read as a
    directory skip, and an appended batch is queryable without
    touching the stored rows."""
    rng = np.random.RandomState(5)
    rows = [(i, rng.randn(8).astype(np.float32).tolist(), 0) for i in range(40)]
    df = _emb(spark, rows)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(df, idx, dim=8, n_cells=4)

    # one probe → n_probe=1 → exactly one cell dir read
    probe = df.where(F.col("vec_id") == 0)
    cents = similarity._stored_centroids(spark, idx, similarity.read_ivf_meta(idx))
    assigned = probe.select(
        F.explode(similarity._cell_assign_udf(cents, 1)(F.col("embedding"))).alias("c")
    ).collect()
    want_cell = assigned[0]["c"]
    pruned = spark.read.parquet(f"{idx}/cells").where(F.col("cell") == want_cell)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    # the cell predicate must land in PartitionFilters (directory skip),
    # NOT PushedFilters (row-group skip inside files already opened)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and f"= {want_cell})" in pf[0], plan

    # extend: a twin of vec 0 lands in the same cell and ranks first
    twin_vec = rows[0][1]
    batch = _emb(spark, [(1000, twin_vec, 0)])
    meta2 = similarity.extend_ivf_index(batch, idx)
    assert meta2["rows_appended"] == 1
    got = similarity.query_ivf_index(probe, idx, k=1, n_probe=1).collect()
    assert got[0]["neighbor_id"] == 1000 and got[0]["sim"] == 1.0

    # replayed append duplicates rows but never results
    similarity.extend_ivf_index(batch, idx)
    got2 = similarity.query_ivf_index(probe, idx, k=2, n_probe=1).collect()
    assert [r["neighbor_id"] for r in got2 if r["rank"] == 1] == [1000]
    assert len({(r["probe_id"], r["neighbor_id"]) for r in got2}) == len(got2)

    import pytest as _pt

    with _pt.raises(FileNotFoundError, match="meta.json"):
        similarity.read_ivf_meta(str(tmp_path / "nope"))


def test_ivf_index_rebuild_crash_window_reads_as_no_index(spark, tmp_path):
    """A rebuild retracts meta.json FIRST: a crash between the new
    centroids and the new meta must read as 'no index', never as the
    old meta over mixed geometry."""
    rng = np.random.RandomState(3)
    df = _emb(spark, [(i, rng.randn(4).astype(np.float32).tolist(), 0) for i in range(20)])
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(df, idx, dim=4, n_cells=2)

    # simulate the crash window: rebuild got as far as new centroids
    # (meta already retracted), then died before writing meta back
    import os

    os.remove(os.path.join(idx, similarity.IVF_META))
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        similarity.query_ivf_index(df, idx, k=1, n_probe=1)

    # a completed rebuild over the same path works end to end
    meta = similarity.build_ivf_index(df, idx, dim=4, n_cells=4)
    assert meta["n_cells"] == 4
    assert similarity.query_ivf_index(df, idx, k=1, n_probe=4).count() == 20


def test_plan_ann_selection_rules():
    pts = [
        {"method": "ivf", "params": {"n_probe": 8}, "recall": 0.5, "scan_fraction": 0.13},
        {"method": "ivf", "params": {"n_probe": 32}, "recall": 0.92, "scan_fraction": 0.50},
        {"method": "ivf", "params": {"n_probe": 56}, "recall": 0.97, "scan_fraction": 0.495},
        {"method": "lsh", "params": {"n_tables": 16}, "recall": 0.92, "scan_fraction": 0.46},
    ]
    # cheapest feasible scan wins
    got = similarity.plan_ann(pts, target_recall=0.9)
    assert got["feasible"] and got["method"] == "lsh" and got["scan_fraction"] == 0.46
    # tighter recall target excludes lsh → ivf spill point
    got = similarity.plan_ann(pts, target_recall=0.95)
    assert got["feasible"] and got["params"] == {"n_probe": 56}
    # infeasible target → best recall in budget, flagged
    got = similarity.plan_ann(pts, target_recall=0.99, scan_budget=0.5)
    assert not got["feasible"] and got["recall"] == 0.97
    # budget excludes everything ≥0.9 → cheap point, flagged
    got = similarity.plan_ann(pts, target_recall=0.9, scan_budget=0.2)
    assert not got["feasible"] and got["scan_fraction"] == 0.13
    # ties broken deterministically (same scan/recall → method order)
    tie = [
        {"method": "lsh", "params": {"a": 1}, "recall": 0.95, "scan_fraction": 0.4},
        {"method": "ivf", "params": {"b": 2}, "recall": 0.95, "scan_fraction": 0.4},
    ]
    assert similarity.plan_ann(tie, 0.9)["method"] == "ivf"
    import pytest

    with pytest.raises(ValueError):
        similarity.plan_ann([], 0.9)


def test_calibrate_ann_measures_real_curve(spark):
    """Calibration on a clustered fixture: the full-probe IVF config
    (n_probe == n_cells ≡ brute force) must report recall 1.0 and
    ~full scan; a 1-probe config must scan less; plan_ann over the
    measured points picks a feasible config for an easy target."""
    rng = np.random.RandomState(3)
    base = rng.randn(60, 8).astype(np.float32)
    corpus = _emb(spark, [(i, (base[i] / np.linalg.norm(base[i])).tolist(), 0) for i in range(60)])
    probes = _emb(spark, [(100 + i, (base[i] / np.linalg.norm(base[i])).tolist(), 1) for i in range(4)])
    pts = similarity.calibrate_ann(
        probes, corpus, dim=8, k=3,
        ivf_grid=((4, 4, 0.0), (4, 1, 0.0)),
        lsh_grid=((4, 8, 1),),
    )
    assert len(pts) == 3
    by = {(p["method"], tuple(sorted(p["params"].items()))): p for p in pts}
    full = by[("ivf", (("n_cells", 4), ("n_probe", 4), ("spill_eps", 0.0)))]
    one = by[("ivf", (("n_cells", 4), ("n_probe", 1), ("spill_eps", 0.0)))]
    assert full["recall"] == 1.0 and full["scan_fraction"] > 0.9
    assert one["scan_fraction"] < full["scan_fraction"]
    assert one["recall"] <= full["recall"]
    chosen = similarity.plan_ann(pts, target_recall=0.99)
    assert chosen["feasible"] and chosen["recall"] >= 0.99
