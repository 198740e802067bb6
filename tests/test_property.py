"""Property-based tests (hypothesis): operators vs brute-force models.

Goes beyond the reference's example-based pytest strategy (SURVEY §5 —
it has no property tests): each operator is checked against an
independent driver-side reference implementation over randomized
small inputs, including the edge shapes the r2 fixes addressed
(duplicate keys, ties, NULLs, empty sides).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from teleharvest_spark.operators import asof, merge, rangejoin

KEYS = st.sampled_from(["a", "b"])
TS = st.integers(min_value=0, max_value=12)
VAL = st.one_of(st.none(), st.integers(min_value=-3, max_value=3).map(float))

LEFT_ROWS = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=8)
RIGHT_ROWS = st.lists(st.tuples(KEYS, TS, VAL), min_size=0, max_size=8)

PROP = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _asof_model(left, right):
    """Brute-force as-of: latest right (ts <= lts) per key; ties by
    greatest (ts, value) struct, NULL value smallest — mirrors the
    operator's documented tie-break."""
    out = {}
    for i, (k, lts) in enumerate(left):
        cands = [(rts, v) for (rk, rts, v) in right if rk == k and rts <= lts]
        if not cands:
            out[i] = (None, None)
        else:
            best = max(cands, key=lambda c: (c[0], c[1] is not None, c[1] if c[1] is not None else 0.0))
            out[i] = best
    return out


@PROP
@given(left=LEFT_ROWS, right=RIGHT_ROWS)
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)] or [("_", -1, -1)],
        "user string, ts long, idx long",
    )
    rdf = spark.createDataFrame(
        right or [("_", -1, None)], "user string, ts long, value double"
    )
    got = {
        r["idx"]: (r["ts_asof"], r["value_asof"])
        for r in asof.asof_join(ldf, rdf, key="user").collect()
        if r["idx"] >= 0
    }
    model = _asof_model(left, right)
    assert got == model


@PROP
@given(left=LEFT_ROWS, right=st.lists(st.tuples(KEYS, TS), min_size=0, max_size=10))
def test_windowed_count_matches_bruteforce(spark, left, right):
    W = 4  # seconds
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)] or [("_", -1, -1)],
        "user string, ts_s long, idx long",
    ).selectExpr("user", "timestamp_seconds(ts_s) as ts", "idx")
    rdf = spark.createDataFrame(
        right or [("_", -1)], "user string, ts_s long"
    ).selectExpr("user", "timestamp_seconds(ts_s) as ts")
    got = {
        r["idx"]: r["n_in_window"]
        for r in rangejoin.windowed_count(ldf, rdf, key="user", window_seconds=W).collect()
        if r["idx"] >= 0
    }
    model = {
        i: sum(1 for (rk, rt) in right if rk == k and lt - W <= rt < lt)
        for i, (k, lt) in enumerate(left)
    }
    assert got == model


@PROP
@given(
    target=st.lists(st.tuples(st.integers(0, 6), VAL), min_size=0, max_size=8),
    updates=st.lists(st.tuples(st.integers(0, 6), VAL), min_size=0, max_size=8),
)
def test_merge_upsert_matches_model(spark, target, updates):
    """Duplicate update keys allowed: the operator resolves them with
    the deterministic greatest-update-struct winner rule instead of
    fanning out matched target rows (the silent-corruption mode a
    plain left join would have under a late-data replay)."""
    tdf = spark.createDataFrame(target or [(-1, None)], "k long, v double")
    udf = spark.createDataFrame(updates or [(-1, None)], "k long, v double")
    skey = lambda t: (t[0], t[1] is not None, t[1] if t[1] is not None else 0.0)
    got = sorted(
        (
            (r["k"], r["v"])
            for r in merge.merge_upsert(tdf, udf, keys=["k"]).collect()
            if r["k"] >= 0
        ),
        key=skey,
    )
    # winner per key: greatest (v,) struct desc — Spark desc is NULLS
    # LAST, so a non-NULL value beats NULL, larger beats smaller
    upd: dict = {}
    for k, v in updates:
        if k not in upd:
            upd[k] = v
        elif upd[k] is None or (v is not None and v > upd[k]):
            upd[k] = v
    # matched keys take the winning update value EVEN WHEN NULL
    # (presence semantics — the reference's setattr update and the
    # Iceberg MERGE twin both write NULL; a NULL winner only occurs
    # when EVERY duplicate update for the key is NULL, since the
    # winner rule prefers non-NULL); unmatched update keys skipped;
    # target multiplicity preserved — NEVER inflated by duplicates
    model = sorted(
        ((k, upd[k] if k in upd else v) for (k, v) in target),
        key=skey,
    )
    assert got == model


@PROP
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 30),                      # doc_id (dups allowed)
            st.sampled_from(["a", "b"]),             # group
            st.one_of(st.none(), st.integers(0, 12)) # size (NULL → 0)
        ),
        min_size=0,
        max_size=12,
    )
)
def test_pack_sequences_matches_greedy_model(spark, rows):
    from teleharvest_spark.operators import packing

    CAP = 10
    df = spark.createDataFrame(
        rows or [(-1, "z", 0)], "doc_id long, source string, n_tok long"
    )
    got = {
        (r["source"], r["doc_id"]): r["pack_id"]
        for r in packing.pack_sequences(df, capacity=CAP).collect()
        if r["doc_id"] >= 0
    }
    # model: per group, ascending (doc_id, size) — the operator's
    # r3 determinism order (dup keys fold in size order, matching the
    # oracle's ORDER BY doc_id, n) — greedy fold
    model = {}
    for g in sorted({s for _, s, _ in rows}):
        grp = sorted(
            [(d, n if n is not None else 0) for d, s, n in rows if s == g],
            key=lambda t: (t[0], t[1]),
        )
        acc, pack = 0, 0
        for i, (d, n) in enumerate(grp):
            if i > 0 and acc + n > CAP:
                pack += 1
                acc = n
            else:
                acc += n
            model[(g, d)] = pack
    # duplicate doc_ids collapse to one dict entry on both sides only
    # if their pack assignment agrees; compare as dicts built the same way
    assert got == model


# ---------------------------------------------------------------------------
# SimHash pigeonhole blocking — key-construction math, Spark-free model
# ---------------------------------------------------------------------------

def _model_block_keys(sig: int, m: int) -> list[int]:
    """Pure-Python twin of dedup._block_keys over one signature."""
    sig &= (1 << 64) - 1
    width = 64 // m
    keys = []
    for c in range(m):
        start = c * width
        w = 64 - start if c == m - 1 else width
        keys.append(((sig >> start) & ((1 << w) - 1), w))
    return keys


def _model_covers(sig_a: int, sig_b: int, h: int, scheme: str) -> bool:
    if scheme == "block_pairs":
        m = h + 2
        ka, kb = _model_block_keys(sig_a, m), _model_block_keys(sig_b, m)
        return any(
            ka[i][0] == kb[i][0] and ka[j][0] == kb[j][0]
            for i in range(m)
            for j in range(i + 1, m)
        )
    m = h + 1
    ka, kb = _model_block_keys(sig_a, m), _model_block_keys(sig_b, m)
    return any(ka[c][0] == kb[c][0] for c in range(m))


@PROP
@given(
    sig=st.integers(min_value=0, max_value=(1 << 64) - 1),
    flip_bits=st.lists(st.integers(min_value=0, max_value=63), min_size=0, max_size=6, unique=True),
    h=st.integers(min_value=0, max_value=6),
)
def test_pigeonhole_schemes_cover_all_within_bound(sig, flip_bits, h):
    """ANY pair within Hamming h must share a block (blocks scheme) and
    a block pair (pairs scheme) — the losslessness that makes the
    bucketed join complete. Checked directly on the key-extraction
    math for every h, including the remainder-bit last block."""
    other = sig
    for b in flip_bits:
        other ^= 1 << b
    d = bin(sig ^ other).count("1")
    if d <= h:
        assert _model_covers(sig, other, h, "blocks")
        assert _model_covers(sig, other, h, "block_pairs")


def test_model_matches_spark_block_keys(spark):
    """The pure-Python model and the Spark column expressions agree on
    concrete signatures (ties the property test to the real code)."""
    import pyspark.sql.functions as F

    from teleharvest_spark.operators import dedup

    sigs = [0, -1, 1, 2**63 - 1, -2**63, 0x0123456789ABCDEF]
    df = spark.createDataFrame([(s,) for s in sigs], "simhash long")
    for m in (2, 3, 5, 6):
        cols = dedup._block_keys(m)
        got = df.select(
            "simhash", *[k.alias(f"k{c}") for c, (k, _w) in enumerate(cols)]
        ).collect()
        for r in got:
            want = _model_block_keys(r["simhash"] & (1 << 64) - 1, m)
            for c in range(m):
                assert (r[f"k{c}"] & (1 << 64) - 1) == want[c][0], (r["simhash"], m, c)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard with PPJoin prefix + positional filters vs brute
# ---------------------------------------------------------------------------

WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]
DOC = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join)


@PROP
@given(
    docs=st.lists(DOC, min_size=0, max_size=10),
    thr=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_ngram_jaccard_matches_bruteforce(spark, docs, thr):
    """The inverted-index join with prefix, size-ratio AND positional
    filters must return EXACTLY the brute-force shingle-Jaccard ≥ t
    pair set at every threshold — the filters are candidate pruning,
    never answer pruning."""
    from teleharvest_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)] or [(0, "x")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, k=3, threshold=thr).collect()
    }

    def sh(text):
        ws = [w for w in text.lower().split() if w]
        if len(ws) >= 3:
            return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        return {" ".join(ws)}

    want = {}
    items = list(enumerate(docs)) or [(0, "x")]
    for i, (ia, ta) in enumerate(items):
        for ib, tb in items[i + 1 :]:
            a, b = sh(ta), sh(tb)
            inter = len(a & b)
            j = inter / (len(a) + len(b) - inter)
            if round(j, 6) >= thr:
                want[(ia, ib)] = round(j, 6)
    assert got == want


# ---------------------------------------------------------------------------
# Drift KS/PSI vectorized kernel vs naive per-bucket recomputation
# ---------------------------------------------------------------------------

HISTPAIR = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),   # bucket
        st.integers(min_value=0, max_value=50),  # cnt
        st.integers(min_value=0, max_value=50),  # base_cnt
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)


@PROP
@given(rows=HISTPAIR)
def test_drift_metrics_match_naive(spark, rows):
    """The Arrow KS/PSI kernel must agree with a naive loop over the
    same aligned buckets (clipping and normalization included)."""
    import math

    from teleharvest_spark.operators import drift as drift_ops

    hist = spark.createDataFrame(
        [("s", b, c) for b, c, _ in rows], "source string, bucket int, cnt long"
    )
    base = spark.createDataFrame(
        [(b, bc) for b, _, bc in rows], "bucket int, cnt long"
    )
    got = drift_ops.drift_metrics(hist, base).collect()[0]

    rows = sorted(rows)  # KS cumsums run in bucket order
    cnts = [c for _, c, _ in rows]
    bases = [bc for _, _, bc in rows]
    n, m = sum(cnts), sum(bases)
    if n == 0 or m == 0:
        # spec: an empty side is fully drifted (kernel returns 1.0/inf)
        assert got["ks"] == 1.0 and math.isinf(got["psi"])
        return
    p = [c / n for c in cnts]
    q = [bc / m for bc in bases]
    cp = cq = 0.0
    ks = 0.0
    for pi, qi in zip(p, q):
        cp += pi
        cq += qi
        ks = max(ks, abs(cp - cq))
    ks = min(1.0, ks)
    eps = drift_ops._PSI_EPS
    psi = sum(
        (max(pi, eps) - max(qi, eps)) * math.log(max(pi, eps) / max(qi, eps))
        for pi, qi in zip(p, q)
    )
    assert abs(got["ks"] - ks) < 1e-9
    assert abs(got["psi"] - psi) < 1e-9


# ---------------------------------------------------------------------------
# Hash split — engine-portable model (md5 carve) and invariants
# ---------------------------------------------------------------------------

@PROP
@given(
    keys=st.lists(
        st.one_of(st.none(), st.text(alphabet="abc123", min_size=0, max_size=6)),
        min_size=0,
        max_size=15,
    ),
    fracs=st.sampled_from([(0.8, 0.1), (0.5, 0.25), (0.98, 0.01)]),
)
def test_split_assign_matches_md5_model(spark, keys, fracs):
    """split_assign must equal the pure-Python md5 carve for every key
    (content-defined: any engine that can md5 a string reproduces the
    split), with NULL keys getting NULL split."""
    import hashlib

    from teleharvest_spark.operators import sampling

    train, val = fracs
    df = spark.createDataFrame([(k,) for k in keys] or [("x",)], "doc_id string")
    got = {
        (r["doc_id"], r["split"])
        for r in sampling.split_assign(df, train=train, val=val).collect()
    }

    t_hi = int(train * 65536)
    v_hi = t_hi + int(val * 65536)

    def model(k):
        if k is None:
            return None
        b = int(hashlib.md5(k.encode()).hexdigest()[:4], 16)
        return "train" if b < t_hi else ("val" if b < v_hi else "test")

    want = {(k, model(k)) for k in (keys or ["x"])}
    assert got == want


# --- semdedup: kept set is a greedy maximal tau-independent set ------

VEC = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=4, max_size=4,
)
EMB_ROWS = st.lists(VEC, min_size=1, max_size=12)


@PROP
@given(vecs=EMB_ROWS, tau=st.sampled_from([0.5, 0.9, 0.99]))
def test_semdedup_property_invariants(spark, vecs, tau):
    """For random vectors and taus: one verdict per row; within every
    cell no two kept rows at cosine >= tau; every dropped row shadowed
    by a kept row in its cell (the maximal-independent-set contract)."""
    import numpy as np

    from teleharvest_spark.operators.semdedup import semdedup

    rows = []
    unit = {}
    for i, v in enumerate(vecs):
        a = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(a)
        if n < 1e-9:
            a = np.array([1.0, 0, 0, 0]); n = 1.0
        rows.append((i, [float(x) for x in a], 0))
        unit[i] = a / n
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = semdedup(df, dim=4, tau=tau, n_cells=2, sample_size=16).collect()
    assert len(got) == len(rows)
    assert len({r["vec_id"] for r in got}) == len(rows)
    by_cell: dict[int, list] = {}
    for r in got:
        by_cell.setdefault(r["cell"], []).append(r)
    eps = 1e-9  # float32 round-trip slack on exact-tau boundaries
    for members in by_cell.values():
        kept = [m for m in members if m["kept"]]
        for i, a in enumerate(kept):
            for b in kept[i + 1:]:
                assert float(unit[a["vec_id"]] @ unit[b["vec_id"]]) < tau + eps
        for d in members:
            if not d["kept"]:
                assert any(
                    float(unit[d["vec_id"]] @ unit[k["vec_id"]]) >= tau - eps
                    for k in kept
                )


# ------------------------------------------------- slice lattice props

SLICE_ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["s0", "s1", "s2"])),
        st.integers(min_value=0, max_value=2),
        st.booleans(),
    ),
    min_size=1,
    max_size=40,
)


@PROP
@given(rows=SLICE_ROWS)
def test_slice_lattice_counts_match_bruteforce(spark, rows):
    """Every slice's (n, violations) equals the brute-force count over
    the raw rows, the global rate is exact, and a pair slice never
    exceeds either parent's support — for arbitrary NULL/dup shapes."""
    from teleharvest_spark.operators import slices as sl

    df = spark.createDataFrame(rows, "source string, band int, fail boolean")
    pdf = sl.violation_slices(
        df, ["source", "band"], fail="fail", min_support=1, top_k=None
    )
    tot_n = len(rows)
    tot_v = sum(1 for r in rows if r[2])

    def atom_match(atom, r):
        col, _, val = atom.partition("=")
        actual = r[0] if col == "source" else r[1]
        want = None if val == "∅" else (val if col == "source" else int(val))
        return actual == want

    got = {r["slice"]: (r["n"], r["violations"], r["global_rate"]) for _, r in pdf.iterrows()}
    for s, (n, v, g) in got.items():
        atoms = s.split(" & ")
        members = [r for r in rows if all(atom_match(a, r) for a in atoms)]
        assert n == len(members), s
        assert v == sum(1 for r in members if r[2]), s
        assert abs(g - tot_v / tot_n) < 1e-12
    # pair support bounded by parents (when the parent survived)
    for s, (n, _, _) in got.items():
        if " & " in s:
            for a in s.split(" & "):
                if a in got:
                    assert n <= got[a][0]


@PROP
@given(rows=SLICE_ROWS)
def test_slice_transitions_partition_the_lattice(spark, rows):
    """Self-comparison: every slice is a *->same transition, zero
    deltas. Against an empty previous run: every slice classifies
    absent->{hot,quiet} and the prev-side fields are null."""
    from teleharvest_spark.operators import slices as sl

    df = spark.createDataFrame(rows, "source string, band int, fail boolean")
    cur = sl.violation_slices(
        df, ["source", "band"], fail="fail", min_support=1, top_k=None
    )
    t = sl.slice_transitions(cur, cur)
    assert len(t) == len(cur)
    assert all(
        tr in ("hot->hot", "quiet->quiet") for tr in t["transition"]
    )
    assert (t["rate_delta"].abs() < 1e-12).all()
    empty = cur.iloc[0:0]
    t0 = sl.slice_transitions(cur, empty)
    assert len(t0) == len(cur)
    assert all(tr in ("absent->hot", "absent->quiet") for tr in t0["transition"])
    assert t0["rate_prev"].isna().all() and t0["rate_delta"].isna().all()


# --------------------------------------------------- z-order props

ZVALS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
    ),
    min_size=1,
    max_size=30,
)


@PROP
@given(rows=ZVALS)
def test_zorder_frame_matches_interleave_model(spark, rows):
    """Every row's z-value equals an independent numpy model of the
    whole pipeline — dedup'd quantile splits → searchsorted bucket
    rank (NULL → 0) → bit interleave — for arbitrary NULL/negative/
    duplicate shapes. Totality, range, content-purity, and per-column
    rank monotonicity all follow from model equality."""
    import numpy as np

    from teleharvest_spark.sources import layout as ly

    df = spark.createDataFrame(rows, "x int, y int")
    bits = 4
    zf, bnds = ly.zorder_frame(df, ["x", "y"], bits=bits)
    got = zf.select("x", "y", ly.ZVAL_COL).collect()
    assert len(got) == len(rows)

    def rank(col, v):
        uniq = []
        for b in bnds[col]:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        if v is None or not uniq:
            return 0
        return int(np.searchsorted(np.array(uniq), v, side="right"))

    def model_z(x, y):
        rx, ry = rank("x", x), rank("y", y)
        z = 0
        for i in range(bits):
            z |= ((rx >> i) & 1) << (2 * i)
            z |= ((ry >> i) & 1) << (2 * i + 1)
        return z

    for r in got:
        assert r[ly.ZVAL_COL] == model_z(r["x"], r["y"]), (r, bnds)
