"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall time over the headline set; per-query seconds in
``queries``. Also reports validated sequences/sec for the synthetic
check-suite run (the north-star metric) under "seq_per_sec".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from teleharvest_spark import datagen


def _busy_jiffies() -> tuple[int, int]:
    """(total_host_busy, our_subtree) jiffies — same accounting as
    scripts/scaling_paired.py: host busy = everything but idle+iowait;
    ours = utime+stime of every process whose ancestry reaches this
    driver (the JVM and its Python UDF workers are our children)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:11]]
    total = sum(vals) - vals[3] - vals[4]
    me = os.getpid()
    procs: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        rest = s[s.rindex(")") + 2:].split()
        procs[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
    ours = 0
    for pid, (_, jiff) in procs.items():
        cur = pid
        seen: set[int] = set()
        while cur > 1 and cur not in seen:
            if cur == me:
                ours += jiff
                break
            seen.add(cur)
            cur = procs.get(cur, (0, 0))[0]
    return total, ours


class _ExtLoad:
    """Mean external (non-ours) cores busy over a timed window — the
    per-sample contamination telemetry the scaling protocol already
    records, attached to every suite sample so a loaded median is
    visibly loaded in the BENCH record."""

    def __enter__(self):
        self._t0 = time.monotonic()
        self._b0, self._o0 = _busy_jiffies()
        return self

    def __exit__(self, *exc):
        wall = max(time.monotonic() - self._t0, 1e-9)
        b1, o1 = _busy_jiffies()
        hz = os.sysconf("SC_CLK_TCK")
        self.cores = round(((b1 - self._b0) - (o1 - self._o0)) / hz / wall, 2)
from teleharvest_spark.config import CheckSuite
from teleharvest_spark.plans import suite as suite_plan
from teleharvest_spark.session import get_spark

HEADLINE = [
    "stats_profile",
    "cascade_documents",
    "uniqueness",
    "referential_anti",
    "pricing_summary",
    "sessionize",
    "similarity_max",
    "ann_topk",
    "ngram_jaccard",
    "minhash_pairs",
    "drift_ntok",
    "merge_upsert",
    "window_tumbling",
    "multimodal_meta",
    "fingerprint_dups",
    "ann_ivf_topk",
    "simhash_pairs",
    "metrics_refresh",
    "engagement_rate",
    "dup_clusters",
    "pack_sequences",
    "split_assign",
    "top_terms",
    # round-4 operators (headline total therefore grows vs r3 by the
    # cost of these two lines — per-query timings stay comparable; the
    # dedup_incremental invariant query is excluded on purpose: its
    # wall time is 1x incremental + 1x full recompute + the compare,
    # which benchmarks the GATE, not the operator — the operator's
    # cost lives in the "incremental_dedup" section)
    "contamination",
    "token_jaccard",
    "substring_spans",
]

SUITE_ROWS = int(os.environ.get("SPARK_GRAFT_SUITE_ROWS", "2000000"))

# sf1 section (VERDICT r2 item 9): one notch up — documents/embeddings
# replicated 10x from sf0.1 (~50k docs / 20k vectors) for the most
# expensive headline queries, and the check suite at 10x rows (20M).
# Larger inputs shrink the host-noise relative error and would expose
# any superlinear term. Opt out with SPARK_GRAFT_SF1=0.
SF1_ENABLED = os.environ.get("SPARK_GRAFT_SF1", "1") == "1"
SF1_DIR = "/tmp/sf1_scaled"
# VERDICT r3 item 8: the sf1 section times the FULL headline set (not
# just the 5 most expensive queries) so a superlinear term in a cheap
# query can't hide behind the big ones.
SF1_QUERIES = list(HEADLINE)
SF1_SUITE_ROWS = int(os.environ.get("SPARK_GRAFT_SF1_SUITE_ROWS", "20000000"))
EVENTLOG_DIR = "/tmp/bench_eventlog"


def build_sf1(spark, base_dir: str) -> None:
    """Deterministic 10x replication of the sf0.1 document/embedding
    tables. Copy i SUFFIXES every whitespace-run token with ``_q{i}``
    (regexp_replace ``(\\S+)`` → ``$1_q{i}``): the within-copy near-dup
    structure (shingle Jaccard, simhash bit votes) is exactly
    preserved, while copies share zero shingles/word-features with each
    other — so the TRUE pair count scales ~10x, and the sf1 timings
    measure candidate-generation scaling, not a quadratic explosion of
    genuine cross-copy duplicates (the first fixture draft used a
    1-word suffix and 98% of its 5.5M simhash pairs were copy-of-copy
    self-matches). n_chars is bumped by a flat +3 — intentionally
    approximate (one token's worth); nothing downstream derives it
    from the rewritten text."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    if os.path.isdir(f"{SF1_DIR}/documents.parquet") and os.path.isdir(
        f"{SF1_DIR}/events.parquet"  # full-headline fixture (r4) complete
    ):
        # Existence is not enough: a stale fixture built from a SMALLER
        # base (e.g. an sf0.01 run) would silently masquerade as sf1
        # and every "10x" timing would measure the wrong size (caught
        # in round 5: a 5k-doc replica survived in /tmp). Accept only
        # an exactly 10x-the-current-base fixture.
        try:
            stored = spark.read.parquet(f"{SF1_DIR}/documents.parquet").count()
        except Exception:
            stored = -1
        if stored == 10 * docs.count():
            return
        import shutil as _sh

        print(
            f"# build_sf1: stale fixture ({stored} docs, want "
            f"{10 * docs.count()}) — rebuilding", file=sys.stderr,
        )
        _sh.rmtree(SF1_DIR, ignore_errors=True)
    copies = []
    for i in range(10):
        # bijective per-token rename (every \S+ run gets a copy tag):
        # word multiset structure, counts, and within-copy shingle
        # relations are EXACTLY the original's, so each copy carries the
        # original corpus's dup structure under fresh token hashes
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.regexp_replace(
                    F.coalesce(F.col("text"), F.lit("")), r"(\S+)", f"$1_q{i}"
                ).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + 3).alias("n_chars"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(f"{SF1_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    ecopies = []
    for i in range(10):
        ecopies.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                # rotate one coordinate per copy so replicas aren't exact
                F.transform(
                    "embedding", lambda x, j: x + F.when(j == i % 64, F.lit(0.01 * i)).otherwise(F.lit(0.0))
                ).alias("embedding"),
                "label",
            )
        )
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionByName(c)
    eout.repartition(16).write.mode("overwrite").parquet(f"{SF1_DIR}/embeddings.parquet")

    # the remaining headline fact tables, replicated 10x with id-bump:
    # per-copy key offsets keep every within-copy key relation (dup
    # groups, per-user sessions, per-order lines) EXACTLY the
    # original's while copies never collide — the same fixture
    # principle as the document token rename above. Aggregation
    # columns (ts, value, flags) are untouched: time-windowed queries
    # legitimately see 10x rows per window, keyed queries see 10x
    # groups.
    bumps = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "events": ["event_id", "user_id"],
    }
    for table, keys in bumps.items():
        src = spark.read.parquet(f"{base_dir}/{table}.parquet")
        tcopies = []
        for i in range(10):
            c = src
            for kcol in keys:
                c = c.withColumn(kcol, F.col(kcol) + F.lit(i * 10_000_000))
            tcopies.append(c)
        tout = tcopies[0]
        for c in tcopies[1:]:
            tout = tout.unionByName(c)
        tout.repartition(32).write.mode("overwrite").parquet(
            f"{SF1_DIR}/{table}.parquet"
        )


def sf1_section(spark, base_dir: str, qs) -> dict:
    """Per-query seconds at the 10x scale (1 untimed warm + best of 2)
    plus the 20M-row check suite (1 warm + best of 2 timed)."""
    build_sf1(spark, base_dir)
    out: dict = {}
    for name in SF1_QUERIES:
        qs[name](spark, SF1_DIR).count()
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = qs[name](spark, SF1_DIR).count()
            samples.append(time.perf_counter() - t0)
        out[name] = round(sorted(samples)[0], 3)
        print(f"# sf1 {name}: {n} rows in {out[name]}s", file=sys.stderr)
    check = CheckSuite(
        banned_tokens=datagen.BANNED_IDS, allowed_sources=tuple(datagen.SOURCES)
    )
    seq_path = f"{SF1_DIR}/sequences_{SF1_SUITE_ROWS}.parquet"
    if not os.path.isdir(seq_path):
        datagen.generate_sequences(spark, SF1_SUITE_ROWS, check).write.mode(
            "overwrite"
        ).parquet(seq_path)
    stored = spark.read.parquet(seq_path)
    warm = suite_plan.run_suite(stored, check, drift_vs_global=True)
    warm.materialize()
    warm.cleanup()
    # best-of-2 timed: a single 6-minute sample on this shared host can
    # record a neighbor-load spike as the round's 20M-row number
    # (observed: 368s contaminated vs 81s quiet in a fresh JVM);
    # external load only ever adds time, so min is the engine estimate
    ssamples = []
    sext = []
    for _ in range(2):
        with _ExtLoad() as el:
            t0 = time.perf_counter()
            res = suite_plan.run_suite(stored, check, drift_vs_global=True)
            res.materialize()
            ssamples.append(time.perf_counter() - t0)
            res.cleanup()
        sext.append(el.cores)
    suite_sec = round(min(ssamples), 3)
    out["check_suite_full"] = suite_sec
    out["check_suite_samples"] = [round(x, 1) for x in ssamples]
    out["check_suite_ext_cores"] = sext
    out["suite_rows"] = SF1_SUITE_ROWS
    out["seq_per_sec"] = round(SF1_SUITE_ROWS / suite_sec, 1)
    print(
        f"# sf1 suite: {SF1_SUITE_ROWS} rows in {suite_sec}s = {out['seq_per_sec']} seq/s",
        file=sys.stderr,
    )
    return out


def approx_recall(spark, sf_dir: str, qs) -> dict[str, float]:
    """Recall of every approximate operator vs its exact verifier, so
    approximate-op quality is tracked round-over-round (not just pinned
    once in pytest).

    * ann_lsh_topk / ann_ivf_topk vs ann_topk (brute force): mean
      recall@5 over the probe set.
    * minhash_pairs (LSH candidates ≥ t) vs ngram_jaccard (exact pairs
      ≥ t): pair-set recall.
    """
    out: dict[str, float] = {}
    exact = qs["ann_topk"](spark, sf_dir).toPandas()
    ex_sets = exact.groupby("probe_id")["neighbor_id"].apply(set).to_dict()
    n_exact = sum(len(s) for s in ex_sets.values())
    for name in ("ann_lsh_topk", "ann_ivf_topk"):
        ap = qs[name](spark, sf_dir).toPandas()
        ap_sets = ap.groupby("probe_id")["neighbor_id"].apply(set).to_dict()
        hit = sum(
            len(ex_sets[p] & ap_sets.get(p, set())) for p in ex_sets
        )
        out[f"{name}_recall@5"] = round(hit / n_exact, 4) if n_exact else 1.0

    exact_pairs = {
        (r.id_a, r.id_b) for r in qs["ngram_jaccard"](spark, sf_dir).toPandas().itertuples()
    }
    mh_pairs = {
        (r.id_a, r.id_b) for r in qs["minhash_pairs"](spark, sf_dir).toPandas().itertuples()
    }
    out["minhash_pair_recall"] = (
        round(len(exact_pairs & mh_pairs) / len(exact_pairs), 4) if exact_pairs else 1.0
    )

    # cost denominator for the ANN recall lines: measured mean corpus
    # fraction scanned per probe at the headline operating points
    from pyspark.sql import functions as F

    from teleharvest_spark.operators import similarity as sim_ops
    import __spark_entry__ as entry

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 20)
    out["ann_ivf_scan_frac"] = round(
        sim_ops.ivf_scan_fraction(probes, emb, dim=64, **entry.ANN_IVF_PARAMS), 4
    )
    out["ann_lsh_scan_frac"] = round(
        sim_ops.lsh_scan_fraction(probes, emb, dim=64, **entry.ANN_LSH_PARAMS), 4
    )

    # serving shape: stored IVF index (train+assign paid once at build)
    # vs the inline path that re-trains and re-assigns per call — the
    # query wall is what a repeated-probe-batch consumer actually pays.
    # At bench scale the fixed overhead (store read, meta, extra probe
    # pass) can exceed the skipped corpus assignment — the payoff term
    # is the corpus-sized assignment the query never runs (it lives in
    # ivf_index_build_sec and grows with |corpus|; the query cost is
    # bounded by the probed cells), the incremental_dedup protocol
    import shutil
    import tempfile

    ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        p = entry.ANN_IVF_PARAMS
        t0 = time.perf_counter()
        sim_ops.build_ivf_index(
            emb, ivf_dir, dim=64, n_cells=p["n_cells"], spill_eps=p["spill_eps"]
        )
        out["ivf_index_build_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        sim_ops.query_ivf_index(probes, ivf_dir, k=5, n_probe=p["n_probe"]).count()
        out["ivf_index_query_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        sim_ops.ivf_topk(probes, emb, dim=64, k=5, **p).count()
        out["ivf_inline_sec"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)
    return out


def pack_shard_bench(spark) -> dict:
    """Hot-group packing speedup (VERDICT r2 item 7): one source holds
    90% of 1M rows. Unsharded, the greedy fold of that group runs in a
    single task; (source, hash-bucket) sharding spreads it across 64
    executor-parallel folds at the cost of <1 pack of padding per
    shard."""
    from pyspark.sql import functions as F

    from teleharvest_spark.operators import packing

    df = (
        spark.range(1_000_000)
        .select(
            F.format_string("d%09d", F.col("id")).alias("doc_id"),
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 7).cast("string")))
            .alias("source"),
            (F.col("id") % 900 + 10).cast("int").alias("n_tok"),
        )
        .withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(64)).cast("int"))
    )
    df = df.persist()
    df.count()
    out = {}
    for label, kw in (("unsharded", {}), ("sharded", {"shard_col": "bucket"})):
        packing.pack_sequences(df, capacity=2048, **kw).count()  # warm
        t0 = time.perf_counter()
        packing.pack_sequences(df, capacity=2048, **kw).count()
        out[f"{label}_sec"] = round(time.perf_counter() - t0, 3)
    df.unpersist()
    out["speedup"] = round(out["unsharded_sec"] / max(out["sharded_sec"], 1e-9), 2)
    print(f"# pack_shard: {out}", file=sys.stderr)
    return out


def memory_telemetry(spark) -> dict:
    """Peak/current RSS of the JVM (executors live in it on local[N])
    and peak RSS of the Python driver — the 'no superlinear memory
    term' evidence next to the sf1 wall times (VERDICT r3 item 8)."""

    def vm(field: str, pid: int) -> int | None:
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith(field):
                        return int(line.split()[1]) // 1024  # kB → MB
        except OSError:
            return None
        return None

    jvm_pid = int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())
    return {
        "jvm_peak_rss_mb": vm("VmHWM", jvm_pid),
        "jvm_rss_mb": vm("VmRSS", jvm_pid),
        "driver_py_peak_rss_mb": vm("VmHWM", os.getpid()),
    }


def _prep_bench(
    spark, docs: str, out: str, run_prefix: str, batch_offset: int,
    label: str,
) -> dict:
    """Shared body for the prep-pipeline sections: full prep_corpus
    build with per-stage walls, then one prep_batch ingest of a
    10%-sized re-ingest batch (every doc a near-dup of the corpus
    under fresh ids) against the warehouse the base run just built —
    the incremental-vs-rebuild story at the PIPELINE level: the batch
    path should cost a small fraction of the base build because it
    touches the corpus only through the pre-bucketed index join."""
    import shutil

    from pyspark.sql import functions as F

    from teleharvest_spark import pipeline

    shutil.rmtree(out, ignore_errors=True)
    n_docs = spark.read.parquet(docs).count()
    with _ExtLoad() as el:
        t0 = time.perf_counter()
        rep = pipeline.prep_corpus(spark, docs, out, run_id=run_prefix)
        full_sec = time.perf_counter() - t0

    batch_dir = f"{out}_batch.parquet"
    spark.read.parquet(docs).where("doc_id % 10 = 0").withColumn(
        "doc_id", F.col("doc_id") + F.lit(batch_offset)
    ).write.mode("overwrite").parquet(batch_dir)
    n_batch = spark.read.parquet(batch_dir).count()
    with _ExtLoad() as el2:
        t1 = time.perf_counter()
        brep = pipeline.prep_batch(
            spark, batch_dir, out, run_id=f"{run_prefix}_b"
        )
        batch_sec = time.perf_counter() - t1
    out_d = {
        "docs": n_docs,
        "full_sec": round(full_sec, 3),
        "docs_per_sec": round(n_docs / full_sec, 1),
        "full_ext_cores": el.cores,
        "stage_walls": {
            k: v.get("wall_sec") for k, v in rep["stages"].items()
        },
        "kept": rep["stages"]["dedup"]["kept"],
        "quality_failed": rep["stages"]["quality"]["failed"],
        "batch_docs": n_batch,
        "batch_sec": round(batch_sec, 3),
        "batch_ext_cores": el2.cores,
        "batch_kept": brep["kept"],
        "batch_dropped_dups": brep["dropped_dups"],
    }
    print(f"# {label}: {out_d}", file=sys.stderr)
    return out_d


def prep_pipeline_bench(spark, sf_dir: str) -> dict:
    """Corpus-prep composition (quality gate → MinHash dedup +
    components → tokenize → leakage-safe split → pack) over the sf
    documents table — see :func:`_prep_bench`."""
    return _prep_bench(
        spark, os.path.join(sf_dir, "documents.parquet"),
        "/tmp/bench_prep_wh", "bench", 10_000_000, "prep_pipeline",
    )


def prep_sf1_bench(spark, base_dir: str) -> dict:
    """The same composition at the 10x documents fixture (VERDICT r4
    item 6): per-stage walls + batch-vs-rebuild at the larger scale,
    so prep linearity is measured, not assumed. The documents tables
    are small relative to the sequences fact (5k docs at sf0.1 → 50k
    here) — the scaling EVIDENCE is the walls ratio between the two
    sections at 10x the rows."""
    build_sf1(spark, base_dir)
    return _prep_bench(
        spark, f"{SF1_DIR}/documents.parquet",
        "/tmp/bench_prep_sf1_wh", "bench_sf1", 200_000_000, "prep_sf1",
    )


def spill_telemetry() -> dict:
    """Total task spill over the whole bench run, parsed from the Spark
    event log (works with spark.ui disabled; .inprogress files are the
    live run)."""
    import glob

    mem = disk = 0
    for path in glob.glob(f"{EVENTLOG_DIR}/*"):
        try:
            with open(path) as f:
                for line in f:
                    if '"Memory Bytes Spilled"' not in line:
                        continue
                    try:
                        ev = json.loads(line)
                    except ValueError:
                        continue
                    tm = ev.get("Task Metrics") or {}
                    mem += tm.get("Memory Bytes Spilled", 0)
                    disk += tm.get("Disk Bytes Spilled", 0)
        except OSError:
            continue
    return {
        "memory_bytes_spilled_mb": mem // 2**20,
        "disk_bytes_spilled_mb": disk // 2**20,
    }


def incremental_dedup_bench(spark, sf_dir: str) -> dict:
    """The cross-snapshot dedup payoff, measured three ways:

    * ``full_recompute_sec`` vs ``batch_vs_index_sec`` — dedup a 10%
      batch against a pre-built corpus index (batch-only minhash +
      bucket equi-join) vs recomputing the full corpus. At THIS scale
      (5k docs) both walls are dominated by fixed per-job overhead, so
      the ratio hovers near 1 and swings with host load — it is NOT
      the scale story.
    * ``corpus_sig_skipped_sec`` — the corpus-side signature compute
      the incremental path never runs (text scan + Arrow splitmix64
      kernel + banding). This is the term that grows with |corpus|
      (100 TB: the whole point), measured directly.
    * ``batch_vs_index_10x_sec`` (sf1 fixture present) — the SAME-
      SIZED batch with the SAME true-dup structure (sf1 copy 0 is a
      bijective per-token rename of the base corpus) joined against a
      10x-document index: batch cost must stay near-flat while the
      skipped corpus-side work scales 10x.
    """
    import shutil

    from pyspark.sql import functions as F

    from teleharvest_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_batch = F.coalesce(F.pmod(F.col("doc_id"), F.lit(10)) == 0, F.lit(False))
    corpus, batch = docs.where(~is_batch), docs.where(is_batch)
    idx = "/tmp/bench_dedup_index"
    shutil.rmtree(idx, ignore_errors=True)
    dedup.write_dedup_index(corpus, idx, k=3)
    sigs, buckets = dedup.read_dedup_index(spark, idx)

    out = {}

    def best2(fn):
        fn()  # warm
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3)

    out["full_recompute_sec"] = best2(
        lambda: dedup.minhash_lsh_pairs(docs, k=3, threshold=0.5).count()
    )
    out["batch_vs_index_sec"] = best2(
        lambda: dedup.incremental_dedup_pairs(
            batch, sigs, buckets, k=3, threshold=0.5
        ).count()
    )
    out["speedup"] = round(
        out["full_recompute_sec"] / max(out["batch_vs_index_sec"], 1e-9), 2
    )
    out["corpus_sig_skipped_sec"] = best2(
        lambda: dedup.minhash_signatures(corpus, k=3).count()
    )

    # Bloom prefilter over the stored index's bucket keys
    # (operators/bloom.py): identical pairs (pinned in tests), batch
    # bucket rows that can't hit the index skip the join. Locally the
    # join is cheap either way — the reported number that matters at
    # scale is bloom_kept_frac: the fraction of probe rows that would
    # reach a 10^12-row index join.
    from teleharvest_spark.operators import bloom as BL

    shutil.rmtree(f"{idx}/bloom", ignore_errors=True)
    BL.write_bloom(
        BL.bloom_build(buckets, ["band", "bucket"], 1 << 24, 5),
        f"{idx}/bloom", 1 << 24, 5, ["band", "bucket"],
    )
    bwords, bmeta = BL.read_bloom(spark, f"{idx}/bloom")
    bwords = bwords.persist()
    bwords.count()
    out["batch_vs_index_bloom_sec"] = best2(
        lambda: dedup.incremental_dedup_pairs(
            batch, sigs, buckets, k=3, threshold=0.5,
            index_bloom=bwords, bloom_meta=bmeta,
        ).count()
    )
    bb = dedup.band_buckets(dedup.minhash_signatures(batch, k=3))
    n_probe = bb.count()
    n_kept = BL.bloom_prefilter(
        bb, bwords, ["band", "bucket"], bmeta["m_bits"], bmeta["k"]
    ).count()
    out["bloom_kept_frac"] = round(n_kept / max(n_probe, 1), 4)
    bwords.unpersist()

    if SF1_ENABLED:
        build_sf1(spark, sf_dir)
        d10 = spark.read.parquet(f"{SF1_DIR}/documents.parquet")
        # copy 0 (doc_id < 10M) is the base corpus under renamed
        # tokens: carve the same 10% batch out of it so batch size AND
        # true-pair structure match the base measurement exactly.
        is_b10 = (F.col("doc_id") < 10_000_000) & is_batch
        corpus10, batch10 = d10.where(~is_b10), d10.where(is_b10)
        idx10 = "/tmp/bench_dedup_index_10x"
        shutil.rmtree(idx10, ignore_errors=True)
        dedup.write_dedup_index(corpus10, idx10, k=3)
        sigs10, buckets10 = dedup.read_dedup_index(spark, idx10)
        out["batch_vs_index_10x_sec"] = best2(
            lambda: dedup.incremental_dedup_pairs(
                batch10, sigs10, buckets10, k=3, threshold=0.5
            ).count()
        )
        out["corpus_10x_docs"] = corpus10.count()

    print(f"# incremental_dedup: {out}", file=sys.stderr)
    return out


def incremental_spans_bench(spark, sf_dir: str) -> dict:
    """Exact-substring dedup, incremental vs full — the span analogue
    of ``incremental_dedup``:

    * ``full_recompute_sec`` — duplicated_ngram_spans over corpus ∪
      batch (every doc fingerprinted).
    * ``batch_vs_index_sec`` — batch_duplicated_spans: the batch alone
      fingerprinted, joined against the corpus's persisted
      repeated-gram dimension (span_index contents; duplication-
      bounded, 8 B/gram).
    * ``corpus_grams_skipped_sec`` — the corpus-side fingerprint +
      count aggregate the batch path never runs; the term that grows
      with |corpus|.
    """
    import shutil

    from pyspark.sql import functions as F

    from teleharvest_spark.functions.text import hash_tokens
    from teleharvest_spark.operators import dedup

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", hash_tokens(F.col("text")).alias("tokens"))
    )
    is_batch = F.coalesce(F.pmod(F.col("doc_id"), F.lit(10)) == 0, F.lit(False))
    corpus, batch = docs.where(~is_batch), docs.where(is_batch)
    gidx = "/tmp/bench_span_index"
    shutil.rmtree(gidx, ignore_errors=True)
    K = 5
    dedup.repeated_grams(corpus, k=K).write.parquet(gidx)
    stored = spark.read.parquet(gidx)

    def best2(fn):
        fn()  # warm
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3)

    out = {"k": K}
    out["full_recompute_sec"] = best2(
        lambda: dedup.duplicated_ngram_spans(docs, k=K).count()
    )
    out["batch_vs_index_sec"] = best2(
        lambda: dedup.batch_duplicated_spans(batch, stored, k=K)[0].count()
    )
    out["speedup"] = round(
        out["full_recompute_sec"] / max(out["batch_vs_index_sec"], 1e-9), 2
    )
    out["corpus_grams_skipped_sec"] = best2(
        lambda: dedup.repeated_grams(corpus, k=K).count()
    )
    print(f"# incremental_spans: {out}", file=sys.stderr)
    return out


def resume_bench(spark, sf_dir: str) -> dict:
    """The manifest/resume story's scale payoff on the north-rule fact
    table: a fully-validated corpus receives ONE new partition.

    * ``full_run_sec`` — no manifest: the whole table re-validates
      (what an engine without checkpointed lineage pays per arrival).
    * ``resume_rescan_sec`` — manifest skip (only the new partition
      runs the suite) but the drift_vs_global baseline re-pools the
      FULL table (corpus_states=False): one O(|table|) scan survives.
    * ``resume_states_sec`` — manifest skip + baseline pooled from the
      stored per-partition stat states (corpus_states=True): every job
      in the run touches only the pending partition. At 10^12 rows
      this is O(|table|) vs O(|delta|) per validation run.
    * ``resume_noop_sec`` — nothing changed: manifest read + anti-join
      only (metadata-sized).

    Local numbers compress the ratios (the pending partition is 1/9 of
    the table and fixed JVM/job overhead sets a floor); the scale
    story is which terms grow with |table| — full: everything; rescan:
    one scan; states: nothing (bitwise-parity of the two baselines is
    pinned in tests/test_states.py).
    """
    import shutil

    from pyspark.sql import functions as F

    from teleharvest_spark import cli

    rows = max(SUITE_ROWS // 2, 60_000)
    check = CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES) + ("src_new",),
    )
    v1, v2 = "/tmp/bench_resume_v1", "/tmp/bench_resume_v2"
    shutil.rmtree(v1, ignore_errors=True)
    shutil.rmtree(v2, ignore_errors=True)
    datagen.generate_sequences(spark, rows, check).write.parquet(v1)
    base = spark.read.parquet(v1)
    # donor is a COLD source (src_00 holds ~50% of rows by design —
    # datagen's skew path; src_07 is the drifted one): the arriving
    # partition should be ~1/14 of the corpus, the incremental shape
    newp = (
        base.where(F.col("source") == datagen.SOURCES[3])
        .withColumn("source", F.lit("src_new"))
        .withColumn("doc_id", F.concat(F.lit("new_"), F.col("doc_id")))
    )
    base.unionByName(newp).write.parquet(v2)
    out = {
        "table_rows": rows,
        "new_partition_rows": newp.count(),
    }

    wh, snap = "/tmp/bench_resume_wh", "/tmp/bench_resume_wh_snap"

    def seed(flag: bool) -> None:
        shutil.rmtree(wh, ignore_errors=True)
        cli.run(spark, v1, wh, check, run_id="r1", corpus_states=flag)
        shutil.rmtree(snap, ignore_errors=True)
        shutil.copytree(wh, snap)

    def restore() -> None:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.copytree(snap, wh)

    def best2(fn, setup) -> float:
        setup()
        fn()  # warm
        samples = []
        for _ in range(2):
            setup()
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3)

    out["full_run_sec"] = best2(
        lambda: cli.run(spark, v2, wh, check, run_id="rf"),
        lambda: shutil.rmtree(wh, ignore_errors=True),
    )
    for name, flag in (("resume_rescan_sec", False), ("resume_states_sec", True)):
        seed(flag)
        out[name] = best2(
            lambda: cli.run(
                spark, v2, wh, check, run_id="r2", resume=True, corpus_states=flag
            ),
            restore,
        )
    # warehouse now holds v2 fully validated (last sample) → no-op skip
    t0 = time.perf_counter()
    rep = cli.run(
        spark, v2, wh, check, run_id="r3", resume=True, corpus_states=True
    )
    out["resume_noop_sec"] = round(time.perf_counter() - t0, 3)
    out["noop_skipped"] = bool(rep.get("skipped"))

    # The two opposing terms, isolated (local walls above conflate
    # them with fixed job overhead): the rescan mode's baseline scan
    # grows with |table|; the states mode replaces it with a
    # maintenance pass that grows with |delta| only.
    from teleharvest_spark.operators import drift as drift_ops
    from teleharvest_spark.plans import states as st

    v2_df = spark.read.parquet(v2)
    out["baseline_rescan_scan_sec"] = best2(
        lambda: (
            drift_ops.ntok_histogram(v2_df)
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .count()
        ),
        lambda: None,
    )
    pend = v2_df.where(F.col("source") == "src_new")
    out["states_maintenance_sec"] = best2(
        lambda: st.write_states(pend, wh, run_id="bench"),
        lambda: None,
    )
    out["speedup_states_vs_full"] = round(
        out["full_run_sec"] / max(out["resume_states_sec"], 1e-9), 2
    )
    out["speedup_states_vs_rescan"] = round(
        out["resume_rescan_sec"] / max(out["resume_states_sec"], 1e-9), 2
    )
    for p in (v1, v2, wh, snap):
        shutil.rmtree(p, ignore_errors=True)
    print(f"# resume: {out}", file=sys.stderr)
    return out


def certify_bench(spark, sf_dir: str) -> dict:
    """Certified-rows emission (--emit-valid): the validated-table
    output downstream consumers read. Measures the full validation run
    with and without the certified write on the same seeded table —
    the delta is the cost of re-materializing the passing rows
    (anti-join against the usually-tiny failing-id set is broadcast;
    the write is one layout shuffle + parquet encode, i.e. I/O-bound
    and linear in |table|, which is the honest floor for emitting a
    certified copy of the corpus)."""
    import shutil

    from teleharvest_spark import cli

    rows = max(SUITE_ROWS // 2, 60_000)
    check = CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES),
    )
    src = "/tmp/bench_certify_src"
    shutil.rmtree(src, ignore_errors=True)
    datagen.generate_sequences(spark, rows, check).write.parquet(src)
    out = {"table_rows": rows}

    def best2(fn) -> float:
        fn()  # warm
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3)

    wh, cert = "/tmp/bench_certify_wh", "/tmp/bench_certify_out"

    def run(emit: bool) -> None:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(cert, ignore_errors=True)
        cli.run(
            spark, src, wh, check, run_id="rb",
            emit_valid=cert if emit else None,
        )

    out["validate_only_sec"] = best2(lambda: run(False))
    out["validate_certify_sec"] = best2(lambda: run(True))
    out["certify_overhead_sec"] = round(
        out["validate_certify_sec"] - out["validate_only_sec"], 3
    )
    n_cert = spark.read.parquet(cert).count()
    out["certified_rows"] = n_cert
    # a non-positive delta means the two walls are within host noise —
    # report null rather than an absurd n/epsilon headline
    out["certified_rows_per_sec"] = (
        round(n_cert / out["certify_overhead_sec"], 1)
        if out["certify_overhead_sec"] > 0
        else None
    )
    for p in (src, wh, cert):
        shutil.rmtree(p, ignore_errors=True)
    print(f"# certify: {out}", file=sys.stderr)
    return out


def corpus_clean_bench(spark, sf_dir: str) -> dict:
    """Session-3 operators over the documents table: C4-style
    cross-document line dedup (hot-line dimension + rebuild) and the
    corpus-trained unigram-LM score pass (train + score = two decode
    scans). Best-of-2 after a warmup, like the other sections."""
    from pyspark.sql import functions as F

    from teleharvest_spark.functions.text import hash_tokens
    from teleharvest_spark.operators import lm
    from teleharvest_spark.operators.dedup import dedup_lines_global

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def best2(fn):
        fn()  # warm
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3)

    out = {"docs": docs.count()}
    out["line_dedup_sec"] = best2(
        lambda: dedup_lines_global(docs).agg(
            F.sum("n_removed_lines")
        ).collect()
    )
    toks = docs.select("doc_id", hash_tokens(F.col("text")).alias("tokens"))
    lm_meta: dict = {}

    def lm_pass():
        model, meta = lm.train_unigram_lm(toks)
        lm.score_unigram_lm(toks, model, meta["unseen_logp"]).agg(
            F.avg("ppl")
        ).collect()
        lm_meta.update(meta)

    out["lm_train_score_sec"] = best2(lm_pass)
    out["lm_vocab"] = lm_meta["vocab_size"]
    print(f"# corpus_clean: {out}", file=sys.stderr)
    return out


def curation_bench(spark, sf_dir: str) -> dict:
    """Session-4 curation operators: semantic dedup over the
    embeddings table (centroid assignment + within-cell greedy cosine
    pruning) and DSIR importance resampling of the documents table
    toward a hash-defined target slice (two fit aggregates + broadcast
    log-ratio scoring + Gumbel top-k). Best-of-2 after a warmup."""
    from pyspark.sql import functions as F

    from teleharvest_spark.operators import dsir
    from teleharvest_spark.operators.semdedup import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def best2(fn):
        fn()  # warm
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3)

    # plant near-duplicates so the timing covers real pruning: every
    # 5th vector gets a jittered twin (deterministic — jitter derives
    # from the vec id), so ~1/6 of the corpus should drop at tau 0.95
    twins = (
        emb.where(F.col("vec_id") % 5 == 0)
        .select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + (F.pmod(F.xxhash64(F.col("vec_id") * 131 + i), F.lit(1000)).cast("double") - 500.0) / 50_000.0,
            ).cast("array<float>").alias("embedding"),
            "label",
        )
    )
    corpus = emb.unionByName(twins).persist()
    out = {"embeddings": corpus.count(), "docs": docs.count()}
    kept_box: dict = {}

    def sem_pass():
        v = semdedup(corpus, dim=64, tau=0.95, n_cells=64)
        kept_box["kept"] = v.where(F.col("kept")).count()

    out["semdedup_sec"] = best2(sem_pass)
    out["semdedup_kept"] = kept_box["kept"]
    out["semdedup_dropped"] = out["embeddings"] - kept_box["kept"]

    # target = a deterministic ~10% hash slice of the corpus (stands in
    # for "the high-quality target set"); raw = the full corpus
    target = docs.where(F.xxhash64("doc_id") % 10 == 0)
    k = max(100, out["docs"] // 20)
    out["dsir_k"] = k

    def dsir_pass():
        dsir.dsir_resample(docs, target, k=k).agg(
            F.count(F.lit(1)), F.avg("log_w")
        ).collect()

    out["dsir_resample_sec"] = best2(dsir_pass)

    # perplexity filter (session-5): train the bigram LM on the ~10%
    # target slice, score the full documents table, bucket per source
    # against one percentile_approx pass — the lm prep stage's hot path
    from teleharvest_spark.functions.text import hash_tokens
    from teleharvest_spark.operators import lm as lm_ops

    toks = docs.select(
        "doc_id", "source", hash_tokens(F.col("text")).alias("tokens")
    )
    t_toks = target.select(
        "doc_id", hash_tokens(F.col("text")).alias("tokens")
    )

    def lm_pass():
        lm_dim, meta = lm_ops.train_unigram_lm(t_toks)
        bi_dim = lm_ops.train_bigram_lm(t_toks)
        scored = toks.join(
            lm_ops.score_bigram_lm(
                toks, lm_dim, bi_dim, meta["unseen_logp"]
            ).select("doc_id", "ppl"),
            "doc_id",
        )
        buckets = lm_ops.ppl_buckets(scored, by="source")
        kept_box["lm_tail"] = buckets.where(
            F.col("ppl_bucket") == "tail"
        ).count()

    out["lm_score_bucket_sec"] = best2(lm_pass)
    out["lm_tail_docs"] = kept_box["lm_tail"]

    # semantic contamination screen (session-10): a 100-row "eval set"
    # of verbatim corpus vectors (vec_id % 40 == 0 ⊂ the twinned % 5
    # slice, so each eval row hits itself at cos 1.0 AND its jittered
    # twin near tau — the exact and paraphrase regimes both exercised)
    # broadcast against the full embeddings table — one matmul per
    # Arrow batch
    ev = (
        emb.where(F.col("vec_id") % 40 == 0)
        .limit(100)
        .select(F.concat(F.lit("ev_"), F.col("vec_id")).alias("eval_id"), "embedding")
    )

    def contam_pass():
        from teleharvest_spark.operators.contamination import semantic_contamination

        kept_box["contam"] = semantic_contamination(
            corpus.withColumnRenamed("vec_id", "doc_id"),
            ev,
            id_col="doc_id",
            tau=0.95,
            dim=64,
        ).count()

    out["semantic_contam_sec"] = best2(contam_pass)
    out["semantic_contam_hits"] = kept_box["contam"]

    # compression-ratio quality family (session-10): the one
    # Python-bound family — zlib ratio over every document text
    from teleharvest_spark.operators.cascade import VERDICT_COL
    from teleharvest_spark.operators.quality import compression_gate

    def comp_pass():
        kept_box["comp_fail"] = (
            compression_gate(docs.select("doc_id", "text"))
            .where(~F.col(VERDICT_COL))
            .count()
        )

    out["compression_gate_sec"] = best2(comp_pass)
    out["compression_failed"] = kept_box["comp_fail"]
    print(f"# curation: {out}", file=sys.stderr)
    return out


def sketch_bench(spark, sf_dir: str) -> dict:
    """Frequent-items sketch (Misra-Gries, session-11) vs the exact
    aggregate over an UNBOUNDED key domain — word-5-shingle xxhash64
    fingerprints of documents.text. The exact top-64 shuffles every
    distinct key (corpus-sized at 10^12 rows); the MG path shuffles
    ≤ partitions × capacity summary rows and still carries deterministic
    bounds. Locally the JVM codegen aggregate can win on wall (the key
    table fits in memory) — the recorded shuffle-volume proxies
    (``exact_distinct_keys`` vs ``mg_summary_rows``) carry the scale
    story; ``top64_overlap`` pins that the sketch agrees with exact at
    the head, and ``err_bound`` is the achieved MG guarantee."""
    from pyspark.sql import functions as F

    from teleharvest_spark.operators import dedup as dedup_ops
    from teleharvest_spark.operators import sketch as sketch_ops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = docs.select(
        F.transform(dedup_ops.shingles("text", 5), lambda s: F.xxhash64(s)).alias(
            "grams"
        )
    ).persist()
    out = {"docs": grams.count()}

    def best2(fn):
        fn()  # warm
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3)

    box: dict = {}

    def exact_pass():
        exploded = grams.select(F.explode("grams").alias("g"))
        agg = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
        box["exact"] = [
            (r["g"], r["c"]) for r in agg.orderBy(F.desc("c"), "g").limit(64).collect()
        ]

    def mg_pass():
        box["mg"] = sketch_ops.heavy_hitters(
            grams, "grams", k=64, capacity=4096, flatten=True
        ).collect()

    out["exact_top64_sec"] = best2(exact_pass)
    out["mg_top64_sec"] = best2(mg_pass)
    exploded = grams.select(F.explode("grams").alias("g"))
    out["exact_distinct_keys"] = exploded.select("g").distinct().count()
    out["mg_summary_rows"] = sketch_ops.mg_summaries(
        grams, "grams", capacity=4096, flatten=True
    ).count()
    out["err_bound"] = int(box["mg"][0]["err_bound"]) if box["mg"] else 0
    exact_keys = {g for g, _ in box["exact"]}
    mg_keys = {r["grams"] for r in box["mg"]}
    out["top64_overlap"] = round(len(exact_keys & mg_keys) / max(len(exact_keys), 1), 4)
    grams.unpersist()
    print(f"# sketch: {out}", file=sys.stderr)
    return out


def reconcile_bench(spark, sf_dir: str) -> dict:
    """Session-12 reconciliation surfaces: full keyed row-diff vs the
    checksum-then-diff composition (operators/reconcile.py), plus the
    FDR drift pass wall.

    The scale story is the restriction: ``targeted`` row-diffs ONLY
    partitions whose order-independent checksums disagree, so its join
    input is the touched slice — at 10^12 rows with one touched
    partition the full diff shuffles the whole table and targeted
    shuffles 1/|partitions| of it. Locally both are seconds; the
    recorded ``diff_rows_full_join`` vs ``diff_rows_targeted_join``
    input sizes carry the story. ``fdr`` is metadata-sized on top of
    one histogram aggregate (|sources| rows through BH)."""
    from pyspark.sql import functions as F

    from teleharvest_spark.operators import drift as drift_ops
    from teleharvest_spark.operators import reconcile as rc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # synthetic "new snapshot": md5-picked ~20% of ONE source
    # partition's rows get a text edit; every other partition matches
    one_src = docs.select("source").where(F.col("source").isNotNull()).first()["source"]
    touched = (F.col("source") == one_src) & (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        ) % 5 == 0
    )
    new = docs.withColumn(
        "text", F.when(touched, F.concat(F.col("text"), F.lit(" edited"))).otherwise(F.col("text"))
    )
    out: dict = {"docs": docs.count(), "touched_source": one_src}

    def best2(fn):
        fn()
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3)

    box: dict = {}

    def full_pass():
        box["full"] = rc.snapshot_diff(
            docs, new, ("doc_id",), method="hash"
        ).count()

    def checksum_pass():
        box["verdicts"] = {
            r["status"]: 1
            for r in rc.reconcile_tables(docs, new, "source").collect()
        }

    def targeted_pass():
        verdicts, diff = rc.targeted_diff(docs, new, "source", ("doc_id",))
        box["targeted"] = diff.count()

    out["full_diff_sec"] = best2(full_pass)
    out["checksum_only_sec"] = best2(checksum_pass)
    out["targeted_diff_sec"] = best2(targeted_pass)
    out["diff_rows"] = box["full"]
    assert box["full"] == box["targeted"], (box["full"], box["targeted"])
    # join-input proxies: rows entering the row-level diff join
    out["diff_rows_full_join"] = out["docs"] * 2
    out["diff_rows_targeted_join"] = (
        docs.where(F.col("source") == one_src).count()
        + new.where(F.col("source") == one_src).count()
    )

    seqs = spark.read.parquet("/tmp/bench_sequences.parquet")

    def fdr_pass():
        hist = drift_ops.ntok_histogram(seqs)
        pooled = hist.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
        box["fdr"] = drift_ops.drift_fdr(hist, pooled, alpha=0.05).count()

    out["drift_fdr_sec"] = best2(fdr_pass)
    out["drift_fdr_sources"] = box["fdr"]
    print(f"# reconcile: {out}", file=sys.stderr)
    return out


def slice_bench(spark) -> dict:
    """Violation hotspot slicing (operators/slices.py) over the 2M-row
    bench fact table: wall for the full pass (cascade flags + the
    two-level slice lattice on (source, 256-token n_tok band)) plus the
    combination-frame size — the proxy for what the cube expansion
    actually multiplies (|combos|, never |rows|). The planted datagen
    violations concentrate in the null/empty/rogue sources, so the
    report must flag at least one slice."""
    from teleharvest_spark.operators import cascade as cascade_ops
    from teleharvest_spark.operators import slices as slice_ops

    check = CheckSuite(
        banned_tokens=datagen.BANNED_IDS, allowed_sources=tuple(datagen.SOURCES)
    )
    stored = spark.read.parquet("/tmp/bench_sequences.parquet")
    flagged = cascade_ops.apply_cascade(
        stored.withColumn("n_tok_band", slice_ops.bucketized("n_tok", 256)),
        cascade_ops.sequence_checks(check),
    )
    dims = ["source", "n_tok_band"]
    combos = flagged.groupBy(*dims).count().count()
    state: dict = {}

    def run():
        # full lattice (top_k=None): the flagged/scored ratio is the
        # report's discrimination — a capped top-50 is all-hot by
        # construction and reads as 50/50 however selective the floor
        state["pdf"] = slice_ops.violation_slices(
            flagged, dims, min_support=50, top_k=None
        )

    run()  # warm
    samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    pdf = state["pdf"]
    out = {
        "slice_report_sec": round(min(samples), 3),
        "dim_combos": combos,
        "slices_scored": int(len(pdf)),
        "slices_flagged": int(pdf["flagged"].sum()),
        "top_slice": str(pdf.iloc[0]["slice"]) if len(pdf) else None,
    }

    # shared-scan composition (VERDICT r4 item 4): one cli.run doing
    # suite + slices off a single token decode, vs the two-pass shape
    # (validate, then standalone slice_pass re-running the cascade).
    import shutil

    from teleharvest_spark import cli as cli_mod

    wh = "/tmp/bench_slice_wh"
    spec = ("source", "n_tok:256")

    def combined():
        shutil.rmtree(wh, ignore_errors=True)
        cli_mod.run(
            spark, "/tmp/bench_sequences.parquet", wh, check,
            run_id="rb", slice_spec=spec,
        )

    def twopass():
        shutil.rmtree(wh, ignore_errors=True)
        cli_mod.run(spark, "/tmp/bench_sequences.parquet", wh, check, run_id="rb")
        cli_mod.slice_pass(
            spark, "/tmp/bench_sequences.parquet", wh, "rb",
            spec=spec, suite=check,
        )

    for name, fn in (("combined_suite_slices_sec", combined),
                     ("twopass_suite_slices_sec", twopass)):
        fn()  # warm
        ss = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            ss.append(time.perf_counter() - t0)
        out[name] = round(min(ss), 3)
    print(
        f"# slices: combined {out['combined_suite_slices_sec']}s vs "
        f"two-pass {out['twopass_suite_slices_sec']}s",
        file=sys.stderr,
    )
    return out


def zorder_bench(spark, sf_dir: str) -> dict:
    """Z-order layout rewrite (sources/layout.py) over the events
    table's two numeric dims: rewrite wall (one range exchange) vs the
    single-column-sort baseline, and the measured pruning payoff —
    per-column extent scores (1.0 = unprunable; n_files^(-1/m) ideal)
    plus the file-skip fraction for a 1/8 band predicate on EACH dim.
    The story: the x-sorted baseline prunes y at 0.0 — z-order buys
    pruning on BOTH dims for the same single shuffle at write time."""
    from pyspark.sql import functions as F

    from teleharvest_spark.sources import layout as ly

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").persist()
    n = ev.count()
    zdir, sdir = "/tmp/bench_zorder", "/tmp/bench_xsort"

    t0 = time.perf_counter()
    ly.write_zordered(ev, zdir, ["user_id", "value"], bits=8, n_files=32)
    z_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    (
        ev.repartitionByRange(32, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sdir)
    )
    s_sec = time.perf_counter() - t0
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    ev.unpersist()
    bands = {
        "user_id": (stats[0] + (stats[1] - stats[0]) * 0.4,
                    stats[0] + (stats[1] - stats[0]) * 0.525),
        "value": (stats[2] + (stats[3] - stats[2]) * 0.4,
                  stats[2] + (stats[3] - stats[2]) * 0.525),
    }
    return {
        "rows": n,
        "zorder_write_sec": round(z_sec, 3),
        "single_sort_write_sec": round(s_sec, 3),
        "extent_scores_zorder": {
            c: round(v, 4)
            for c, v in ly.extent_scores(zdir, ["user_id", "value"]).items()
        },
        "extent_scores_single_sort": {
            c: round(v, 4)
            for c, v in ly.extent_scores(sdir, ["user_id", "value"]).items()
        },
        "prune_frac_zorder": {
            c: round(ly.prunable_fraction(zdir, c, *b), 4)
            for c, b in bands.items()
        },
        "prune_frac_single_sort": {
            c: round(ly.prunable_fraction(sdir, c, *b), 4)
            for c, b in bands.items()
        },
    }


def fresh_suite_bench(data_path: str, cores: int, rows: int,
                      warm_max: int = 5, timed: int = 5) -> dict | None:
    """Suite throughput measured in a FRESH JVM subprocess.

    The long-lived bench JVM has, by the time the suite section runs,
    JIT-compiled and cached generated code for dozens of unrelated
    queries; that C2 code-cache state depresses the suite's own
    generated code by ~25% (rounds 4-5: in-bench 197k seq/s vs 250k
    in a fresh JVM on the SAME table, same cores, measured-quiet both
    times).  A cluster deployment runs validation in its own job JVMs,
    so the fresh-JVM figure is the representative engine throughput —
    this records it in the round's BENCH file instead of leaving it to
    out-of-band re-measures.  Protocol (adaptive warmup, READY/run
    handshake, stray-stdout guard) is the shared
    teleharvest_spark.benchproto.WarmedChild — the same code
    scripts/scaling_paired.py drives, so the "same protocol"
    comparability claim holds by construction; `timed` runs are driven
    one-by-one from here so each gets its own _ExtLoad window (the
    child JVM is our subprocess, so its CPU counts as "ours"); median
    of `timed` samples.  Returns None on any subprocess failure; the
    caller then falls back to the in-bench figure.
    """
    import statistics

    from teleharvest_spark.benchproto import WarmedChild

    child = None
    try:
        # warmup deadline: JVM start (~20 s) + first-pass JIT (measured
        # 78 s → 27 s at 2M rows); scale generously with row count
        child = WarmedChild(
            cores, data_path, rows, job="suite", warm_max=warm_max,
            warm_deadline=120 + warm_max * max(60, rows // 10_000))
        samples, ext = [], []
        for _ in range(timed):
            with _ExtLoad() as el:
                samples.append(child.run(deadline=60 + max(60, rows // 20_000)))
            ext.append(el.cores)
        child.close()
        ordered = sorted(samples)
        med = statistics.median(samples)
        return {
            "protocol": (f"fresh JVM subprocess, adaptive warmup (consecutive "
                         f"walls within 15%, max {warm_max} passes) + {timed} "
                         "timed runs, median; per-run ext_cores telemetry"),
            "rows": rows,
            "cores": cores,
            "samples_sec": [round(s, 2) for s in samples],
            "ext_cores": ext,
            "median_sec": round(med, 3),
            "seq_per_sec": round(rows / med, 1),
            "seq_per_sec_best": round(rows / ordered[0], 1),
        }
    except Exception as e:  # noqa: BLE001 — telemetry, never fatal to bench
        print(f"# fresh_suite_bench failed ({e!r}); falling back to "
              "in-bench suite figure", file=sys.stderr)
        if child is not None:
            child.kill()  # reaps — no zombie through the long sf1 sections
        return None


def ann_curve_bench(spark, sf_dir: str) -> dict:
    """Measured recall-vs-scan curve for both ANN methods (≥3 points
    each, the VERDICT r4 item-5 evidence) plus the operating point
    plan_ann selects for the headline target (recall ≥0.9 within a 50%
    scan budget). Calibration = the planner's real API on the bench
    fixture — what a deployment runs on a corpus sample before
    provisioning the full job."""
    from pyspark.sql import functions as F

    from teleharvest_spark.operators import similarity as sim_ops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 20)
    t0 = time.perf_counter()
    points = sim_ops.calibrate_ann(probes, emb, dim=64, k=5)
    out = {
        "calibrate_sec": round(time.perf_counter() - t0, 2),
        "points": points,
        "plan_target": {"recall": 0.9, "scan_budget": 0.5},
        "chosen": sim_ops.plan_ann(points, 0.9, scan_budget=0.5),
    }
    print(f"# ann_curve: {len(points)} points, chosen={out['chosen']}", file=sys.stderr)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    import shutil

    shutil.rmtree(EVENTLOG_DIR, ignore_errors=True)  # spill totals = THIS run
    os.makedirs(EVENTLOG_DIR, exist_ok=True)
    spark = get_spark(app_name="teleharvest_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      extra_conf={
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.dir": f"file://{EVENTLOG_DIR}",
                      })

    qs = E.bench_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # One untimed pass first: a fresh JVM spends its first full scan
        # on C2 JIT compilation of the generated code (measured 105s →
        # 8s on the 2M-row suite). Steady state is the right estimator
        # of cluster throughput — warmup amortizes to nothing on a
        # long-running 100 TB job.
        qs[name](spark, sf_dir).count()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()  # materialize the full plan
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    # north-star: validated sequences/sec over the synthetic fact table
    check = CheckSuite(
        banned_tokens=datagen.BANNED_IDS, allowed_sources=tuple(datagen.SOURCES)
    )
    seqs = datagen.generate_sequences(spark, SUITE_ROWS, check)
    seqs.write.mode("overwrite").parquet("/tmp/bench_sequences.parquet")
    stored = spark.read.parquet("/tmp/bench_sequences.parquet")
    # two untimed warmup passes (C2 JIT keeps tiering through the
    # second pass — measured 78s → 27s → 11s), then MEDIAN of three
    # timed runs: the shared host swings 2-6x under neighbor load, and
    # a single sample can record a loaded run as the round's
    # throughput; drift included — the north-star metric covers the
    # FULL suite
    for _ in range(2):
        warm = suite_plan.run_suite(stored, check, drift_vs_global=True)
        warm.materialize()
        warm.cleanup()
    samples = []
    ext_cores = []
    n_viol = n_verd = 0
    for _ in range(3):
        with _ExtLoad() as el:
            t0 = time.perf_counter()
            res = suite_plan.run_suite(stored, check, drift_vs_global=True)
            n_viol, n_verd = res.materialize()
            samples.append(time.perf_counter() - t0)
            res.cleanup()
        ext_cores.append(el.cores)
    raw_samples = [round(s, 2) for s in samples]  # run order, pairs with ext_cores
    samples.sort()
    suite_sec = round(samples[1], 3)  # median of 3
    timings["check_suite_full"] = suite_sec
    seq_per_sec = round(SUITE_ROWS / suite_sec, 1)
    # external load only ever ADDS time, so the min sample is the least
    # contaminated engine-cost estimate on this shared host; the median
    # stays the headline for round-over-round comparability
    seq_per_sec_best = round(SUITE_ROWS / samples[0], 1)
    print(
        f"# check_suite_full: {SUITE_ROWS} rows, {n_viol} violations, "
        f"{n_verd} partitions; samples {[round(s, 2) for s in samples]}s "
        f"→ median {suite_sec}s = {seq_per_sec} seq/s",
        file=sys.stderr,
    )

    # representative suite throughput: fresh JVM, same table, same cores
    # (the in-bench figure above stays as check_suite_full / the
    # *_inbench keys for round-over-round comparability)
    fresh = None
    fresh_mode = os.environ.get("SPARK_GRAFT_FRESH_SUITE", "1")
    # below 1M rows the fresh figure is never the headline (C2 effect
    # < host noise there), so don't pay the child JVM on smoke runs
    # unless explicitly forced
    if fresh_mode == "force" or (fresh_mode != "0" and SUITE_ROWS >= 1_000_000):
        fresh = fresh_suite_bench("/tmp/bench_sequences.parquet",
                                  int(cpus), SUITE_ROWS)
        if fresh:
            print(f"# suite_fresh: {fresh['samples_sec']}s ext={fresh['ext_cores']} "
                  f"→ median {fresh['median_sec']}s = {fresh['seq_per_sec']} seq/s",
                  file=sys.stderr)

    recall = approx_recall(spark, sf_dir, qs)
    print(f"# recall: {recall}", file=sys.stderr)

    pack_shard = pack_shard_bench(spark)
    inc_dedup = incremental_dedup_bench(spark, sf_dir)
    inc_spans = incremental_spans_bench(spark, sf_dir)
    ann_curve = ann_curve_bench(spark, sf_dir)
    prep = prep_pipeline_bench(spark, sf_dir)
    corpus_clean = corpus_clean_bench(spark, sf_dir)
    curation = curation_bench(spark, sf_dir)
    resume = resume_bench(spark, sf_dir)
    certify = certify_bench(spark, sf_dir)
    sketch = sketch_bench(spark, sf_dir)
    reconcile = reconcile_bench(spark, sf_dir)
    slices = slice_bench(spark)
    zorder = zorder_bench(spark, sf_dir)

    sf1 = None
    prep_sf1 = None
    # endswith, not substring: "0.1" in "sf0.01" is True, and an sf0.01
    # run must never build/claim the 10x fixture
    if SF1_ENABLED and sf_dir.rstrip("/").endswith("sf0.1"):
        sf1 = sf1_section(spark, sf_dir, qs)
        prep_sf1 = prep_sf1_bench(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    base = sf_dir.rstrip("/")
    sf = 0.1 if base.endswith("sf0.1") else (0.01 if base.endswith("sf0.01") else 0.001)
    # headline seq_per_sec = the fresh-JVM figure when available (the
    # representative engine throughput); in-bench kept under *_inbench.
    # Only at full suite scale: below ~1M rows the C2-state effect the
    # fresh JVM exists to remove is smaller than run-to-run host noise
    # (smoke runs stay comparable across rounds on the in-bench figure).
    seq_inbench, seq_inbench_best = seq_per_sec, seq_per_sec_best
    if fresh and SUITE_ROWS >= 1_000_000:
        seq_per_sec = fresh["seq_per_sec"]
        seq_per_sec_best = fresh["seq_per_sec_best"]
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "seq_per_sec": seq_per_sec,
        "seq_per_sec_best": seq_per_sec_best,
        "seq_per_sec_inbench": seq_inbench,
        "seq_per_sec_inbench_best": seq_inbench_best,
        "check_suite_samples": raw_samples,
        "check_suite_ext_cores": ext_cores,
        "suite_rows": SUITE_ROWS,
        "cores": int(cpus),
        "suite_fresh": fresh,
        "recall": recall,
        "pack_shard": pack_shard,
        "incremental_dedup": inc_dedup,
        "incremental_spans": inc_spans,
        "ann_curve": ann_curve,
        "prep_pipeline": prep,
        "corpus_clean": corpus_clean,
        "curation": curation,
        "resume": resume,
        "certify": certify,
        "sketch": sketch,
        "reconcile": reconcile,
        "slices": slices,
        "zorder": zorder,
        "memory": memory_telemetry(spark),
        "spill": spill_telemetry(),
    }
    if sf1 is not None:
        payload["sf1"] = sf1
    if prep_sf1 is not None:
        payload["prep_sf1"] = prep_sf1

    # Full payload → file; the driver's stdout capture keeps only a
    # short tail, so the FINAL printed line must stay compact (<2 KB)
    # or the round record loses its own headline (round-4 lesson:
    # BENCH_r04 recorded "parsed": null because the one-line payload
    # overflowed the capture window).
    report_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_report.json")
    with open(report_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"# full payload written to {report_path}", file=sys.stderr)

    compact = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "seq_per_sec": seq_per_sec,
        "seq_per_sec_best": seq_per_sec_best,
        "seq_per_sec_inbench": seq_inbench,
        "check_suite_ext_cores": ext_cores,
        "suite_fresh_ext_cores": fresh["ext_cores"] if fresh else None,
        "suite_rows": SUITE_ROWS,
        "cores": int(cpus),
        "recall": {
            k: {kk: v[kk] for kk in ("recall", "scan_fraction") if kk in v}
            if isinstance(v, dict) else v
            for k, v in recall.items()
        },
        "report": "BENCH_report.json",
    }
    if sf1 is not None:
        compact["sf1_seq_per_sec"] = sf1.get("seq_per_sec")
        compact["sf1_rows"] = sf1.get("suite_rows")
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 2000:  # keep the driver-captured tail parseable
        for drop in ("recall", "check_suite_ext_cores", "queries"):
            compact.pop(drop, None)
            line = json.dumps(compact, separators=(",", ":"))
            if len(line) <= 2000:
                break
    print(line)


if __name__ == "__main__":
    main()
