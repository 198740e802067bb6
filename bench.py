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
]

SUITE_ROWS = int(os.environ.get("SPARK_GRAFT_SUITE_ROWS", "2000000"))


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
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="teleharvest_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    qs = E.queries()
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
    n_viol = n_verd = 0
    for _ in range(3):
        t0 = time.perf_counter()
        res = suite_plan.run_suite(stored, check, drift_vs_global=True)
        n_viol, n_verd = res.materialize()
        samples.append(time.perf_counter() - t0)
        res.cleanup()
    samples.sort()
    suite_sec = round(samples[1], 3)  # median of 3
    timings["check_suite_full"] = suite_sec
    seq_per_sec = round(SUITE_ROWS / suite_sec, 1)
    print(
        f"# check_suite_full: {SUITE_ROWS} rows, {n_viol} violations, "
        f"{n_verd} partitions; samples {[round(s, 2) for s in samples]}s "
        f"→ median {suite_sec}s = {seq_per_sec} seq/s",
        file=sys.stderr,
    )

    recall = approx_recall(spark, sf_dir, qs)
    print(f"# recall: {recall}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = 0.1 if "0.1" in sf_dir else (0.01 if "0.01" in sf_dir else 0.001)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "seq_per_sec": seq_per_sec,
                "suite_rows": SUITE_ROWS,
                "cores": int(cpus),
                "recall": recall,
            }
        )
    )


if __name__ == "__main__":
    main()
