"""Mergeable per-partition statistic STATES — corpus-level metrics
without a corpus-level scan.

The resume story (plans/manifest.py) skips already-validated
partitions, but three consumers still want CORPUS-level numbers:
corpus distinct doc_id (duplicate-rate reporting), the pooled n_tok
histogram (the drift_vs_global baseline — which cli.run otherwise
re-derives with a FULL-table scan on every resume run, defeating the
manifest at 10^12 rows), and corpus min/max/mean/variance for the run
report. All of these are algebraic or sketch-mergeable, so each
validation run persists ONE mergeable state row per partition and any
later consumer folds the (partition-cardinality) state table instead
of rescanning data:

* exact algebraic fields — row_count, null counts, sum / min / max /
  sum-of-squares of n_tok — merge by sum/min/max;
* ``doc_id`` distinct — a Datasketches HLL sketch binary
  (``hll_sketch_agg``), merged losslessly by ``hll_union_agg``: the
  union of per-partition sketches is REGISTER-IDENTICAL to one sketch
  over the whole table (pinned), so resume-era estimates never diverge
  from full-run estimates;
* the 128-bucket n_tok histogram as ``array<long>`` — element-wise sum.

Exactness under resume: a partition is only SKIPPED when its snapshot
(content) is unchanged (manifest anti-join), so its stored state is
byte-equivalent to what a rescan would produce — merged states equal
the full-table aggregate exactly, not approximately (the sketch fields
equal the full-table sketch, whose estimate is itself approximate).

Reference analogue: the reference recomputes per-channel metrics over
a bounded lookback window and trusts stored rows beyond it
(processor.py:60-71); this is that idea made algebraic — store the
*aggregate state*, not the decision, and merge.

Layout: ``<out>/_stats_states/partition=<p>/`` — dynamic partition
overwrite (the key-index convention, operators/uniqueness.py): a
re-validated partition atomically replaces its state row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.drift import N_TOK_BUCKETS, N_TOK_MAX_FOR_BUCKETS

STATES_DIRNAME = "_stats_states"
HLL_LG_K = 12  # Datasketches lgConfigK: 4 KiB max per sketch, rsd ~1.6%


def states_path(output_path: str) -> str:
    return os.path.join(output_path, STATES_DIRNAME)


def _bucket(n_tok) -> F.Column:
    width = N_TOK_MAX_FOR_BUCKETS // N_TOK_BUCKETS
    return F.least(
        F.floor(F.coalesce(n_tok, F.lit(0)) / width), F.lit(N_TOK_BUCKETS - 1)
    ).cast("int")


def partition_states(
    df: DataFrame, key: str = "source", tokens_null_col: str | None = None
) -> DataFrame:
    """One mergeable state row per partition.

    ONE two-level aggregate over one column-pruned scan: level 1 groups
    by (partition, bucket) and computes every scalar/sketch partial at
    bucket granularity (map-side partials collapse the fact rows; the
    shuffle is ≤ |partitions| × 128 rows); level 2 folds buckets back
    to the partition row — sums/min/max merge algebraically, the
    per-bucket HLL sub-sketches merge by ``hll_union_agg`` (register-
    wise max, so the result equals the direct whole-partition sketch —
    the same losslessness the module docstring pins for cross-partition
    merges), and the per-bucket counts densify into the fixed histogram
    array. The previous shape (scalar aggregate + separate histogram
    aggregate + join) scanned the input twice and paid a join per
    ``write_states`` call — pure fixed overhead on the resume path's
    pending-slice writes.
    NULL partition keys state under ``__null__`` and empty strings
    under ``__empty__`` (the source_dir convention — hive encoding
    maps both to __HIVE_DEFAULT_PARTITION__ otherwise); unlike the
    drift check (which excludes NULL keys as referential violations),
    a STATE must cover every row or merged row counts disagree with
    the table.
    """
    from ..sources.writer import source_dir_col

    part = source_dir_col(key).alias("partition")
    n_tok = F.col("n_tok")
    # tokens_null_col: a precomputed "tokens IS NULL" bit (the suite's
    # one-decode row cache) — the aggregate then never touches the
    # array column; identical counts either way
    tokens_null = (
        F.col(tokens_null_col) if tokens_null_col
        else F.col("tokens").isNull()
    )
    per_bucket = df.groupBy(part, _bucket(n_tok).alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(tokens_null.cast("long")).alias("null_tokens"),
        F.sum(n_tok.isNull().cast("long")).alias("null_n_tok"),
        F.min(n_tok).alias("min_n_tok"),
        F.max(n_tok).alias("max_n_tok"),
        F.sum(F.coalesce(n_tok.cast("long"), F.lit(0))).alias("sum_n_tok"),
        F.sum(
            F.coalesce(n_tok.cast("long") * n_tok.cast("long"), F.lit(0))
        ).alias("sum_sq_n_tok"),
        F.hll_sketch_agg(F.col("doc_id"), F.lit(HLL_LG_K)).alias("doc_id_hll"),
    )
    return (
        per_bucket.groupBy("partition")
        .agg(
            F.sum("cnt").alias("row_count"),
            F.sum("null_tokens").alias("null_tokens"),
            F.sum("null_n_tok").alias("null_n_tok"),
            F.min("min_n_tok").alias("min_n_tok"),
            F.max("max_n_tok").alias("max_n_tok"),
            F.sum("sum_n_tok").alias("sum_n_tok"),
            F.sum("sum_sq_n_tok").alias("sum_sq_n_tok"),
            F.hll_union_agg(F.col("doc_id_hll")).alias("doc_id_hll"),
            F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias(
                "__m"
            ),
        )
        .withColumn(
            "ntok_hist",
            F.transform(
                F.sequence(F.lit(0), F.lit(N_TOK_BUCKETS - 1)),
                lambda i: F.coalesce(F.try_element_at(F.col("__m"), i), F.lit(0)),
            ),
        )
        .drop("__m")
    )


def write_states(
    df: DataFrame, output_path: str, run_id: str, key: str = "source",
    tokens_null_col: str | None = None,
) -> None:
    """Persist this run's partition states (dynamic partition
    overwrite — re-validated partitions replace their row)."""
    (
        partition_states(df, key=key, tokens_null_col=tokens_null_col)
        .withColumn("stated_at_run", F.lit(run_id))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("partition")
        .parquet(states_path(output_path))
    )


def read_states(spark: SparkSession, output_path: str) -> DataFrame:
    """Stored per-partition states — empty before the first stated run."""
    schema = T.StructType(
        [
            T.StructField("row_count", T.LongType(), True),
            T.StructField("null_tokens", T.LongType(), True),
            T.StructField("null_n_tok", T.LongType(), True),
            T.StructField("min_n_tok", T.IntegerType(), True),
            T.StructField("max_n_tok", T.IntegerType(), True),
            T.StructField("sum_n_tok", T.LongType(), True),
            T.StructField("sum_sq_n_tok", T.LongType(), True),
            T.StructField("doc_id_hll", T.BinaryType(), True),
            T.StructField("ntok_hist", T.ArrayType(T.LongType()), True),
            T.StructField("stated_at_run", T.StringType(), True),
            T.StructField("partition", T.StringType(), True),
        ]
    )
    try:
        return spark.read.schema(schema).parquet(states_path(output_path))
    except Exception:
        from ..session import local_df

        return local_df(spark, [], schema)


def merge_states(states: DataFrame) -> DataFrame:
    """Fold partition states to ONE corpus row — pure state algebra
    over a |partitions|-sized table, no fact-table access.

    Derived fields: mean/variance from the moment sums (population
    variance over non-NULL n_tok), distinct_doc_id from the unioned
    HLL (equals the full-table sketch exactly — see module docstring),
    p50_n_tok from the merged histogram at bucket resolution (the
    bucket midpoint containing the median; ±width/2, documented)."""
    width = N_TOK_MAX_FOR_BUCKETS // N_TOK_BUCKETS
    hist_sum = (
        states.select(F.posexplode("ntok_hist").alias("bucket", "cnt"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .groupBy()
        .agg(
            F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias("__m")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_TOK_BUCKETS - 1)),
                lambda i: F.coalesce(F.try_element_at(F.col("__m"), i), F.lit(0)),
            ).alias("ntok_hist")
        )
    )
    merged = states.agg(
        F.sum("row_count").alias("row_count"),
        F.sum("null_tokens").alias("null_tokens"),
        F.sum("null_n_tok").alias("null_n_tok"),
        F.min("min_n_tok").alias("min_n_tok"),
        F.max("max_n_tok").alias("max_n_tok"),
        F.sum("sum_n_tok").alias("sum_n_tok"),
        F.sum("sum_sq_n_tok").alias("sum_sq_n_tok"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("doc_id_hll"))).alias(
            "distinct_doc_id"
        ),
        F.count(F.lit(1)).alias("n_partitions"),
    )
    n_val = (F.col("row_count") - F.col("null_n_tok")).cast("double")
    mean = F.col("sum_n_tok").cast("double") / n_val
    return (
        merged.crossJoin(hist_sum)
        .withColumn("mean_n_tok", mean)
        .withColumn(
            "var_n_tok",
            F.col("sum_sq_n_tok").cast("double") / n_val - mean * mean,
        )
        .withColumn(
            "null_rate",
            F.col("null_tokens").cast("double")
            / F.col("row_count").cast("double"),
        )
        .withColumn(
            # smallest bucket whose cumulative count reaches half the
            # rows; reported as the bucket midpoint (±width/2)
            "p50_n_tok",
            F.expr(
                f"""
                (array_position(
                   transform(
                     aggregate(ntok_hist, array(cast(0 as bigint)),
                       (acc, x) -> array_append(acc, element_at(acc, -1) + x)),
                     c -> c >= aggregate(ntok_hist, cast(0 as bigint),
                                         (a, x) -> a + x) / 2),
                   true) - 2) * {width} + {width // 2}
                """
            ).cast("int"),
        )
    )


def pooled_hist_from_states(
    states: DataFrame, exclude_partitions: list[str] | None = None
) -> DataFrame:
    """(bucket, cnt) pooled n_tok histogram from stored states —
    the drift_vs_global baseline WITHOUT the full-table scan.

    ``exclude_partitions``: partitions being re-validated this run, in
    the MANIFEST domain (translated to the dir domain here); their
    stored state is stale and the caller pools their CURRENT histogram
    on top (a pending-only scan it pays anyway). The ``__null__``
    state is excluded to match ntok_histogram's NULL-partition policy
    — the baseline must pool the same population the per-source
    histograms draw from (''-keyed rows stay in, as '__empty__')."""
    from ..sources.writer import dir_key_value

    keep = states.where(F.col("partition") != "__null__")
    if exclude_partitions:
        excl = [dir_key_value(p) for p in exclude_partitions]
        keep = keep.where(~F.col("partition").isin(excl))
    return (
        keep.select(F.posexplode("ntok_hist").alias("bucket", "cnt"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .where(F.col("cnt") > 0)
    )
