"""MERGE INTO (upsert) — Iceberg in production, join-emulation locally.

Reference analogue S5/J2: keyed update — look up by composite PK, set
given fields, skip if absent, ignore unknown fields
(models/message.py:170-189). On a real cluster this is Iceberg
``MERGE INTO`` (one atomic snapshot commit, reference's per-row
COMMIT removed wholesale — SURVEY.md §4). The local emulation is the
standard CDC pattern: left join + coalesce + union of unmatched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    insert_unmatched: bool = False,
) -> DataFrame:
    """WHEN MATCHED THEN UPDATE SET <update_cols> semantics.

    * Columns in ``updates`` but not in ``target`` are ignored
      (reference: unknown-field update ignored, message.py:181-183,
      tests/models/test_message.py:340-356).
    * Unmatched update rows are skipped unless ``insert_unmatched``
      (reference: update skips absent rows, message.py:176-179).
    * Duplicate update keys are resolved DETERMINISTICALLY before the
      join — greatest update-struct wins (the streaming refresh's
      winner rule). SQL-standard MERGE raises a cardinality violation
      on multiple matches; a silent left join would instead FAN OUT
      each matched target row once per duplicate (data corruption a
      late-data replay would trigger routinely), so the operator
      resolves rather than corrupts, and documents the difference from
      Iceberg's stricter behavior.
    """
    tgt_cols = target.columns
    if update_cols is None:
        update_cols = [c for c in updates.columns if c not in keys and c in tgt_cols]
    else:
        # the silent-ignore contract covers the DEFAULT column
        # discovery only; an EXPLICITLY named column absent from the
        # target is a typo that would otherwise turn the merge into a
        # silent no-op for that column
        missing = [c for c in update_cols if c not in tgt_cols]
        if missing:
            raise ValueError(
                f"update_cols {missing} not in target columns {tgt_cols}"
            )

    if update_cols and not insert_unmatched:
        # greatest-update-struct winner via an AGGREGATE, not a window:
        # max(struct) uses the same total ordering as desc(struct) with
        # row_number (struct field comparison, NULL fields smallest),
        # so the winner is identical — but the hash aggregate gets
        # map-side partial combine and skips the full per-partition
        # sort a window pays (guide §2.3 "aggregate before you
        # shuffle"; on a 10^12-row late-data replay the updates table
        # is corpus-sized and the sort was the dominant term). Only
        # keys + update_cols survive — exactly what the matched-update
        # join below reads.
        w = F.max(F.struct(*[F.col(c) for c in update_cols])).alias("_w")
        updates = updates.groupBy(*keys).agg(w).select(
            *keys, *[F.col(f"_w.{c}").alias(c) for c in update_cols]
        )
    elif update_cols:
        # insert_unmatched also inserts the winner row's NON-update
        # columns, so the full row must survive dedup — keep the
        # window form here (the ordering touches only update_cols,
        # matching the aggregate path's winner rule).
        win = W.partitionBy(*keys).orderBy(
            F.desc(F.struct(*[F.col(c) for c in update_cols]))
        )
        updates = (
            updates.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        updates = updates.dropDuplicates(keys)
    # presence marker, not coalesce: MATCHED rows take the update value
    # EVEN WHEN IT IS NULL — the reference's setattr-based update
    # (models/message.py:176-183) and the Iceberg MERGE twin
    # (`t.c = s.c`) both write NULL; a coalesce would silently keep the
    # stale target value and the local emulation would diverge from
    # the production path for any metric legitimately reset to NULL.
    upd = updates.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("_u_present"),
        *[F.col(c).alias(f"_u_{c}") for c in update_cols],
    )
    joined = target.join(upd, keys, "left")
    merged = joined.select(
        *[
            (
                F.when(F.col("_u_present").isNotNull(), F.col(f"_u_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                if c in update_cols
                else F.col(c)
            )
            for c in tgt_cols
        ]
    )
    if insert_unmatched:
        new_rows = updates.join(target.select(*keys), keys, "left_anti")
        aligned = new_rows.select(
            *[
                (F.col(c) if c in new_rows.columns else F.lit(None)).alias(c)
                for c in tgt_cols
            ]
        )
        merged = merged.unionByName(aligned)
    return merged


def iceberg_merge_sql(table: str, source_view: str, keys: list[str], update_cols: list[str]) -> str:
    """The production MERGE statement (emit-only here; Iceberg jars are
    not in this container — gated per sources/iceberg.py).

    Validity beyond string formatting is pinned by
    tests/test_watermark_merge.py::test_iceberg_merge_sql_parses:
    Spark's own SQL parser (the dialect that will execute it) must
    produce a MergeIntoTable logical plan from the emitted text."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets}"
    )


def execute_iceberg_merge(
    spark,
    table: str,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str],
    source_view: str = "_merge_updates",
) -> None:
    """Production path: run the emitted MERGE against an Iceberg
    catalog (one atomic snapshot commit). Jar-guarded — in this
    container it raises with the statement it would have run, so the
    caller can fall back to ``merge_upsert`` (the semantics twin)."""
    from ..sources.iceberg import iceberg_available

    sql = iceberg_merge_sql(table, source_view, keys, update_cols)
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime jars not on the classpath; production MERGE:\n" + sql
        )
    updates.createOrReplaceTempView(source_view)
    spark.sql(sql)
