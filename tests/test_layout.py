"""Z-order layout (sources/layout.py) — Morton math, pruning payoff
vs single-column sort, frozen-boundary reuse, NULL/degenerate columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from teleharvest_spark.sources import layout as ly


@pytest.fixture(scope="module")
def xy(spark):
    """100k rows, two independent uniform columns in [0, 10000)."""
    return (
        spark.range(0, 100_000)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)).alias("y"),
        )
        .cache()
    )


def test_zvalue_range_and_determinism(spark, xy):
    zf, bnds = ly.zorder_frame(xy, ["x", "y"], bits=6)
    got = zf.agg(
        F.min(ly.ZVAL_COL).alias("lo"), F.max(ly.ZVAL_COL).alias("hi")
    ).first()
    assert 0 <= got["lo"] and got["hi"] < (1 << 12)
    # same boundaries → identical z for identical values, regardless of
    # input partitioning (content-pure derivation)
    zf2, _ = ly.zorder_frame(
        xy.repartition(13), ["x", "y"], bits=6, boundaries=bnds
    )
    a = zf.select("id", ly.ZVAL_COL)
    b = zf2.select("id", ly.ZVAL_COL)
    assert a.exceptAll(b).count() == 0


def test_zorder_prunes_both_dims_single_sort_does_not(spark, xy, tmp_path):
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    rep = ly.write_zordered(xy, zpath, ["x", "y"], bits=6, n_files=16)
    assert rep["rows"] == 100_000
    # baseline: the poor man's layout — range-sorted by x only
    (
        xy.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )
    band = (4000, 5250)  # ~1/8 of the y range
    z_y = ly.prunable_fraction(zpath, "y", *band)
    s_y = ly.prunable_fraction(spath, "y", *band)
    z_x = ly.prunable_fraction(zpath, "x", *band)
    s_x = ly.prunable_fraction(spath, "x", *band)
    # x-sorted: x prunes nearly everything, y prunes nothing
    assert s_x > 0.8 and s_y == 0.0
    # z-ordered: BOTH dims prune meaningfully
    assert z_x > 0.4 and z_y > 0.4
    # and no rows are lost to the fancy layout
    assert spark.read.parquet(zpath).count() == 100_000


def test_frozen_boundaries_extend_batches_consistently(spark, xy, tmp_path):
    p1 = str(tmp_path / "b1")
    rep = ly.write_zordered(xy, p1, ["x", "y"], bits=5, n_files=8)
    bnds = rep["boundaries"]
    # a new batch z-ordered with the stored boundaries maps equal
    # values to equal z — verified by recomputing batch 1's z under
    # the frozen boundaries and under a fresh quantile pass
    zf_frozen, _ = ly.zorder_frame(xy, ["x", "y"], bits=5, boundaries=bnds)
    zf_fresh, _ = ly.zorder_frame(xy, ["x", "y"], bits=5)
    a = zf_frozen.select("id", ly.ZVAL_COL)
    b = zf_fresh.select("id", ly.ZVAL_COL)
    assert a.exceptAll(b).count() == 0


def test_null_and_constant_columns(spark, tmp_path):
    df = spark.range(0, 5_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(100)))
        .alias("x"),
        F.lit(7).alias("const"),
        F.lit(None).cast("double").alias("allnull"),
    )
    zf, bnds = ly.zorder_frame(df, ["x", "const", "allnull"], bits=4)
    assert bnds["allnull"] == []
    out = zf.agg(F.count(ly.ZVAL_COL).alias("n")).first()
    assert out["n"] == 5_000  # NULLs rank 0, nothing throws (ANSI)
    p = str(tmp_path / "nz")
    rep = ly.write_zordered(df, p, ["x", "const", "allnull"], bits=4, n_files=4)
    assert rep["rows"] == 5_000


def test_validation(spark, xy):
    with pytest.raises(ValueError, match="at least one"):
        ly.zorder_frame(None, [], bits=8)
    with pytest.raises(ValueError, match="fit a long"):
        ly.zorder_frame(None, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="duplicate"):
        ly.zorder_frame(None, ["a", "a"], bits=4)
    with pytest.raises(ValueError, match="not in table"):
        ly.zorder_frame(xy, ["x", "nope"], bits=4)
    with pytest.raises(ValueError, match="numeric columns"):
        ly.zorder_frame(xy.withColumn("s", F.lit("a")), ["x", "s"], bits=4)


def test_cli_zorder_pass(spark, suite, tmp_path):
    from teleharvest_spark import datagen
    from teleharvest_spark.cli import zorder_pass

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 5000, suite).write.parquet(inp)
    rep = zorder_pass(
        spark, inp, str(tmp_path / "out"), "r1", cols=("n_tok",), n_files=8
    )
    assert rep["rows"] == 5000
    out_dir = str(tmp_path / "out" / "zorder" / "run_id=r1")
    assert spark.read.parquet(out_dir).count() == 5000
    # single-column z-order degenerates to a range sort: near-ideal
    assert rep["extent_scores"]["n_tok"] < 0.35
    import json as j

    meta = j.load(open(rep["meta"]))
    assert meta["cols"] == ["n_tok"] and len(meta["boundaries"]["n_tok"]) == 255


def test_boundaries_wider_than_bits_raise(spark, xy):
    _, bnds = ly.zorder_frame(xy, ["x", "y"], bits=6)
    with pytest.raises(ValueError, match="exceed bits"):
        ly.zorder_frame(xy, ["x", "y"], bits=4, boundaries=bnds)


def test_append_rows_receipt_counts_batch_only(spark, xy, tmp_path):
    p = str(tmp_path / "ap")
    r1 = ly.write_zordered(xy.limit(6000), p, ["x", "y"], bits=5, n_files=4)
    bnds = r1["boundaries"]
    r2 = ly.write_zordered(
        xy.limit(9000), p, ["x", "y"], bits=5, n_files=4,
        boundaries=bnds, mode="append",
    )
    assert r1["rows"] == 6000 and r2["rows"] == 9000
    assert r2["rows_total"] == 15000


def test_constant_column_extent_score_is_unprunable(spark, tmp_path):
    df = spark.range(0, 2000).select(
        F.col("id").alias("x"), F.lit(5).alias("c")
    )
    p = str(tmp_path / "const")
    ly.write_zordered(df, p, ["x", "c"], bits=4, n_files=4)
    scores = ly.extent_scores(p, ["x", "c"])
    assert scores["c"] == 1.0 and scores["x"] < 0.5
    # and an empty/non-local dir is "not measured", not a crash
    assert ly.extent_scores(str(tmp_path / "nowhere"), ["x"]) == {}
