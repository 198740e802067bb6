from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"source", "verdict"} <= set(df.columns)


def test_queries_have_oracles_or_are_flagged(spark):
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle-less query is a documented approximate op
    no_oracle = set(qs) - set(os_)
    assert no_oracle <= {
        "minhash_pairs",
        "simhash_pairs",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "embedding_near_dups",
        "stats_sketch",
    }


def test_each_query_returns_rows_at_sf0001(spark):
    for name, fn in E.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
