"""Schema-enforced JSONL/CSV ingest with corrupt-record violations."""

from __future__ import annotations

from teleharvest_spark.sources import files


def test_jsonl_corrupt_rows_become_violations(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": "d1", "source": "s1", "n_tok": 3}',
                "this is not json at all",
                '{"doc_id": "d2", "source": "s2", "n_tok": "not-a-number"}',
                '{"doc_id": "d3", "source": "s1", "n_tok": 7}',
            ]
        )
    )
    df = files.read_jsonl(spark, str(p), "doc_id string, source string, n_tok int")
    clean, viol = files.split_corrupt(df)
    assert {r["doc_id"] for r in clean.collect()} == {"d1", "d3"}
    v = viol.collect()
    assert len(v) == 2
    assert all(r["check_name"] == "corrupt_record" for r in v)
    assert any("not json" in r["reason"] for r in v)
    # schema matches the violations contract
    assert [f.name for f in viol.schema.fields] == [
        "doc_id", "source", "check_name", "reason", "tokens",
    ]


def test_csv_corrupt_rows_become_violations(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,source,n_tok\n"
        "d1,s1,3\n"
        "d2,s2,not-a-number\n"
        "d3,s1,7\n"
    )
    df = files.read_csv(spark, str(p), "doc_id string, source string, n_tok int")
    clean, viol = files.split_corrupt(df)
    assert {r["doc_id"] for r in clean.collect()} == {"d1", "d3"}
    v = viol.collect()
    assert len(v) == 1 and v[0]["doc_id"] == "d2"
    assert "not-a-number" in v[0]["reason"]
