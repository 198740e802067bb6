"""Schema contract + temporal schema drift (plans/contract.py).

All pure-metadata: the gate must refuse a shape-broken table BEFORE
any job is submitted, report precise column-level diffs, and surface
silent producer-side schema evolution run-over-run.
"""

import pytest
from pyspark.sql import functions as F, types as T

from teleharvest_spark import datagen
from teleharvest_spark.config import CheckSuite
from teleharvest_spark.plans import contract as C


@pytest.fixture(autouse=True)
def _session(spark):
    """DDL parsing (StructType.fromDDL / contract._parse_dtype) goes
    through the JVM parser and needs the session up."""
    yield


def _struct(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


CANON = "doc_id string, tokens array<int>, n_tok int, source string"


class TestSchemaDiff:
    def test_conforming_is_empty(self):
        assert C.schema_diff(_struct(CANON), C.SEQUENCES_CONTRACT) == []

    def test_column_order_is_immaterial(self):
        reordered = _struct(
            "source string, n_tok int, doc_id string, tokens array<int>"
        )
        assert C.schema_diff(reordered, C.SEQUENCES_CONTRACT) == []

    def test_missing_column_is_error(self):
        d = C.schema_diff(
            _struct("doc_id string, tokens array<int>, n_tok int"),
            C.SEQUENCES_CONTRACT,
        )
        assert d == [
            {
                "column": "source",
                "check_name": "missing_column",
                "severity": "error",
                "expected": "string",
                "observed": None,
            }
        ]

    def test_nested_nullability_is_not_a_mismatch(self):
        """A producer writing non-nullable array elements (or struct
        fields) conforms: nullability is not part of the contract at
        ANY nesting depth — without normalization this produced the
        absurd diff 'expected array<int>, observed array<int>'."""
        nn = T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField(
                    "tokens", T.ArrayType(T.IntegerType(), containsNull=False), False
                ),
                T.StructField("n_tok", T.IntegerType(), False),
                T.StructField("source", T.StringType(), False),
            ]
        )
        assert C.schema_diff(nn, C.SEQUENCES_CONTRACT) == []
        # widening still composes with non-null elements
        widened_nn = T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField(
                    "tokens", T.ArrayType(T.LongType(), containsNull=False), False
                ),
                T.StructField("n_tok", T.LongType(), False),
                T.StructField("source", T.StringType(), False),
            ]
        )
        assert C.schema_diff(widened_nn, C.SEQUENCES_CONTRACT) == []

    def test_retype_is_error(self):
        d = C.schema_diff(
            _struct("doc_id string, tokens array<string>, n_tok int, source string"),
            C.SEQUENCES_CONTRACT,
        )
        assert [(x["column"], x["check_name"]) for x in d] == [
            ("tokens", "type_mismatch")
        ]
        assert d[0]["observed"] == "array<string>"

    def test_widening_tolerated_by_default_strict_on_request(self):
        widened = _struct(
            "doc_id string, tokens array<bigint>, n_tok bigint, source string"
        )
        assert C.schema_diff(widened, C.SEQUENCES_CONTRACT) == []
        strict = C.schema_diff(widened, C.SEQUENCES_CONTRACT, allow_widening=False)
        assert {x["column"] for x in strict} == {"tokens", "n_tok"}
        # narrowing is NEVER tolerated
        narrowed = _struct(
            "doc_id string, tokens array<smallint>, n_tok int, source string"
        )
        assert [x["column"] for x in C.schema_diff(narrowed, C.SEQUENCES_CONTRACT)] == [
            "tokens"
        ]

    def test_extra_column_is_warn(self):
        d = C.schema_diff(
            _struct(CANON + ", lang string"), C.SEQUENCES_CONTRACT
        )
        assert d == [
            {
                "column": "lang",
                "check_name": "unexpected_column",
                "severity": "warn",
                "expected": None,
                "observed": "string",
            }
        ]

    def test_optional_column_absent_ok_present_typechecked(self):
        contract = C.SEQUENCES_CONTRACT + (
            C.ColumnSpec("lang", "string", required=False),
        )
        assert C.schema_diff(_struct(CANON), contract) == []
        bad = C.schema_diff(_struct(CANON + ", lang int"), contract)
        assert [(x["column"], x["check_name"]) for x in bad] == [
            ("lang", "type_mismatch")
        ]


class TestFingerprintAndDrift:
    def test_fingerprint_order_insensitive_type_sensitive(self):
        a = C.schema_fingerprint(_struct(CANON))
        b = C.schema_fingerprint(
            _struct("source string, doc_id string, tokens array<int>, n_tok int")
        )
        c = C.schema_fingerprint(
            _struct("doc_id string, tokens array<bigint>, n_tok int, source string")
        )
        assert a == b != c

    def test_drift_add_drop_retype(self):
        prev = _struct(CANON)
        cur = _struct("doc_id string, tokens array<bigint>, source string, lang string")
        d = C.schema_drift(cur, prev)
        assert [(x["check_name"], x["column"]) for x in d] == [
            ("column_added", "lang"),
            ("column_dropped", "n_tok"),
            ("column_retyped", "tokens"),
        ]
        assert all(x["severity"] == "warn" for x in d)
        assert C.schema_drift(prev, prev) == []


class TestStore:
    def test_round_trip_and_crash_safety(self, tmp_path):
        out = str(tmp_path / "wh")
        assert C.load_schema_store(out) is None
        s = _struct(CANON)
        C.store_schema(out, s)
        back = C.load_schema_store(out)
        assert {f.name: f.dataType for f in back.fields} == {
            f.name: f.dataType for f in s.fields
        }
        # a torn tmp file from a crashed writer never shadows the store
        import os

        tmp = os.path.join(out, C.SCHEMA_BASELINE_DIRNAME, "schema.json.tmp")
        with open(tmp, "w") as f:
            f.write("{not json")
        assert C.load_schema_store(out) is not None


class TestGate:
    def test_clean_then_drift_then_error(self, spark, tmp_path):
        out = str(tmp_path / "wh")
        r1 = C.schema_gate(spark, _struct(CANON), out, "r1")
        assert r1["schema_errors"] == 0 and r1["schema_warns"] == 0
        assert r1["schema_first_seen"] is True
        # run 2: upstream added a column — warn rows (unexpected +
        # column_added), run proceeds, store advances
        r2 = C.schema_gate(spark, _struct(CANON + ", lang string"), out, "r2")
        assert r2["schema_errors"] == 0 and r2["schema_warns"] == 2
        assert r2["schema_first_seen"] is False
        rep = spark.read.parquet(f"{out}/schema_violations/run_id=r2")
        got = {(r["check_name"], r["column"]) for r in rep.collect()}
        assert got == {("unexpected_column", "lang"), ("column_added", "lang")}
        # run 3: the added column is now the last-seen baseline — only
        # the static warn remains, no drift rows
        r3 = C.schema_gate(spark, _struct(CANON + ", lang string"), out, "r3")
        assert r3["schema_warns"] == 1
        # run 4: a retype refuses the run, AFTER writing the report,
        # WITHOUT advancing the store
        broken = _struct(
            "doc_id string, tokens array<string>, n_tok int, source string, lang string"
        )
        with pytest.raises(C.SchemaContractError) as ei:
            C.schema_gate(spark, broken, out, "r4")
        assert "type_mismatch(tokens)" in str(ei.value)
        rep4 = spark.read.parquet(f"{out}/schema_violations/run_id=r4")
        assert rep4.where(F.col("severity") == "error").count() == 1
        stored = C.load_schema_store(out)
        assert dict(
            (f.name, f.dataType.simpleString()) for f in stored.fields
        )["tokens"] == "array<int>"

    def test_clean_replay_retires_stale_error_report(self, spark, tmp_path):
        """A run_id that previously failed the gate and is replayed
        after the upstream fix must OVERWRITE its report dir with the
        (now clean) diff set — a stale error report for a completed
        run breaks the replay-idempotency contract."""
        out = str(tmp_path / "wh")
        broken = _struct("doc_id string, n_tok int, source string")
        with pytest.raises(C.SchemaContractError):
            C.schema_gate(spark, broken, out, "r1")
        rep = spark.read.parquet(f"{out}/schema_violations/run_id=r1")
        assert rep.where(F.col("severity") == "error").count() == 1
        C.schema_gate(spark, _struct(CANON), out, "r1")
        rep = spark.read.parquet(f"{out}/schema_violations/run_id=r1")
        assert rep.count() == 0

    def test_report_mode_proceeds_without_store_advance(self, spark, tmp_path):
        out = str(tmp_path / "wh")
        C.schema_gate(spark, _struct(CANON), out, "r1")
        broken = _struct("doc_id string, n_tok int, source string")
        r = C.schema_gate(spark, broken, out, "r2", on_mismatch="report")
        assert r["schema_errors"] == 1
        # rejected shape did not become the next baseline
        names = {f.name for f in C.load_schema_store(out).fields}
        assert names == {"doc_id", "tokens", "n_tok", "source"}
        with pytest.raises(ValueError):
            C.schema_gate(spark, broken, out, "r3", on_mismatch="bogus")


def test_cli_run_gates_schema(spark, tmp_path):
    """End-to-end through cli.run: a conforming table validates and
    records the fingerprint; a retyped table is refused before any
    scan; --schema-mismatch report proceeds and flags."""
    from teleharvest_spark import cli

    suite = CheckSuite()
    inp = str(tmp_path / "seq")
    out = str(tmp_path / "wh")
    datagen.generate_sequences(spark, n_rows=300).write.parquet(inp)
    r1 = cli.run(spark, inp, out, suite, run_id="s1", drift=False)
    assert r1["schema_errors"] == 0 and len(r1["schema_fp"]) == 16
    # upstream retypes doc_id → refuse, with the diff in the message
    bad = str(tmp_path / "seq_bad")
    spark.read.parquet(inp).withColumn(
        "doc_id", F.xxhash64("doc_id")
    ).write.parquet(bad)
    with pytest.raises(C.SchemaContractError, match="doc_id"):
        cli.run(spark, bad, out, suite, run_id="s2", drift=False)
    r3 = cli.run(
        spark, bad, out, suite, run_id="s3", drift=False,
        on_schema_mismatch="report",
    )
    assert r3["schema_errors"] == 1
    assert spark.read.parquet(f"{out}/schema_violations/run_id=s3").count() >= 1
