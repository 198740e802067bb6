"""Table-level schema contract validation + cross-run schema drift.

The north rule asks for a *schema* + constraint validation engine; the
row-level cascade already covers value-domain schema errors
(``inconsistent_n_tok``, ``null_token_element``, ``out_of_vocab`` —
operators/cascade.py), but nothing validated the TABLE shape itself.
This module closes that gap with two pure-metadata checks (zero data
scan — they read only ``df.schema``, so they run before the first job
is submitted and cost nothing at any scale):

* **static contract** — the observed ``StructType`` vs a declared
  :class:`ColumnSpec` contract: missing columns and type mismatches
  are errors (the suite would silently miscompute or crash mid-scan on
  them — fail BEFORE the scan with the precise diff); unexpected extra
  columns are warnings (Iceberg tables legitimately accrete columns,
  and column pruning means extras cost nothing).
* **temporal drift** — the observed schema vs the LAST-SEEN schema
  persisted under the warehouse (``_schema_baseline/schema.json``,
  atomic tmp+rename — the lm_store crash convention): column adds /
  drops / retypes are reported per run even when the static contract
  still holds, which is how silent producer-side schema evolution
  surfaces ("the upstream writer started emitting ``lang`` last
  night").

Reference analogue: the reference trusts SQLAlchemy's declarative
models to pin the shape (models/message.py:15-40) and crashes deep
inside processing on a mismatched table; a distributed validation
engine must instead refuse up front with a diff, because the crash
would otherwise surface as an opaque executor-side error after
scheduling a 100 TB scan.

Nullability is deliberately NOT part of the contract: parquet/Iceberg
scans report ``nullable=True`` for nearly every column regardless of
writer-side metadata, so asserting it would be asserting reader
defaults. NULL *values* are the cascade's job (null_payload /
null_key), which checks the data, not the metadata.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, types as T

from .. import schema as canonical

SCHEMA_BASELINE_DIRNAME = "_schema_baseline"

# Severity taxonomy: errors (missing_column, type_mismatch) break the
# suite's reads; warns are legitimate evolution worth surfacing. The
# severity is carried on each diff row — there is no separate registry
# to keep in sync.


@dataclass(frozen=True)
class ColumnSpec:
    """One contracted column. ``dtype`` is the Spark ``simpleString``
    (e.g. ``array<int>``); ``required=False`` makes absence legal
    (optional columns still type-check when present)."""

    name: str
    dtype: str
    required: bool = True


def contract_of(struct: T.StructType) -> tuple[ColumnSpec, ...]:
    """Derive a contract from a canonical StructType (schema.py)."""
    return tuple(
        ColumnSpec(f.name, f.dataType.simpleString()) for f in struct.fields
    )


# The canonical fact-table contract (BASELINE.json input_hint shape).
SEQUENCES_CONTRACT = contract_of(canonical.SEQUENCES)


def _strip_nullability(dt: T.DataType) -> T.DataType:
    """Recursively normalize nullability flags (``containsNull``,
    ``valueContainsNull``, field ``nullable``) to True so type
    comparison matches the module contract: nullability is NOT part of
    the contract, at any nesting depth. Without this, a producer that
    writes ``array<int>`` with non-null elements fails the gate with
    the absurd diff "expected array<int>, observed array<int>"
    (DataType equality includes containsNull; simpleString does not)."""
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_strip_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _strip_nullability(dt.keyType), _strip_nullability(dt.valueType), True
        )
    if isinstance(dt, T.StructType):
        # metadata dropped along with nullability: StructField.__eq__
        # compares metadata, so a parquet/Iceberg field COMMENT would
        # otherwise fail equality against the contract's comment-less
        # parse and report a type_mismatch whose expected and observed
        # simpleStrings are identical — the absurd-diff class this
        # canonicalization exists to eliminate
        return T.StructType(
            [
                T.StructField(f.name, _strip_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    return dt


def _widens(expected: T.DataType, observed: T.DataType) -> bool:
    """True when ``observed`` is a lossless widening of ``expected``
    (int→bigint, float→double), recursively through containers — the
    widenings Spark itself applies in implicit casts, so downstream
    arithmetic keeps working."""
    pairs = {
        (T.ShortType, T.IntegerType),
        (T.ShortType, T.LongType),
        (T.IntegerType, T.LongType),
        (T.FloatType, T.DoubleType),
    }
    if (type(expected), type(observed)) in pairs:
        return True
    if isinstance(expected, T.ArrayType) and isinstance(observed, T.ArrayType):
        return _widens(expected.elementType, observed.elementType)
    if isinstance(expected, T.MapType) and isinstance(observed, T.MapType):
        key_ok = expected.keyType == observed.keyType or _widens(
            expected.keyType, observed.keyType
        )
        val_ok = expected.valueType == observed.valueType or _widens(
            expected.valueType, observed.valueType
        )
        return key_ok and val_ok
    if isinstance(expected, T.StructType) and isinstance(observed, T.StructType):
        if [f.name for f in expected.fields] != [f.name for f in observed.fields]:
            return False
        return all(
            e.dataType == o.dataType or _widens(e.dataType, o.dataType)
            for e, o in zip(expected.fields, observed.fields)
        )
    return False


def _parse_dtype(simple: str) -> T.DataType:
    """simpleString → DataType via the DDL parser (public API)."""
    return T._parse_datatype_string(simple)


def schema_diff(
    observed: T.StructType,
    contract: tuple[ColumnSpec, ...],
    allow_widening: bool = True,
) -> list[dict]:
    """Observed StructType vs the declared contract.

    Returns one dict per finding: ``{column, check_name, severity,
    expected, observed}`` — empty list means conforming. Column order
    is immaterial (Iceberg reorders are a non-event).
    """
    obs = {f.name: f.dataType for f in observed.fields}
    diffs: list[dict] = []
    for spec in contract:
        if spec.name not in obs:
            if spec.required:
                diffs.append(
                    {
                        "column": spec.name,
                        "check_name": "missing_column",
                        "severity": "error",
                        "expected": spec.dtype,
                        "observed": None,
                    }
                )
            continue
        got = _strip_nullability(obs[spec.name])
        want = _strip_nullability(_parse_dtype(spec.dtype))
        if got == want or (allow_widening and _widens(want, got)):
            continue
        diffs.append(
            {
                "column": spec.name,
                "check_name": "type_mismatch",
                "severity": "error",
                "expected": spec.dtype,
                "observed": got.simpleString(),
            }
        )
    contracted = {s.name for s in contract}
    for name, dtype in obs.items():
        if name not in contracted:
            diffs.append(
                {
                    "column": name,
                    "check_name": "unexpected_column",
                    "severity": "warn",
                    "expected": None,
                    "observed": dtype.simpleString(),
                }
            )
    return diffs


def schema_fingerprint(struct: T.StructType) -> str:
    """Stable 16-hex fingerprint over the column-name→type mapping —
    order-insensitive, nullability-insensitive (see module docstring).
    Feeds the temporal store's fast-path equality check and the run
    report, the same role suite_hash plays for thresholds."""
    payload = json.dumps(
        sorted((f.name, f.dataType.simpleString()) for f in struct.fields)
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def schema_drift(
    observed: T.StructType, previous: T.StructType
) -> list[dict]:
    """Column-level diff vs the LAST-SEEN schema (not the static
    contract): adds / drops / retypes. All warnings — drift against a
    conforming contract is evolution to surface, not a reason to
    refuse the run (the static gate already refused real breakage)."""
    obs = {f.name: f.dataType.simpleString() for f in observed.fields}
    prev = {f.name: f.dataType.simpleString() for f in previous.fields}
    diffs: list[dict] = []
    for name in sorted(obs.keys() - prev.keys()):
        diffs.append(
            {
                "column": name,
                "check_name": "column_added",
                "severity": "warn",
                "expected": None,
                "observed": obs[name],
            }
        )
    for name in sorted(prev.keys() - obs.keys()):
        diffs.append(
            {
                "column": name,
                "check_name": "column_dropped",
                "severity": "warn",
                "expected": prev[name],
                "observed": None,
            }
        )
    for name in sorted(obs.keys() & prev.keys()):
        if obs[name] != prev[name]:
            diffs.append(
                {
                    "column": name,
                    "check_name": "column_retyped",
                    "severity": "warn",
                    "expected": prev[name],
                    "observed": obs[name],
                }
            )
    return diffs


class SchemaContractError(ValueError):
    """Raised before any job is submitted when the observed table
    shape breaks the contract. Carries the machine-readable diffs."""

    def __init__(self, diffs: list[dict]):
        self.diffs = diffs
        lines = "; ".join(
            f"{d['check_name']}({d['column']}): expected {d['expected']}, "
            f"observed {d['observed']}"
            for d in diffs
        )
        super().__init__(f"schema contract violated — {lines}")


def _store_path(output_path: str) -> str:
    return os.path.join(output_path, SCHEMA_BASELINE_DIRNAME, "schema.json")


def load_schema_store(output_path: str) -> T.StructType | None:
    """Last-seen schema, or None before the first gated run."""
    path = _store_path(output_path)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        payload = json.load(f)
    return T.StructType.fromJson(payload["schema"])


def store_schema(output_path: str, struct: T.StructType) -> None:
    """Persist the schema for the next run's drift diff. tmp +
    ``os.replace`` so a crash mid-write leaves the previous store
    intact (readers never observe a torn file)."""
    path = _store_path(output_path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(
            {
                "fingerprint": schema_fingerprint(struct),
                "schema": struct.jsonValue(),
            },
            f,
        )
    os.replace(tmp, path)


REPORT_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType(), False),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("severity", T.StringType(), False),
        T.StructField("expected", T.StringType(), True),
        T.StructField("observed", T.StringType(), True),
    ]
)


def report_df(spark: SparkSession, diffs: list[dict]) -> DataFrame:
    from ..session import local_df

    rows = [
        (d["column"], d["check_name"], d["severity"], d["expected"], d["observed"])
        for d in diffs
    ]
    return local_df(spark, rows, REPORT_SCHEMA)


def schema_gate(
    spark: SparkSession,
    observed: T.StructType,
    output_path: str,
    run_id: str,
    contract: tuple[ColumnSpec, ...] = SEQUENCES_CONTRACT,
    allow_widening: bool = True,
    on_mismatch: str = "fail",
) -> dict:
    """The run-entry gate: static contract + temporal drift in one
    call, report rows persisted to ``<out>/schema_violations/
    run_id=<id>`` (overwrite = replay-idempotent, the streaming-
    violations convention), store advanced for the next run.

    ``on_mismatch='fail'`` raises :class:`SchemaContractError` on
    error-severity diffs — AFTER writing the report (the refusal must
    leave its evidence) and WITHOUT advancing the store (a rejected
    schema must not become the next run's baseline). ``'report'``
    records and proceeds. Returns the run-report fragment.
    """
    if on_mismatch not in ("fail", "report"):
        raise ValueError(f"on_mismatch must be 'fail'|'report', got {on_mismatch!r}")
    diffs = schema_diff(observed, contract, allow_widening=allow_widening)
    prev = load_schema_store(output_path)
    first_seen = prev is None
    if prev is not None:
        diffs += schema_drift(observed, prev)
    errors = [d for d in diffs if d["severity"] == "error"]
    # ALWAYS overwrite the run's report dir — a clean replay of a
    # run_id that previously failed the gate must retire the stale
    # error rows, or the violations table claims a completed run was
    # refused (the replay-idempotency convention this module cites)
    report_df(spark, diffs).coalesce(1).write.mode("overwrite").parquet(
        f"{output_path}/schema_violations/run_id={run_id}"
    )
    if errors and on_mismatch == "fail":
        raise SchemaContractError(errors)
    if not errors:
        # drift-only / clean schemas become the next baseline; an
        # error-shaped schema that ran under 'report' does NOT — the
        # operator accepted the run, not the shape
        store_schema(output_path, observed)
    return {
        "schema_fp": schema_fingerprint(observed),
        "schema_errors": len(errors),
        "schema_warns": sum(1 for d in diffs if d["severity"] == "warn"),
        "schema_first_seen": first_seen,
    }
