"""Vector math over array<float> columns — JVM-native first, Arrow second.

Reference analogue C10: cosine similarity of two embeddings
(services/embedding_service.py:42, sentence-transformers
``model.similarity``). The reference JSON-encodes vectors
(models/message.py:61); this engine stores native arrays — the JSON
round-trip exists only as the legacy-boundary helpers below.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F, types as T


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product, whole-stage-codegen (no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is 0 (guarded division,
    reference C4 pattern: processor.py:116); NULL when either INPUT is
    NULL — an un-embeddable row is unscorable, not confirmed-orthogonal,
    and collapsing the two would let similarity thresholds treat it as
    confirmed-dissimilar."""
    d, na, nb = dot(a, b), norm(a), norm(b)
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when((na > 0) & (nb > 0), d / (na * nb))
        .otherwise(F.lit(0.0))
    )


def fold_norm(vec) -> float:
    """``norm()`` as the exact Catalyst fold: acc = acc + x·x in index
    order over IEEE doubles, then sqrt — bitwise-identical to the
    codegen expression for the same input."""
    import math

    acc = 0.0
    for x in vec:
        xx = float(x)
        acc = acc + xx * xx
    return math.sqrt(acc)


def _seq_dot_norm(mat: np.ndarray) -> tuple:
    """(per-row sequential-fold squared-norm accumulator helper) —
    returns the norm array for ``mat`` (n, L) accumulated column by
    column, matching Catalyst's left fold bit-for-bit (each step is
    one IEEE double multiply + add per row, in index order)."""
    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for i in range(mat.shape[1]):
        c = mat[:, i]
        acc = acc + c * c
    return np.sqrt(acc)


@F.pandas_udf(T.DoubleType())
def cosine_seq_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine with BITWISE parity to :func:`cosine` (the
    codegen expression): dot and norms accumulate sequentially in
    index order — per element one IEEE double multiply then one add,
    the exact op sequence of ``F.aggregate``'s left fold — so a plan
    may swap the interpreted-HOF expression for this kernel without
    changing a single output bit, including rank decisions on
    near-tie sims (guide §4.2: the HOF tree evaluates interpreted
    per element; this runs ~dim vectorized numpy passes per batch).

    Semantics reproduced exactly: NULL input → NULL; length-mismatched
    pair → NULL when both norms > 0 else 0.0 (zip_with's null padding
    through the guarded division); zero norm → 0.0; NaN elements
    propagate as NaN values, never collapsed to NULL.
    """
    av, bv = a.to_numpy(), b.to_numpy()
    n = len(av)
    out = np.zeros(n, dtype=np.float64)
    isnull = np.ones(n, dtype=bool)
    by_shape: dict[tuple[int, int], list[int]] = {}
    for i, (x, y) in enumerate(zip(av, bv)):
        if x is None or y is None:
            continue  # stays NULL
        by_shape.setdefault((len(x), len(y)), []).append(i)
    for (la, lb), idxs in by_shape.items():
        am = np.asarray(
            [np.asarray(av[i], dtype=np.float64) for i in idxs], dtype=np.float64
        ).reshape(len(idxs), la)
        bm = np.asarray(
            [np.asarray(bv[i], dtype=np.float64) for i in idxs], dtype=np.float64
        ).reshape(len(idxs), lb)
        na, nb = _seq_dot_norm(am), _seq_dot_norm(bm)
        # Spark orders NaN above every double, so (norm > 0) is TRUE
        # for a NaN norm there; numpy says False — align with Spark
        both_pos = ((na > 0) | np.isnan(na)) & ((nb > 0) | np.isnan(nb))
        ii = np.asarray(idxs)
        if la != lb:
            # zip_with pads with NULLs → NULL dot → NULL sim when the
            # guarded division fires, 0.0 otherwise
            out[ii[~both_pos]] = 0.0
            isnull[ii[~both_pos]] = False
            continue
        acc = np.zeros(len(idxs), dtype=np.float64)
        for d in range(la):
            acc = acc + am[:, d] * bm[:, d]
        den = na * nb
        vals = np.where(both_pos, acc / np.where(den == 0, 1.0, den), 0.0)
        out[ii] = vals
        isnull[ii] = False
    return pd.Series(pd.arrays.FloatingArray(out, isnull))


@F.pandas_udf(T.DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine for wide vectors — ~10× the native
    expression on dim ≥ 256 (single numpy matmul per batch).

    NULL-and-ragged-safe: a batch containing a NULL or wrong-length
    vector must not crash np.stack (embed_text_udf legitimately emits
    NULL for empty text, so the module's own functions compose);
    such rows score NULL, mirroring cosine()'s NULL-input contract."""
    av, bv = a.to_numpy(), b.to_numpy()
    n = len(av)
    out = np.full(n, np.nan)
    # group scorable rows by vector length: one stack+matmul per
    # distinct dim in the batch (normally exactly one group)
    by_len: dict[int, list[int]] = {}
    for i, (x, y) in enumerate(zip(av, bv)):
        lx = len(x) if x is not None else -1
        ly = len(y) if y is not None else -2
        if lx == ly and lx > 0:
            by_len.setdefault(lx, []).append(i)
    for idxs in by_len.values():
        am = np.stack([np.asarray(av[i], dtype=np.float64) for i in idxs])
        bm = np.stack([np.asarray(bv[i], dtype=np.float64) for i in idxs])
        num = np.einsum("ij,ij->i", am, bm)
        den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        out[idxs] = np.where(den > 0, num / np.where(den == 0, 1, den), 0.0)
    # NaN marks the unscorable rows; emit them as NULL, not NaN
    return pd.Series(pd.arrays.FloatingArray(out, np.isnan(out)))


def embed_text_udf(dim: int = 64):
    """U1 — embedding generation as a pandas UDF (reference:
    SentenceTransformer('paraphrase-MiniLM-L6-v2').encode,
    services/embedding_service.py:15-32; None on empty/error).

    The model isn't in this container, so the encoder is a
    deterministic hash-seeded unit vector per text — the Arrow batch
    path, NULL/empty handling, and per-executor init pattern are the
    real design; a production deployment swaps ``_encode_batch`` for
    a lazily-initialized (once per Python worker, NOT per batch)
    sentence-transformers model.
    """

    def _encode_batch(texts: pd.Series) -> np.ndarray:
        # zlib.crc32, NOT hash(): Python string hashing is salted per
        # process, which would make embeddings differ across executors
        import zlib

        seeds = np.fromiter(
            (
                0
                if (t is None or t == "")
                else (zlib.crc32(t.encode("utf-8")) or 1)
                for t in texts
            ),
            dtype=np.int64,
            count=len(texts),
        )
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for i, s in enumerate(seeds):  # seeding is per-row; math is batch
            if s:
                out[i] = np.random.RandomState(s).randn(dim).astype(np.float32)
        norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out / norms

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def udf(texts: pd.Series) -> pd.Series:
        mat = _encode_batch(texts)
        empty = texts.isna() | (texts == "")
        return pd.Series(
            [None if e else row.tolist() for e, row in zip(empty, mat)]
        )

    return udf


def from_json_vector(col: Column) -> Column:
    """Legacy boundary: JSON-string → array<float> (reference stores
    embeddings as json.dumps lists, models/message.py:61)."""
    return F.from_json(col, "array<float>")


def to_json_vector(col: Column) -> Column:
    return F.to_json(col)
